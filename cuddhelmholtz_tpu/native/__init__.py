"""ctypes bindings for the native topology kernels (with auto-build).

Loads ``libcuddh_topology.so`` from this directory, building it with the
Makefile on first use if a compiler is available.  All entry points have
NumPy fallbacks in ``mesh/mesh2d.py`` and ``spaces/h1.py``; set
``CUDDH_NATIVE=0`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libcuddh_topology.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CUDDH_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cuddh_build_edges.restype = ctypes.c_int64
    lib.cuddh_build_edges.argtypes = [
        ctypes.c_int64, i32p, ctypes.c_int64, i32p, i32p, i32p, i32p,
    ]
    lib.cuddh_h1_numbering.restype = ctypes.c_int64
    lib.cuddh_h1_numbering.argtypes = [
        ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int64,
        ctypes.c_int64, i32p, i32p, i32p, i32p, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_edges(elem_vertices: np.ndarray, nv: int):
    """Native edge build; returns (edge_vertices, edge_elements, edge_sides,
    edge_delta) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ev = np.ascontiguousarray(elem_vertices, dtype=np.int32)
    nel = len(ev)
    cap = 4 * nel
    edge_vertices = np.empty((cap, 2), np.int32)
    edge_elements = np.empty((cap, 2), np.int32)
    edge_sides = np.empty((cap, 2), np.int32)
    edge_delta = np.empty(cap, np.int32)
    ne = lib.cuddh_build_edges(
        nel, ev, nv, edge_vertices, edge_elements, edge_sides, edge_delta
    )
    return (
        edge_vertices[:ne].copy(),
        edge_elements[:ne].copy(),
        edge_sides[:ne].copy(),
        edge_delta[:ne].copy(),
    )


def h1_numbering(elem_vertices, nv, edge_vertices, edge_elements, edge_sides, edge_delta, nb):
    """Native CG DOF numbering; returns (dofs, ndof) or None."""
    lib = _load()
    if lib is None:
        return None
    ev = np.ascontiguousarray(elem_vertices, dtype=np.int32)
    nel = len(ev)
    dofs = np.empty((nel, nb, nb), np.int32)
    ndof = lib.cuddh_h1_numbering(
        nel,
        nb,
        ev,
        nv,
        len(edge_vertices),
        np.ascontiguousarray(edge_vertices, np.int32),
        np.ascontiguousarray(edge_elements, np.int32),
        np.ascontiguousarray(edge_sides, np.int32),
        np.ascontiguousarray(edge_delta, np.int32),
        dofs,
    )
    return dofs, int(ndof)
