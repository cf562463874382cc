"""Mesh and solution I/O.

Parity with the reference's test fixture loader
(``/root/reference/tests/load_unstructured_square.cpp``) and binary dump
helper (``/root/reference/examples/examples.hpp:11-16``).
"""

from __future__ import annotations

import os

import numpy as np

from .mesh2d import Mesh2D

# repo-root meshes directory (mirrors the reference's meshes/ asset)
_MESH_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "meshes")


def load_mesh_dir(path: str) -> Mesh2D:
    """Load a mesh from a directory with info.txt/coordinates.txt/elements.txt.

    Format: info.txt holds ``n_pts n_elem``; coordinates.txt has n_pts rows of
    ``x y``; elements.txt has n_elem rows of 4 vertex indices (CCW).
    """
    with open(os.path.join(path, "info.txt")) as f:
        n_pts, n_elem = (int(t) for t in f.read().split()[:2])
    coords = np.loadtxt(os.path.join(path, "coordinates.txt"), dtype=np.float64)
    elems = np.loadtxt(os.path.join(path, "elements.txt"), dtype=np.int64)
    coords = coords.reshape(n_pts, 2)
    elems = elems.reshape(n_elem, 4)
    return Mesh2D(coords, elems)


def load_unstructured_square() -> Mesh2D:
    """The 140-vertex / 119-element unstructured quad mesh of [-1, 1]^2."""
    return load_mesh_dir(os.path.join(_MESH_DIR, "unstructured_square"))


def to_file(path: str, array: np.ndarray) -> None:
    """Dump a float64 array as raw binary (reference-compatible)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.asarray(array, dtype=np.float64).ravel(order="F").tofile(path)
