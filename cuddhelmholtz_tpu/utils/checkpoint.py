"""Solver checkpoint/resume (aux subsystem; the reference has none).

SURVEY.md section 5 notes the reference's only resilience features are a
GMRES wall-clock cutoff and breakdown exit.  Here restarted GMRES is
naturally checkpointable: the restart state is just (x, residual history),
and `gmres(..., x0=...)` resumes exactly.  These helpers persist that state
(plus arbitrary solver metadata) as a single .npz.
"""

from __future__ import annotations

import os

import numpy as np


def save_solver_state(path: str, x, res_norm=None, **meta) -> None:
    """Persist a solver iterate and residual history."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"x": np.asarray(x)}
    if res_norm is not None:
        payload["res_norm"] = np.asarray(res_norm)
    for k, v in meta.items():
        payload[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_solver_state(path: str) -> dict:
    """Load a checkpoint: {'x': ..., 'res_norm': ..., <meta keys>}."""
    with np.load(path) as data:
        out = {}
        for k in data.files:
            if k.startswith("meta_"):
                out[k[5:]] = data[k]
            else:
                out[k] = data[k]
    return out
