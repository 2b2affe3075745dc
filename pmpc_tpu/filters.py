"""Fixed-point iteration filters for the SCP loop.

Parity with the reference's convergence filters (``pmpc/scp_mpc.py:37-62``):
Anderson acceleration (``AA``), uniform smoothing (``smooth``), and
min-residual selection (``select``) combination weights over the last
``filter_window`` SCP iterates.
"""

from __future__ import annotations

from typing import List

import numpy as np


def AA_method(Fs: List[np.ndarray]) -> np.ndarray:
    """Anderson-acceleration combination weights from residual history."""
    F = np.stack([f.reshape(-1) for f in Fs], -1)
    Ft = F[:, :-1] - F[:, -1:]
    th = np.linalg.solve(
        Ft.T @ Ft + 1e-10 * np.eye(Ft.shape[-1]), -Ft.T @ F[:, -1:]
    ).reshape(-1)
    return np.concatenate([th, [1.0 - np.sum(th)]], -1)


def smooth_method(Fs: List[np.ndarray]) -> np.ndarray:
    """Uniform averaging weights."""
    F = np.stack([f.reshape(-1) for f in Fs], -1)
    return np.ones(F.shape[-1]) / F.shape[-1]


def select_method(Fs: List[np.ndarray]) -> np.ndarray:
    """Weights solving the norm-weighted selection system (picks small-residual
    iterates; reference ``select_method``)."""
    F = np.stack([f.reshape(-1) for f in Fs], -1)
    A = np.diag(np.linalg.norm(F, axis=-2) ** 2)
    A = np.concatenate([A, np.ones((A.shape[-2], 1))], -1)
    last_row = np.ones((1, A.shape[-1]))
    last_row[:, -1] = 0.0
    A = np.concatenate([A, last_row], -2)
    b = np.concatenate([np.zeros(F.shape[-1]), np.ones(1)], -1)
    return np.linalg.solve(A, b).reshape(-1)[:-1]


FILTER_MAP = dict(smooth=smooth_method, select=select_method, AA=AA_method)
