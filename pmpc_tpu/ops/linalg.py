"""Batched dense linear algebra primitives for the solver core.

Everything here is shaped for TPU: small dense SPD systems batched over
particles x scenarios, solved with Cholesky + triangular solves (all natively
batched XLA ops). The reference reaches for sparse CPU factorizations
(``PMPC.jl/src/cone_utils.jl:36-42`` SuiteSparse Cholesky); on TPU the per-stage
blocks are tiny and dense-batched is the speed-of-light layout.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def cholesky_factor(A: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Cholesky factor of a (batched) SPD matrix, with optional diagonal jitter."""
    if jitter:
        n = A.shape[-1]
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    return jnp.linalg.cholesky(A)


def cholesky_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given the (batched) Cholesky factor ``L`` of ``A``.

    ``b`` may be a vector (..., n) or matrix (..., n, k)."""
    vector = b.ndim == L.ndim - 1
    if vector:
        b = b[..., None]
    y = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    x = lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)
    return x[..., 0] if vector else x


def psd_solve(A: jnp.ndarray, b: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve a (batched) SPD system via Cholesky."""
    return cholesky_solve(cholesky_factor(A, jitter=jitter), b)
