"""Batched dense linear algebra primitives for the solver core.

Everything here is shaped for TPU: small dense SPD systems batched over
particles x scenarios, solved with Cholesky + triangular solves (all natively
batched XLA ops). The reference reaches for sparse CPU factorizations
(``PMPC.jl/src/cone_utils.jl:36-42`` SuiteSparse Cholesky); on TPU the per-stage
blocks are tiny and dense-batched is the speed-of-light layout.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from .block_chol import inv_chol_apply, inv_cholesky


def use_inverse_factor(n: int) -> bool:
    """Static rule: use the blocked inverse-Cholesky (matmul-only solves) for
    small systems — ~4x faster than XLA's cholesky lowering on TPU for large
    batches of small matrices. Falls back to plain Cholesky for big n (the
    blocked trace grows as nb^3) or when PMPC_TPU_BLOCK_CHOL=0."""
    if os.environ.get("PMPC_TPU_BLOCK_CHOL", "1") != "1":
        return False
    return 0 < n <= 160


def _use_pallas_factor(A) -> bool:
    """Use the fused Pallas kernel (near-free vs 47ms XLA / 14ms blocked for
    (8192,50,50) f32) when on a real TPU backend with f32 data."""
    if os.environ.get("PMPC_TPU_PALLAS", "1") != "1":
        return False
    if A.dtype != jnp.float32:
        return False
    n = A.shape[-1]
    if A.ndim < 2 or n <= 0:
        return False
    from .pallas_chol import fits_vmem

    if not fits_vmem(n):
        return False
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def spd_factor(A: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Factor a (batched) SPD matrix for `spd_apply`. Representation (inverse
    Cholesky factor vs Cholesky factor) is a static function of the size, so
    factor/apply pairs always agree."""
    n = A.shape[-1]
    if _use_pallas_factor(A):
        from .pallas_chol import pallas_inv_cholesky

        lead = A.shape[:-2]
        Minv = pallas_inv_cholesky(A.reshape((-1, n, n)), jitter=jitter)
        return Minv.reshape(lead + (n, n))
    if use_inverse_factor(n):
        return inv_cholesky(A, jitter=jitter)
    return cholesky_factor(A, jitter=jitter)


def spd_apply(F: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given F = spd_factor(A)."""
    n = F.shape[-1]
    if _use_pallas_factor(F) or use_inverse_factor(n):
        return inv_chol_apply(F, b)
    return cholesky_solve(F, b)


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
