"""Batched dense linear algebra primitives for the solver core.

Everything here is shaped for TPU: small dense SPD systems batched over
particles x scenarios, solved with Cholesky + triangular solves (all natively
batched XLA ops). The reference reaches for sparse CPU factorizations
(``PMPC.jl/src/cone_utils.jl:36-42`` SuiteSparse Cholesky); on TPU the per-stage
blocks are tiny and dense-batched is the speed-of-light layout.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
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


def _use_host_inverse_factor(n: int) -> bool:
    """Static rule: on the CPU backend, large factorizations go to the host
    BLAS via pure_callback. jaxlib's ``lapack_potrf_ffi`` on this class of
    machine runs UNBLOCKED reference code (~0.1 GFLOP/s: 370 ms for a 490^2
    f64 factor that numpy/OpenBLAS does in 9 ms), and the XLA-traced blocked
    factor pays 40-150 s of compile time at this size. The callback returns
    the INVERSE factor so applies stay XLA matmuls (same representation as
    `inv_cholesky`)."""
    if os.environ.get("PMPC_TPU_HOST_CHOL", "1") != "1":
        return False
    try:
        # jax.default_backend() IGNORES an active jax.default_device scope
        # (verified: returns 'tpu' inside default_device(cpu) on the axon
        # box) — the cone paths pin CPU exactly that way, so consult the
        # scoped device first
        dev = jax.config.jax_default_device
        if dev is not None:
            on_cpu = getattr(dev, "platform", None) == "cpu"
        else:
            on_cpu = jax.default_backend() == "cpu"
    except Exception:
        # unknown backend: STAY on the device path — wrongly guessing "cpu"
        # would route jitted TPU factorizations through a host callback
        on_cpu = False
    return on_cpu and n > 160


_BLAS_LIMIT = None


def _blas_single_thread():
    """Scoped single-thread BLAS for host callbacks: multithreaded OpenBLAS
    spinning against XLA's own busy-waiting threadpool is a 10x slowdown
    (measured 82 ms vs 8 ms for a 490^2 f64 factor inside pure_callback)."""
    global _BLAS_LIMIT
    try:
        if _BLAS_LIMIT is None:
            from threadpoolctl import ThreadpoolController

            _BLAS_LIMIT = ThreadpoolController()
        return _BLAS_LIMIT.limit(limits=1, user_api="blas")
    except Exception:
        import contextlib

        return contextlib.nullcontext()


def _host_inv_chol_np(A_u8, jitter: float, dtype: str):
    """Host kernel: Minv = L^{-1} per batch element; NaN on a non-SPD block
    (keeps the callers' breakdown-detection contract).

    Operates on uint8 BITCASTS (trailing itemsize axis): ``jax.enable_x64``
    is thread-local, and pure_callback buffers are canonicalized on an XLA
    runtime thread that sees the global (x64-off) config — float64 operands
    would be silently downcast. Bytes pass through untouched."""
    import scipy.linalg as sla

    dt = np.dtype(dtype)
    A = np.ascontiguousarray(A_u8).view(dt)[..., 0]
    n = A.shape[-1]
    if jitter:
        A = A + np.asarray(jitter, dt) * np.eye(n, dtype=dt)
    flat = A.reshape((-1, n, n))
    out = np.empty_like(flat)
    eye = np.eye(n, dtype=dt)
    with _blas_single_thread():
        for i in range(flat.shape[0]):
            try:
                L = np.linalg.cholesky(flat[i])
                out[i] = sla.solve_triangular(L, eye, lower=True,
                                              check_finite=False)
            except np.linalg.LinAlgError:
                out[i] = np.nan
    # return an OWNING contiguous uint8 array, not a view: the callback
    # bridge may capture the buffer pointer without holding the view's base
    return np.ascontiguousarray(out.reshape(A.shape))[..., None] \
        .view(np.uint8).copy()


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

        # same caveat as _use_host_inverse_factor: jax.default_backend()
        # IGNORES an active jax.default_device scope, and the batched
        # structured route pins CPU exactly that way — a Pallas call would
        # fail to lower there
        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", None) == "cpu":
            return False
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
    if _use_host_inverse_factor(n):
        A_u8 = lax.bitcast_convert_type(A, jnp.uint8)
        out_u8 = jax.pure_callback(
            partial(_host_inv_chol_np, jitter=float(jitter),
                    dtype=str(A.dtype)),
            jax.ShapeDtypeStruct(A_u8.shape, jnp.uint8), A_u8,
            vmap_method="expand_dims")
        return lax.bitcast_convert_type(out_u8, A.dtype)
    return cholesky_factor(A, jitter=jitter)


def spd_factor_diag(A: jnp.ndarray, w: jnp.ndarray,
                    jitter: float = 0.0) -> jnp.ndarray:
    """Factor (A + diag(w)) for `spd_apply`. On the Pallas path the diagonal
    is added in-kernel, keeping a loop-invariant A out of the per-iteration
    HBM traffic (the IPM's Newton matrix); elsewhere this is just
    spd_factor(A + diag(w))."""
    if _use_pallas_factor(A):
        from .pallas_chol import pallas_inv_cholesky_diag

        n = A.shape[-1]
        lead = A.shape[:-2]
        Minv = pallas_inv_cholesky_diag(
            A.reshape((-1, n, n)), w.reshape((-1, n)), jitter=jitter)
        return Minv.reshape(lead + (n, n))
    n = A.shape[-1]
    K = A + w[..., :, None] * jnp.eye(n, dtype=A.dtype)
    return spd_factor(K, jitter=jitter)


def spd_apply(F: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given F = spd_factor(A)."""
    n = F.shape[-1]
    if _use_pallas_factor(F) or use_inverse_factor(n) \
            or _use_host_inverse_factor(n):
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
