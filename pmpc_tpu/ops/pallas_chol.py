"""Pallas TPU kernel: fused batched Cholesky + inverse factor.

The hot operation of the IPM is factoring thousands of small SPD matrices
(B*M ~ 8192, n ~ 50) every Newton iteration. XLA's cholesky costs ~47 ms at
that size; the blocked-GEMM reformulation (`ops.block_chol`) ~14 ms. This
kernel computes ``Minv = L^{-1}`` (A = L L') entirely in VMEM with the BATCH
axis laid out on the TPU lane dimension:

    A is processed as (n, n, TB) tiles — every column operation is a
    (n, TB) vector op on the VPU, the rank-1 downdate a (n, n, TB)
    elementwise op; nothing round-trips to HBM until the final write.

Grid: one program per batch tile of TB=128 (lane width). The n-step column
loop and n-step forward substitution are static Python loops (unrolled at
trace time). Returns the same representation `ops.block_chol.inv_cholesky`
produces, so solves remain two batched GEMMs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # batch tile: the lane dimension is always padded to 128 in VMEM,
#           so smaller tiles don't reduce memory — instead the input block is
#           ALIASED with the output (3 buffers total) and `fits_vmem` gates n


def fits_vmem(n: int) -> bool:
    """3 (n_pad, n, 128) f32 buffers (aliased in/out + 2 scratch), times 2 for
    Mosaic's grid double-buffering, under ~14MB. Without the 2x factor n=90
    compiled standalone but VMEM-OOMed under an outer vmap (scoped allocation
    25.3M > 16M limit); oversize n falls back to the blocked-GEMM factor."""
    n_pad = -(-n // 8) * 8
    return 2 * 3 * n_pad * n * 128 * 4 <= 14 * 1024 * 1024


def _chol_inv_kernel(n: int, jitter: float, A_ref, M_ref, L):
    # The OUTPUT block doubles as the factorization workspace: the downdate
    # loop consumes the copied A to ~0, then the forward substitution
    # overwrites its rows top-down with Minv (row i reads only rows < i,
    # already rewritten). One VMEM buffer fewer than a separate S scratch —
    # the margin that lets n=90 fit under the scoped-vmem limit. (A_ref is
    # additionally HBM-aliased with M_ref, which saves the HBM copy; the
    # VMEM in/out blocks are still distinct, hence the explicit copy.)
    M_ref[...] = A_ref[...]
    if jitter:
        for j in range(n):
            M_ref[j, j, :] = M_ref[j, j, :] + jitter

    # column (outer-product) Cholesky, batch on lanes
    for j in range(n):
        # exact sqrt + divide (lax.rsqrt is an approximate VPU op on TPU and
        # measurably degrades the factor); a non-positive pivot (not SPD)
        # yields NaN so the IPM's non-finite freeze guards catch breakdown
        piv = M_ref[j, j, :]
        d = jnp.sqrt(jnp.where(piv > 0, piv, jnp.nan))  # (TB,)
        col = M_ref[:, j, :] / d[None, :]  # (n, TB)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j)
        col = jnp.where(mask, col, 0.0)
        L[:, j, :] = col
        M_ref[...] = M_ref[...] - col[:, None, :] * col[None, :, :]

    # forward substitution: row i of Minv solves L[i,:i] M[:i,:] + L[i,i] M[i,:] = e_i
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, TB), 0)
    for i in range(n):
        e = jnp.where(row_ids == i, 1.0, 0.0).astype(A_ref.dtype)
        if i > 0:
            # sum_k<i L[i,k,:] * M[k,:,:]  -> (n, TB)
            Lrow = L[i, :, :]  # (n, TB) value (refs don't take None indices)
            acc = jnp.sum(Lrow[:i][:, None, :] * M_ref[:i, :, :], axis=0)
            e = e - acc
        M_ref[i, :, :] = e / L[i, i, :][None, :]


@partial(jax.jit, static_argnames=("jitter",))
def pallas_inv_cholesky(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Minv = L^{-1} for A (B, n, n) SPD, f32. B padded to a tile multiple."""
    B, n, _ = A.shape
    nb = -(-B // TB)
    Bp = nb * TB
    At = jnp.moveaxis(A, 0, -1)  # (n, n, B)
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
        # padding batch entries get identity so the factorization is defined
        eye = jnp.eye(n, dtype=A.dtype)[:, :, None]
        padmask = (jnp.arange(Bp) >= B)[None, None, :]
        At = jnp.where(padmask, eye, At)

    kernel = partial(_chol_inv_kernel, n, jitter)
    Mt = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, TB), A.dtype),
        ],
        input_output_aliases={0: 0},
    )(At)
    return jnp.moveaxis(Mt[:, :, :B], -1, 0)
