"""Pallas TPU kernels: fused batched Cholesky + inverse factor.

The hot operation of the IPM is factoring thousands of small SPD matrices
(B*M ~ 8192, n ~ 50-100) every Newton iteration. XLA's cholesky costs ~47 ms
at (8192, 50, 50) f32; the blocked-GEMM reformulation (`ops.block_chol`)
~14 ms. These kernels compute ``Minv = L^{-1}`` (A = L L') entirely in VMEM
with the BATCH axis laid out on the TPU lane dimension:

    A is processed as (n, n, TB) tiles — every column operation is a
    (n, TB) vector op on the VPU, the rank-1 downdate a (n, n, TB)
    elementwise op; nothing round-trips to HBM until the final write.

Two variants, selected by size (both return the same representation as
`ops.block_chol.inv_cholesky`, so solves remain two batched GEMMs):

- small n (<= ~68): input VMEM block + L scratch + output workspace — three
  buffers, but Mosaic's automatic grid pipelining overlaps the input load
  with compute (measured ~10-25% faster than the single-buffer variant),
- large n (<= ~96): ONE VMEM buffer — the output block, DMA-filled straight
  from HBM and factored/inverted fully in place. This is what lets n=90
  (the N=50 pod-scale config) run in Pallas at all: the three-buffer
  variant VMEM-OOMs beyond n~68.

Grid: one program per batch tile of TB=128 (lane width). The n-step column
loop and n-step forward substitution are static Python loops (unrolled at
trace time).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # batch tile: the lane dimension is always padded to 128 in VMEM,
#           so smaller tiles don't reduce memory — `fits_vmem` gates n instead

INTERPRET = False  # tests flip this to run the kernels through the Pallas
#                    interpreter on CPU (the suite never sees a real TPU)


def _fits_small(n: int) -> bool:
    """Three (n_pad, n, 128) f32 buffers (in block + out workspace + L
    scratch), times 2 for Mosaic's grid double-buffering, under ~14MB."""
    n_pad = -(-n // 8) * 8
    return 2 * 3 * n_pad * n * 128 * 4 <= 14 * 1024 * 1024


def _fits_big(n: int) -> bool:
    """Single (n_pad, n_pad, 128) buffer variant. Measured Mosaic scoped-vmem
    usage is ~2.8x one block (grid double-buffering + DMA staging): n=118
    (n_pad=120) OOMed at 20.49M/16M, so budget 3 blocks under 15M."""
    n_pad = -(-n // 8) * 8
    return 3 * n_pad * n_pad * 128 * 4 <= 15 * 1024 * 1024


def fits_vmem(n: int) -> bool:
    """Can some Pallas variant factor (B, n, n) f32? Oversize n falls back
    to the blocked-GEMM factor (`ops.block_chol`)."""
    return n > 0 and (_fits_small(n) or _fits_big(n))


PW = 8  # panel width for the blocked factor: one sublane tile, so every
#         column slice the panel loop takes is 8-aligned


def _blocked_factor(n: int, M_ref, L_ref):
    """Blocked right-looking Cholesky, batch on lanes, columns stored into
    ``L_ref`` (or in place into ``M_ref`` when ``L_ref is None``).

    The naive column algorithm downdates the FULL (n, n, TB) block every
    column (n^3 elementwise FMAs); panels of PW columns restrict the rank-1s
    to the panel (rows >= c0) and apply one rank-PW downdate to only the
    TRAILING (n-c1, n-c1, TB) submatrix per panel — sum_p PW*(n-PW(p+1))^2
    ~= n^3/3, a ~2.7x op reduction that the VPU-roofline-bound kernel
    converts directly into time (measured in benchmarks/ab_pallas90.py)."""
    dst = M_ref if L_ref is None else L_ref
    for p in range(-(-n // PW)):
        c0, c1 = PW * p, min(PW * (p + 1), n)
        for j in range(c0, c1):
            # exact sqrt + divide (lax.rsqrt is an approximate VPU op on TPU
            # and measurably degrades the factor); a non-positive pivot (not
            # SPD) yields NaN so the IPM's non-finite freeze guards catch
            # breakdown
            piv = M_ref[j, j, :]
            d = jnp.sqrt(jnp.where(piv > 0, piv, jnp.nan))  # (TB,)
            col = M_ref[c0:, j, :] / d[None, :]  # (n - c0, TB)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n - c0, 1), 0) + c0
            col = jnp.where(rows >= j, col, 0.0)
            if j + 1 < c1:
                # rank-1 downdate of the REMAINING PANEL columns only (rows
                # above j are masked to zero in col, so upper-triangle slots
                # absorb garbage that is never read)
                colP = col[j + 1 - c0:c1 - c0]  # (c1-j-1, TB)
                M_ref[c0:, j + 1:c1, :] = M_ref[c0:, j + 1:c1, :] \
                    - col[:, None, :] * colP[None, :, :]
            dst[c0:, j, :] = col
        if c1 < n:
            # rank-PW downdate of the trailing submatrix from the finished
            # panel's below-panel rows (one rank-1 per panel column)
            for k in range(c0, c1):
                v = dst[c1:, k, :]  # (n - c1, TB)
                M_ref[c1:, c1:, :] = M_ref[c1:, c1:, :] \
                    - v[:, None, :] * v[None, :, :]


def _blocked_substitution(n: int, M_ref, L_ref):
    """Forward substitution M = L^{-1}, rows top-down into ``M_ref``.

    Row i of the inverse factor is nonzero only in columns <= i: restricting
    the accumulation (and the unit rhs) to the leading 8-aligned column cap
    cuts the op count from n^3/2 to ~n^3/3. Columns past the cap are stored
    as explicit zeros — the applies outside consume Minv as a DENSE operand
    of two batched GEMMs (`ops.block_chol.inv_chol_apply`)."""
    L = M_ref if L_ref is None else L_ref
    for i in range(n):
        d = L[i, i, :]  # L[i,i], read before row i may be overwritten
        ccap = min(-(-(i + 1) // PW) * PW, n)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ccap, TB), 0)
        e = jnp.where(col_ids == i, 1.0, 0.0).astype(L.dtype)
        if i > 0:
            # in-place: L row i lives in M_ref[i, :i] (column-stored factor)
            # and Minv rows < i are already rewritten — row i reads only
            # not-yet-overwritten parts of itself
            Lrow = L[i, :, :]  # (n, TB)
            acc = jnp.sum(Lrow[:i][:, None, :] * M_ref[:i, :ccap, :], axis=0)
            e = e - acc
        M_ref[i, :ccap, :] = e / d[None, :]
        if ccap < n:
            M_ref[i, ccap:, :] = jnp.zeros((n - ccap, TB), L.dtype)


def _chol_inv_kernel_small_diag(n: int, jitter: float, A_ref, w_ref, M_ref, L):
    # `_chol_inv_kernel_small` with the barrier diagonal added IN-KERNEL:
    # the IPM's Newton matrix is K = Hff + diag(w) where Hff is LOOP-
    # INVARIANT and only w changes per iteration — taking them separately
    # lets XLA hoist Hff's pad/relayout out of the IPM while-loop and
    # removes the per-iteration (B, n, n) K materialization in HBM.
    M_ref[...] = A_ref[...]
    for j in range(n):
        M_ref[j, j, :] = M_ref[j, j, :] + (w_ref[j, :] + jitter)
    _blocked_factor(n, M_ref, L)
    _blocked_substitution(n, M_ref, L)


def _chol_inv_kernel_big_diag(n: int, jitter: float, A_ref, w_ref, M_ref, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        A_ref.at[:, :, pl.ds(i * TB, TB)], M_ref, sem)
    cp.start()
    cp.wait()
    for j in range(n):
        M_ref[j, j, :] = M_ref[j, j, :] + (w_ref[j, :] + jitter)
    _blocked_factor(n, M_ref, None)
    _blocked_substitution(n, M_ref, None)


def _chol_inv_kernel_small(n: int, jitter: float, A_ref, M_ref, L):
    # The OUTPUT block doubles as the factorization workspace: the downdate
    # loops consume the copied A, then the forward substitution overwrites
    # its rows top-down with Minv (row i reads only rows < i, already
    # rewritten). (A_ref is additionally HBM-aliased with M_ref, which saves
    # the HBM copy; the VMEM in/out blocks are still distinct, hence the
    # explicit copy.)
    M_ref[...] = A_ref[...]
    if jitter:
        for j in range(n):
            M_ref[j, j, :] = M_ref[j, j, :] + jitter
    _blocked_factor(n, M_ref, L)
    _blocked_substitution(n, M_ref, L)


def _chol_inv_kernel_big(n: int, jitter: float, A_ref, M_ref, sem):
    # The OUTPUT block is the ONLY VMEM buffer: the input batch tile is DMA'd
    # from HBM straight into it, the factorization runs fully in place
    # (downdates only ever touch the trailing submatrix, so finished L
    # columns are never disturbed), and the forward substitution then
    # overwrites the rows top-down with Minv.
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        A_ref.at[:, :, pl.ds(i * TB, TB)], M_ref, sem)
    cp.start()
    cp.wait()
    if jitter:
        for j in range(n):
            M_ref[j, j, :] = M_ref[j, j, :] + jitter
    _blocked_factor(n, M_ref, None)
    _blocked_substitution(n, M_ref, None)


def _pallas_inv_cholesky_impl(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    B, n, _ = A.shape
    nb = -(-B // TB)
    Bp = nb * TB

    if _fits_small(n):
        At = jnp.moveaxis(A, 0, -1)  # (n, n, B)
        if Bp != B:
            At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
            # padding batch entries get identity so the factorization is defined
            eye = jnp.eye(n, dtype=A.dtype)[:, :, None]
            padmask = (jnp.arange(Bp) >= B)[None, None, :]
            At = jnp.where(padmask, eye, At)
        kernel = partial(_chol_inv_kernel_small, n, jitter)
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
            interpret=INTERPRET,
        )(At)
        return jnp.moveaxis(Mt[:, :, :B], -1, 0)

    np_ = -(-n // 8) * 8
    At = jnp.moveaxis(A, 0, -1)  # (n, n, B)
    if Bp != B or np_ != n:
        At = jnp.pad(At, ((0, np_ - n), (0, np_ - n), (0, Bp - B)))
        if np_ != n:
            idx = jnp.arange(n, np_)
            At = At.at[idx, idx, :].set(1.0)
        if Bp != B:
            eye = jnp.eye(np_, dtype=A.dtype)[:, :, None]
            padmask = (jnp.arange(Bp) >= B)[None, None, :]
            At = jnp.where(padmask, eye, At)

    kernel = partial(_chol_inv_kernel_big, np_, jitter)
    Mt = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((np_, np_, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, np_, Bp), A.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(At)
    return jnp.moveaxis(Mt[:n, :n, :B], -1, 0)


def _pallas_inv_cholesky_diag_impl(A: jax.Array, w: jax.Array,
                                   jitter: float = 0.0) -> jax.Array:
    """inv_cholesky(A + diag(w)) with the diagonal added in-kernel. A (B,n,n)
    is typically loop-invariant (the condensed Hessian) while w (B,n) changes
    per IPM iteration: splitting them makes A's pad/relayout loop-invariant
    (hoisted by XLA) and skips materializing K in HBM every iteration."""
    B, n, _ = A.shape
    nb = -(-B // TB)
    Bp = nb * TB
    wt = jnp.moveaxis(w, 0, -1)  # (n, B)
    if Bp != B:
        wt = jnp.pad(wt, ((0, 0), (0, Bp - B)))

    if _fits_small(n):
        At = jnp.moveaxis(A, 0, -1)  # (n, n, B)
        if Bp != B:
            At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
            eye = jnp.eye(n, dtype=A.dtype)[:, :, None]
            padmask = (jnp.arange(Bp) >= B)[None, None, :]
            At = jnp.where(padmask, eye, At)
        kernel = partial(_chol_inv_kernel_small_diag, n, jitter)
        Mt = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n, TB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, n, TB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, n, Bp), A.dtype),
            scratch_shapes=[
                pltpu.VMEM((n, n, TB), A.dtype),
            ],
            interpret=INTERPRET,
        )(At, wt)
        return jnp.moveaxis(Mt[:, :, :B], -1, 0)

    np_ = -(-n // 8) * 8
    At = jnp.moveaxis(A, 0, -1)  # (n, n, B)
    if Bp != B or np_ != n:
        At = jnp.pad(At, ((0, np_ - n), (0, np_ - n), (0, Bp - B)))
        wt = jnp.pad(wt, ((0, np_ - n), (0, 0)))
        if np_ != n:
            idx = jnp.arange(n, np_)
            At = At.at[idx, idx, :].set(1.0)
        if Bp != B:
            eye = jnp.eye(np_, dtype=A.dtype)[:, :, None]
            padmask = (jnp.arange(Bp) >= B)[None, None, :]
            At = jnp.where(padmask, eye, At)

    kernel = partial(_chol_inv_kernel_big_diag, np_, jitter)
    Mt = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((np_, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((np_, np_, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, np_, Bp), A.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(At, wt)
    return jnp.moveaxis(Mt[:n, :n, :B], -1, 0)


def _make_batched_factor(jitter: float):
    """custom_vmap wrapper: an outer jax.vmap folds its axis into the
    kernel's batch axis instead of batching the pallas_call itself — the
    ANY-memory-space input of the big kernel has no batching rule, and even
    for the small kernel merged batches tile better (fewer partial TB
    tiles). Kernel math is per-batch-element, so the fold is exact."""

    @jax.custom_batching.custom_vmap
    def fac(A):
        return _pallas_inv_cholesky_impl(A, jitter=jitter)

    @fac.def_vmap
    def _fac_vmap(axis_size, in_batched, A):  # noqa: ANN001
        (a_batched,) = in_batched
        if not a_batched:
            return fac(A), False
        lead = A.shape[:2]
        out = fac(A.reshape((lead[0] * lead[1],) + A.shape[2:]))
        return out.reshape(lead + out.shape[1:]), True

    return fac


def _make_batched_factor_diag(jitter: float):
    """custom_vmap wrapper for the diag-add variant: outer vmap axes fold
    into the kernel batch (see `_make_batched_factor`)."""

    @jax.custom_batching.custom_vmap
    def fac(A, w):
        return _pallas_inv_cholesky_diag_impl(A, w, jitter=jitter)

    @fac.def_vmap
    def _fac_vmap(axis_size, in_batched, A, w):  # noqa: ANN001
        a_b, w_b = in_batched
        if not a_b:
            A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
        if not w_b:
            w = jnp.broadcast_to(w[None], (axis_size,) + w.shape)
        lead = A.shape[:2]
        out = fac(A.reshape((lead[0] * lead[1],) + A.shape[2:]),
                  w.reshape((lead[0] * lead[1],) + w.shape[2:]))
        return out.reshape(lead + out.shape[1:]), True

    return fac


_FACTOR_CACHE: dict = {}


def pallas_inv_cholesky(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Minv = L^{-1} for A (B, n, n) SPD, f32. B padded to a tile multiple.

    Dispatches on n: the three-buffer pipelined kernel where it fits, else
    the single-buffer in-place kernel (n padded to a multiple of 8 — the
    HBM->VMEM DMA needs an 8-aligned sublane slice — with identity on the
    padded diagonal; the inverse factor of blockdiag(A, I) is
    blockdiag(L^{-1}, I), so the un-pad slice at the end is exact)."""
    key = float(jitter)
    fac = _FACTOR_CACHE.get(key)
    if fac is None:
        fac = _FACTOR_CACHE.setdefault(key, _make_batched_factor(key))
    return fac(A)


_FACTOR_DIAG_CACHE: dict = {}


def pallas_inv_cholesky_diag(A: jax.Array, w: jax.Array,
                             jitter: float = 0.0) -> jax.Array:
    """Minv = L^{-1} for (A + diag(w)), A (B, n, n) SPD f32, w (B, n).

    The diagonal is added in-kernel so a loop-invariant A (the IPM's
    condensed Hessian block) is padded/relayouted ONCE outside the solver
    loop and the per-iteration Newton matrix never materializes in HBM."""
    key = float(jitter)
    fac = _FACTOR_DIAG_CACHE.get(key)
    if fac is None:
        fac = _FACTOR_DIAG_CACHE.setdefault(key, _make_batched_factor_diag(key))
    return fac(A, w)
