"""k-worst-particle (CVaR) consensus objective — parity with the reference cone
path's ``k`` option (``PMPC.jl/src/main.jl:204-238``).

The reference minimizes, over the consensus variable, the sum of the k largest
particle costs via the epigraph program

    min (1+eps) sum_i y_i + (1-eps) k t
    s.t. y_i >= 0,  J_i(z) <= y_i + t,   (eps = COST_ANCHOR_EPS = 1e-3)

with each particle cost J_i (a convex quadratic in z_i = [u_cons; u_free_i])
encoded as a second-order cone via its Cholesky factor (``Pqr2Gh``,
``cone_utils.jl:25-61``). We build the same program over the condensed
variable and hand it to the NT-scaled cone IPM: the quadratic epigraph
``||L z||^2 + q'z + c <= w`` becomes the standard SOC

    || (2 L z ; 1 - (w - q'z - c)) ||_2  <=  1 + (w - q'z - c).

The assembly is DEVICE-NATIVE: the per-particle epigraph cones are built with
one batched Cholesky + broadcast-mask embeddings inside one jitted program
(where the reference loops sparse CSC assembly on the CPU with ``@threads``,
``cone_utils.jl:64-95``), and the cone IPM solve fuses into the same program.

Per-particle constants matter here (they decide WHICH particles are worst), so
J_i includes its constant term, evaluated at U = 0.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .coneipm import ConeLP, cone_qp_solve
from .extras import x_map
from .reduced import CondensedQP

COST_ANCHOR_EPS = 1e-3


def particle_constants(
    g, X_prev, U_prev, Q, R, X_ref, U_ref,
    reg_x, reg_u, slew_reg0, slew_um1,
) -> np.ndarray:
    """c_i = J_i at U = 0 (so that J_i(z) = 0.5 z'H_i z + q_i'z + c_i exactly).

    g: (M, NX) condensed state offset (x at U=0); the rest are the raw
    (M, N, ...) problem arrays."""
    M, N, xdim = X_prev.shape
    g = np.asarray(g).reshape(M, N, xdim)
    dX = g - np.asarray(X_ref)
    c = 0.5 * np.einsum("mni,mnij,mnj->m", dX, np.asarray(Q), dX)
    c += 0.5 * np.asarray(reg_x) * np.sum((g - np.asarray(X_prev)) ** 2, axis=(1, 2))
    Ur = np.asarray(U_ref)
    c += 0.5 * np.einsum("mni,mnij,mnj->m", Ur, np.asarray(R), Ur)
    c += 0.5 * np.asarray(reg_u) * np.sum(np.asarray(U_prev) ** 2, axis=(1, 2))
    c += 0.5 * np.asarray(slew_reg0) * np.sum(np.asarray(slew_um1) ** 2, axis=-1)
    return c


@partial(jax.jit, static_argnames=("N", "udim", "xdim", "iters", "tol_exp",
                                   "kappa", "has_ubox", "has_xbox"))
def _cvar_device(H_per, q_per, c_per, cqp: CondensedQP, k, eps,
                 u_l, u_u, x_l, x_u,
                 N: int, udim: int, xdim: int,
                 iters: int, tol_exp: int, kappa: float,
                 has_ubox: bool, has_xbox: bool, tol_dynamic=None,
                 warm=None):
    """Assemble + solve the CVaR-k epigraph cone program, all on device."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    nz = nc + M * nf
    NX = cqp.g.shape[-1]
    nzi = nc + nf
    dtype = cqp.qf.dtype
    nv = nz + M + 1  # v = [z (nz); y (M); t (1)]
    eyeM = jnp.eye(M, dtype=dtype)

    # objective normalized by the particle-cost scale so the IPM's duality
    # measure is a RELATIVE gap (otherwise float32 cannot reach an absolute
    # tolerance on problems with large cost constants)
    sigma = jnp.maximum(1.0, jnp.mean(jnp.abs(c_per)))
    c_obj = jnp.zeros((nv,), dtype)
    c_obj = c_obj.at[nz:nz + M].set((1.0 + eps) / sigma)
    c_obj = c_obj.at[nz + M].set((1.0 - eps) * k / sigma)

    Xmap, xoff = x_map(cqp)

    Gl_rows, hl_rows = [], []
    # y >= 0
    Gy = jnp.zeros((M, nv), dtype).at[:, nz:nz + M].set(-eyeM)
    Gl_rows.append(Gy)
    hl_rows.append(jnp.zeros((M,), dtype))

    eye_v = jnp.eye(nv, dtype=dtype)
    if has_ubox:
        ul = u_l.reshape(M, N * udim)
        uu = u_u.reshape(M, N * udim)
        if nc:
            sel = eye_v[:nc]
            Gl_rows += [sel, -sel]
            hl_rows += [uu[0, :nc], -ul[0, :nc]]
        if nf:
            sel = eye_v[nc:nz]  # particle-major free-control selectors
            Gl_rows += [sel, -sel]
            hl_rows += [uu[:, nc:].reshape(-1), -ul[:, nc:].reshape(-1)]
    if has_xbox:
        xl = x_l.reshape(M * NX)
        xu = x_u.reshape(M * NX)
        Gx = jnp.zeros((M * NX, nv), dtype).at[:, :nz].set(Xmap)
        Gl_rows += [Gx, -Gx]
        hl_rows += [xu - xoff, -(xl - xoff)]

    # per-particle quadratic epigraph SOCs, batched over M:
    # J_i(z) = ||A_i z_i||^2 + q_i'z_i + c_i with A_i = L_i'/sqrt(2)
    L = jnp.linalg.cholesky(H_per + 1e-12 * jnp.eye(nzi, dtype=dtype))
    A = jnp.swapaxes(L, -1, -2) / jnp.sqrt(jnp.asarray(2.0, dtype))
    # embed z_i = [uc; uf_i] columns into v: consensus block shared, the i-th
    # free block placed by a broadcast one-hot over particles
    Az = jnp.zeros((M, nzi, nv), dtype)
    Az = Az.at[:, :, :nc].set(A[:, :, :nc])
    free_cols = (eyeM[:, None, :, None] * A[:, :, None, nc:]).reshape(
        M, nzi, M * nf)
    Az = Az.at[:, :, nc:nz].set(free_cols)
    qv = jnp.zeros((M, nv), dtype)
    qv = qv.at[:, :nc].set(q_per[:, :nc])
    qv = qv.at[:, nc:nz].set(
        (eyeM[:, :, None] * q_per[:, None, nc:]).reshape(M, M * nf))
    # w_i = y_i + t
    wv = jnp.zeros((M, nv), dtype)
    wv = wv.at[:, nz:nz + M].set(eyeM)
    wv = wv.at[:, nz + M].set(1.0)

    # SOC rows: s = h - G v with s0 = 1 + (w - q'z - c), s_mid = 2 A z,
    # s_last = 1 - (w - q'z - c)
    G = jnp.concatenate([
        -(wv - qv)[:, None, :], -2.0 * Az, (wv - qv)[:, None, :]], axis=1)
    h = jnp.concatenate([
        (1.0 - c_per)[:, None], jnp.zeros((M, nzi), dtype),
        (1.0 + c_per)[:, None]], axis=1)
    # uniform per-cone scaling (a scaled SOC is the same constraint) keeps
    # the IPM well-conditioned when particle-cost constants are large
    scale = jnp.maximum(1.0, jnp.maximum(
        jnp.abs(c_per), jnp.max(jnp.abs(Az), axis=(1, 2))))
    Gq = G / scale[:, None, None]
    hq = h / scale[:, None]

    Gl = jnp.concatenate(Gl_rows, axis=0)
    hl = jnp.concatenate(hl_rows)
    # pure-LP objective: tiny quadratic regularization keeps the init sane
    P = 1e-8 * eye_v

    prob = ConeLP(P=P, q=c_obj, Gl=Gl, hl=hl, Gq=Gq, hq=hq)
    v, s, z, stats = cone_qp_solve(prob, iters=iters, tol_exp=tol_exp,
                                   kappa=kappa, tol_dynamic=tol_dynamic,
                                   warm=warm)

    from .extras import _recover_XU

    X, U = _recover_XU(v[:nz], Xmap, xoff, M, nc, nf, N, udim, xdim)
    return X, U, v[nz:], stats, (v, z)


def cvar_solve(
    H_per,  # (M, nc+nf, nc+nf) per-particle Hessians over z_i
    q_per,  # (M, nc+nf)
    c_per,  # (M,) per-particle constants (J_i at z_i = 0)
    cqp: CondensedQP,
    N: int,
    udim: int,
    xdim: int,
    k: int,
    u_l=None, u_u=None, x_l=None, x_u=None,
    settings: Optional[Dict[str, Any]] = None,
):
    """Solve the CVaR-k consensus problem. Returns (X, U, data)."""
    from .coneipm import cone_host_setup, cone_host_state, cone_host_stats

    settings = settings or {}
    dtype = np.dtype(np.asarray(cqp.qf).dtype)
    eps = float(settings.get("cost_anchor_eps", COST_ANCHOR_EPS))

    has_ubox = u_l is not None and u_u is not None
    has_xbox = x_l is not None and x_u is not None
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    # shared host-cone prelude (see coneipm.cone_host_setup); f32 floor for
    # the epigraph program is a ~1e-3 RELATIVE gap, hence tolexp32=-3
    sig_key = ("cvar", N, udim, xdim, M, nc, nf, int(k), has_ubox, has_xbox)
    iters, tol_exp, kappa, tol_eff, tol_dyn, warm = cone_host_setup(
        settings, dtype, sig_key, "cvar_warm", iters32=50, tolexp32=-3,
        kappa32=1e-6)

    j = lambda a: None if a is None else jnp.asarray(a, dtype)
    X, U, ts, stats, (v_out, z_out) = _cvar_device(
        jnp.asarray(H_per, dtype), jnp.asarray(q_per, dtype),
        jnp.asarray(c_per, dtype), cqp,
        jnp.asarray(float(k), dtype), jnp.asarray(eps, dtype),
        j(u_l), j(u_u), j(x_l), j(x_u),
        N=N, udim=udim, xdim=xdim, iters=iters, tol_exp=tol_exp, kappa=kappa,
        has_ubox=has_ubox, has_xbox=has_xbox,
        tol_dynamic=None if tol_dyn is None else jnp.asarray(tol_dyn, dtype),
        warm=warm)
    data = dict(
        solver_state=cone_host_state(sig_key, "cvar_warm", v_out, z_out),
        ts=np.asarray(ts),
        **cone_host_stats(stats, tol_eff),
    )
    return np.asarray(X), np.asarray(U), data
