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

Per-particle constants matter here (they decide WHICH particles are worst), so
J_i includes its constant term, evaluated at U = 0.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

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


def cvar_solve(
    H_per: np.ndarray,  # (M, nc+nf, nc+nf) per-particle Hessians over z_i
    q_per: np.ndarray,  # (M, nc+nf)
    c_per: np.ndarray,  # (M,) per-particle constants (J_i at z_i = 0)
    cqp: CondensedQP,
    N: int,
    udim: int,
    xdim: int,
    k: int,
    u_l=None, u_u=None, x_l=None, x_u=None,
    settings: Optional[Dict[str, Any]] = None,
):
    """Solve the CVaR-k consensus problem. Returns (X, U, data)."""
    settings = settings or {}
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    nz = nc + M * nf
    NX = cqp.g.shape[-1]
    dtype = np.asarray(cqp.qf).dtype
    eps = float(settings.get("cost_anchor_eps", COST_ANCHOR_EPS))

    # variable layout: v = [z (nz); y (M); t (1)]
    nv = nz + M + 1
    P = np.zeros((nv, nv))
    # objective normalized by the particle-cost scale so the IPM's duality
    # measure is a RELATIVE gap (otherwise float32 cannot reach an absolute
    # tolerance on problems with large cost constants)
    sigma = max(1.0, float(np.mean(np.abs(c_per))))
    c_obj = np.zeros(nv)
    c_obj[nz:nz + M] = (1.0 + eps) / sigma
    c_obj[nz + M] = (1.0 - eps) * k / sigma

    Xmap, xoff = x_map(cqp)

    Gl_rows, hl_rows = [], []
    # y >= 0
    Gy = np.zeros((M, nv))
    Gy[:, nz:nz + M] = -np.eye(M)
    Gl_rows.append(Gy)
    hl_rows.append(np.zeros(M))

    if u_l is not None and u_u is not None:
        ul = np.asarray(u_l).reshape(M, N * udim)
        uu = np.asarray(u_u).reshape(M, N * udim)
        if nc:
            sel = np.zeros((nc, nv)); sel[:, :nc] = np.eye(nc)
            Gl_rows += [sel, -sel]
            hl_rows += [uu[0, :nc], -ul[0, :nc]]
        for i in range(M):
            if nf:
                sel = np.zeros((nf, nv))
                sel[:, nc + i * nf: nc + (i + 1) * nf] = np.eye(nf)
                Gl_rows += [sel, -sel]
                hl_rows += [uu[i, nc:], -ul[i, nc:]]
    if x_l is not None and x_u is not None:
        xl = np.asarray(x_l).reshape(M * NX)
        xu = np.asarray(x_u).reshape(M * NX)
        Gx = np.zeros((M * NX, nv)); Gx[:, :nz] = Xmap
        Gl_rows += [Gx, -Gx]
        hl_rows += [xu - xoff, -(xl - xoff)]

    # per-particle quadratic epigraph SOCs
    soc_blocks = []
    nzi = nc + nf
    for i in range(M):
        Hi = np.asarray(H_per[i], dtype=float)
        qi = np.asarray(q_per[i], dtype=float)
        ci = float(c_per[i])
        L = np.linalg.cholesky(Hi + 1e-12 * np.eye(nzi))  # J_i = ||L'z||^2/2 ...
        # J_i(z) = 0.5 z'Hz + q'z + c = ||A z||^2 + q'z + c with A = L'/sqrt(2)
        A = L.T / np.sqrt(2.0)
        # embed z_i columns into v
        Ev = np.zeros((nzi, nv))
        Ev[:nc, :nc] = np.eye(nc)
        Ev[nc:, nc + i * nf: nc + (i + 1) * nf] = np.eye(nf)
        Az = A @ Ev  # (nzi, nv)
        qv = qi @ Ev  # (nv,)
        wv = np.zeros(nv); wv[nz + i] = 1.0; wv[nz + M] = 1.0  # w = y_i + t
        # SOC: s = h - G v with
        #   s0 = 1 + (w - q'z - c);  s1 = 2 A z;  s2 = 1 - (w - q'z - c)
        p = 2 + nzi
        G = np.zeros((p, nv)); h = np.zeros(p)
        G[0] = -(wv - qv); h[0] = 1.0 - ci
        G[1:1 + nzi] = -2.0 * Az; h[1:1 + nzi] = 0.0
        G[1 + nzi] = (wv - qv); h[1 + nzi] = 1.0 + ci
        # uniform per-cone scaling (a scaled SOC is the same constraint) keeps
        # the IPM well-conditioned when particle-cost constants are large
        scale = max(1.0, abs(ci), float(np.abs(Az).max()))
        soc_blocks.append((G / scale, h / scale))

    Gl = np.concatenate(Gl_rows, axis=0)
    hl = np.concatenate(hl_rows)
    ncones = len(soc_blocks)
    pmax = max(g.shape[0] for g, _ in soc_blocks)
    Gq = np.zeros((ncones, pmax, nv)); hq = np.zeros((ncones, pmax))
    for i, (g, hh) in enumerate(soc_blocks):
        Gq[i, :g.shape[0]] = g; hq[i, :g.shape[0]] = hh

    # pure-LP objective: tiny quadratic regularization keeps the init sane
    P[np.diag_indices(nv)] = 1e-8

    prob = ConeLP(
        P=jnp.asarray(P, dtype=dtype), q=jnp.asarray(c_obj, dtype=dtype),
        Gl=jnp.asarray(Gl, dtype=dtype), hl=jnp.asarray(hl, dtype=dtype),
        Gq=jnp.asarray(Gq, dtype=dtype), hq=jnp.asarray(hq, dtype=dtype),
    )
    iters = int(settings.get("ipm_iters", 50))
    # float32 floor for the epigraph cone program is a ~1e-3 RELATIVE gap
    tol_exp = int(settings.get("ipm_tol_exp", -8 if dtype == np.float64 else -3))
    kappa = float(settings.get("ipm_kappa", 1e-10 if dtype == np.float64 else 1e-6))
    v, s, z, stats = cone_qp_solve(prob, iters=iters, tol_exp=tol_exp, kappa=kappa)

    v = np.asarray(v)
    w = v[:nz]
    U = np.zeros((M, N, udim))
    for i in range(M):
        ui = np.concatenate([w[:nc], w[nc + i * nf: nc + (i + 1) * nf]])
        U[i] = ui.reshape(N, udim)
    X = (Xmap @ w + xoff).reshape(M, N, xdim)
    data = dict(
        solver_state=settings.get("solver_state"),
        ipm_mu=float(stats["mu"]),
        ipm_iters=int(stats["iters"]),
        ipm_converged=bool(stats["converged"]),
        ts=np.concatenate([v[nz:nz + M], v[nz + M:]]),
    )
    return X, U, data
