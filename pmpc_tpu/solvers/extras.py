"""User extra cone constraints on the condensed consensus problem.

Implements the reference's ``extra_cstrs`` interface (``README.md:219-229``,
``PMPC.jl/src/cone_utils.jl:99-170`` ``augment_cone_problem!``): each
constraint is a tuple

    (l, q, e, G_left, G_right, h, c_left, c_right)

with ``G_left`` over the canonical consensus variable
``z_full = [u_cons; u_free_1..M; x_1..M]`` (layout ``lqp_utils.jl:2-216``),
``G_right`` over fresh auxiliary variables appended to the decision vector,
``l`` leading nonneg rows, ``q`` a list of SOC sizes, ``e`` a COUNT of 3-dim
exponential cones (triples of rows after the lin/SOC sections).

States are eliminated: rows over the x-part map through the condensed
``x = Xmap w + xoff``, so the whole problem becomes a dense cone QP over
``v = [w; aux]`` handled by `cone_qp_solve` (nonneg + SOC, on device). Exp
cones make the program non-symmetric and are solved by a host (scipy) convex
fallback (`_solve_exp_host`) — note the reference's own logbarrier smoothing
never takes this path: pmpc_tpu solves it as a TPU central-path target
(``solvers/ipm.py`` ``mu_target``), proven equivalent in
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .coneipm import ConeLP, cone_qp_solve
from .reduced import CondensedQP


def dense_H_q(cqp: CondensedQP) -> Tuple[np.ndarray, np.ndarray]:
    """Densify the arrow-structured Hessian/linear term over z = [uc; uf_1..M]."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    nz = nc + M * nf
    H = np.zeros((nz, nz))
    Hcc, Hcf, Hff = np.asarray(cqp.Hcc), np.asarray(cqp.Hcf), np.asarray(cqp.Hff)
    H[:nc, :nc] = Hcc
    for i in range(M):
        s = nc + i * nf
        H[:nc, s:s + nf] = Hcf[i]
        H[s:s + nf, :nc] = Hcf[i].T
        H[s:s + nf, s:s + nf] = Hff[i]
    q = np.concatenate([np.asarray(cqp.qc)] + [np.asarray(cqp.qf[i]) for i in range(M)])
    return H, q


def x_map(cqp: CondensedQP) -> Tuple[np.ndarray, np.ndarray]:
    """Dense map from z to the stacked states: x_all = Xmap z + xoff."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    nz = nc + M * nf
    Ft = np.asarray(cqp.Ft)
    Xmap = np.zeros((M * NX, nz))
    for i in range(M):
        Xmap[i * NX:(i + 1) * NX, :nc] = Ft[i, :, :nc]
        s = nc + i * nf
        Xmap[i * NX:(i + 1) * NX, s:s + nf] = Ft[i, :, nc:]
    xoff = np.asarray(cqp.g).reshape(-1)
    return Xmap, xoff


def _full_layout_sizes(M, nc, nf, NX):
    """(nu_total, n_full) of the canonical full layout [u_cons; u_free; x]."""
    nu_total = nc + M * nf
    return nu_total, nu_total + M * NX


def terminal_cross_cost(cqp: CondensedQP, N: int, xdim: int, Hf, hf=None):
    """Dense (H, q) updates from a cross-particle terminal cost
    0.5 xN' Hf xN + hf' xN over the stacked final states xN (M*xdim,)
    — parity with the Hf/hf settings of ``lqp_utils.jl:105-163,192-204``."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    nz = nc + M * nf
    Xmap, xoff = x_map(cqp)
    # rows selecting each particle's final state
    sel = np.zeros((M * xdim, M * NX))
    for i in range(M):
        sel[i * xdim:(i + 1) * xdim, i * NX + (N - 1) * xdim: i * NX + N * xdim] = np.eye(xdim)
    S = sel @ Xmap  # (M*xdim, nz)
    s0 = sel @ xoff
    Hf = np.asarray(Hf, dtype=float)
    hf = np.zeros(M * xdim) if hf is None else np.asarray(hf, dtype=float).reshape(-1)
    H_extra = S.T @ Hf @ S
    q_extra = S.T @ (Hf @ s0 + hf)
    return H_extra, q_extra


def _solve_exp_host(H, q, Gl, hl, soc_blocks, exp_blocks):
    """Host (scipy trust-constr) solve of the dense cone QP with exp cones.

    Exp cone (ECOS convention, ``cone_utils.jl:184-188``): the slack triple
    s = h - Gv lies in closure{(x, y, z): exp(x/z) <= y/z, z > 0}, i.e.
    z log(y/z) >= x with y, z > 0 — a concave constraint function, so the
    program stays convex."""
    import scipy.optimize as sopt

    nv = q.shape[0]
    H, q = np.asarray(H, float), np.asarray(q, float)
    cons = []
    if Gl.shape[0]:
        cons.append(sopt.LinearConstraint(Gl, -np.inf, hl))
    for G, h in soc_blocks:
        G, h = np.asarray(G, float), np.asarray(h, float)

        def soc_fun(v, G=G, h=h):
            s = h - G @ v
            return s[0] - np.linalg.norm(s[1:])

        cons.append(sopt.NonlinearConstraint(soc_fun, 0.0, np.inf))
    eps = 1e-12
    for G, h in exp_blocks:
        G, h = np.asarray(G, float), np.asarray(h, float)
        # domain: y, z > 0 (linear rows), cone: z log(y/z) - x >= 0
        cons.append(sopt.LinearConstraint(-G[1:], eps - h[1:], np.inf))

        def exp_fun(v, G=G, h=h):
            s = h - G @ v
            y, z = max(s[1], eps), max(s[2], eps)
            return z * np.log(y / z) - s[0]

        cons.append(sopt.NonlinearConstraint(exp_fun, 0.0, np.inf))
    res = sopt.minimize(
        lambda v: 0.5 * v @ H @ v + q @ v, np.zeros(nv),
        jac=lambda v: H @ v + q,
        constraints=cons, method="trust-constr",
        options=dict(maxiter=5000, gtol=1e-10, xtol=1e-12))
    return res.x


def cone_solve_with_extras(
    cqp: CondensedQP,
    N: int,
    udim: int,
    xdim: int,
    u_l, u_u, x_l, x_u,
    extra_cstrs: Sequence[Tuple],
    settings: Optional[Dict[str, Any]] = None,
    H_extra: Optional[np.ndarray] = None,
    q_extra: Optional[np.ndarray] = None,
):
    """Solve the condensed problem with box + arbitrary extra cone constraints.

    Box bounds are folded into the nonneg rows of the same dense cone program
    (the arrow-structure shortcut no longer applies once extras couple
    variables). Returns (X (M,N,xdim), U (M,N,udim), data).
    """
    settings = settings or {}
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    nz = nc + M * nf
    nu_total, n_full = _full_layout_sizes(M, nc, nf, NX)
    dtype = np.asarray(cqp.qf).dtype

    H, q = dense_H_q(cqp)
    if H_extra is not None:
        H = H + H_extra
    if q_extra is not None:
        q = q + q_extra
    Xmap, xoff = x_map(cqp)

    Gl_rows: List[np.ndarray] = []
    hl_rows: List[np.ndarray] = []

    def add_rows(G, h):
        Gl_rows.append(G)
        hl_rows.append(np.atleast_1d(h))

    eye_z = np.eye(nz)
    if u_l is not None and u_u is not None:
        ul = np.asarray(u_l).reshape(M, N * udim)
        uu = np.asarray(u_u).reshape(M, N * udim)
        # consensus controls take particle 0's bounds (lqp_utils.jl:323-331)
        sel_c = eye_z[:nc]
        if nc:
            add_rows(sel_c, uu[0, :nc])
            add_rows(-sel_c, -ul[0, :nc])
        for i in range(M):
            sel_f = eye_z[nc + i * nf: nc + (i + 1) * nf]
            if nf:
                add_rows(sel_f, uu[i, nc:])
                add_rows(-sel_f, -ul[i, nc:])
    if x_l is not None and x_u is not None:
        xl = np.asarray(x_l).reshape(M * NX)
        xu = np.asarray(x_u).reshape(M * NX)
        add_rows(Xmap, xu - xoff)
        add_rows(-Xmap, -(xl - xoff))

    soc_blocks: List[Tuple[np.ndarray, np.ndarray]] = []
    exp_blocks: List[Tuple[np.ndarray, np.ndarray]] = []
    n_aux_total = 0

    # first pass: count aux variables
    extras = [tuple(e) for e in (extra_cstrs or [])]
    for ec in extras:
        l, qsizes, e, G_left, G_right, h, c_left, c_right = ec
        gr = np.asarray(G_right)
        n_aux_total += gr.shape[1] if gr.ndim == 2 else (1 if gr.size else 0)

    nv = nz + n_aux_total
    aux_off = nz
    q_ext = np.concatenate([q, np.zeros(n_aux_total)])
    H_ext = np.zeros((nv, nv))
    H_ext[:nz, :nz] = H

    def lift_left(G_left):
        """Map rows over z_full=[u;x] to rows over v (z part only)."""
        G_left = np.asarray(G_left, dtype=float)
        if G_left.ndim == 1:
            G_left = G_left[None, :]
        assert G_left.shape[1] == n_full, (
            f"extra constraint G_left has {G_left.shape[1]} cols, expected "
            f"{n_full} (= {nu_total} controls + {M * NX} states in the "
            "consensus layout)"
        )
        Gu = G_left[:, :nu_total]
        Gx = G_left[:, nu_total:]
        Gv = Gu + Gx @ Xmap
        h_shift = Gx @ xoff
        return Gv, h_shift

    # second pass: build rows
    for ec in extras:
        l, qsizes, e, G_left, G_right, h, c_left, c_right = ec
        G_left = np.asarray(G_left, dtype=float)
        G_right = np.asarray(G_right, dtype=float)
        h = np.asarray(h, dtype=float).reshape(-1)
        c_left = np.asarray(c_left, dtype=float).reshape(-1)
        c_right = np.asarray(c_right, dtype=float).reshape(-1)
        if G_right.ndim == 1:
            G_right = G_right[:, None] if G_right.size else G_right.reshape(len(h), 0)
        n_aux = G_right.shape[1]

        Gv, h_shift = lift_left(G_left)
        G_full = np.zeros((Gv.shape[0], nv))
        G_full[:, :nz] = Gv
        if n_aux:
            G_full[:, aux_off:aux_off + n_aux] = G_right
        h_adj = h - h_shift

        # cost contributions
        if c_left.size:
            assert c_left.size in (n_full, nz), c_left.size
            if c_left.size == n_full:
                q_ext[:nz] += c_left[:nu_total] + Xmap.T @ c_left[nu_total:]
            else:
                q_ext[:nz] += c_left
        if n_aux and c_right.size:
            q_ext[aux_off:aux_off + n_aux] += c_right

        qsizes = [int(s) for s in np.asarray(qsizes).reshape(-1)]
        l = int(l)
        if l:
            Gl_rows.append(G_full[:l])
            hl_rows.append(h_adj[:l])
        r = l
        for sz in qsizes:
            soc_blocks.append((G_full[r:r + sz], h_adj[r:r + sz]))
            r += sz
        # exp cones: e TRIPLES of rows after the lin/SOC sections, ECOS
        # convention (cone_utils.jl:99-170, make_logbarrier_constraint):
        # s = h - Gv with exp(s_x / s_z) <= s_y / s_z, s_z > 0
        for _ in range(int(e)):
            exp_blocks.append((G_full[r:r + 3], h_adj[r:r + 3]))
            r += 3
        aux_off += n_aux

    # pad earlier box rows (over z) to nv columns
    Gl_list = []
    for G in Gl_rows:
        if G.shape[1] == nz:
            Gp = np.zeros((G.shape[0], nv))
            Gp[:, :nz] = G
            Gl_list.append(Gp)
        else:
            Gl_list.append(G)
    Gl = np.concatenate(Gl_list, axis=0) if Gl_list else np.zeros((0, nv))
    hl = np.concatenate(hl_rows) if hl_rows else np.zeros(0)

    if exp_blocks:
        # exponential cones make the program non-symmetric: solved on the
        # host (scipy, convex) — the reference also solves these on CPU
        # (ECOS); pmpc_tpu's own logbarrier smoothing never reaches here
        # (it is the TPU central-path solve, see solvers/ipm.py mu_target)
        Gl_np = np.concatenate(
            [np.pad(G, ((0, 0), (0, nv - G.shape[1]))) for G in Gl_rows], axis=0
        ) if Gl_rows else np.zeros((0, nv))
        hl_np = np.concatenate(hl_rows) if hl_rows else np.zeros(0)
        v = _solve_exp_host(H_ext, q_ext, Gl_np, hl_np, soc_blocks, exp_blocks)
        v = np.asarray(v)
        w = v[:nz]
        U = np.zeros((M, N, udim))
        for i in range(M):
            ui = np.concatenate([w[:nc], w[nc + i * nf: nc + (i + 1) * nf]])
            U[i] = ui.reshape(N, udim)
        X = (Xmap @ w + xoff).reshape(M, N, xdim)
        data = dict(solver_state=settings.get("solver_state"),
                    ipm_converged=True, exp_host_fallback=True, aux=v[nz:])
        return X, U, data

    ncones = len(soc_blocks)
    pmax = max((g.shape[0] for g, _ in soc_blocks), default=1)
    Gq = np.zeros((ncones, pmax, nv))
    hq = np.zeros((ncones, pmax))
    for i, (g, hh) in enumerate(soc_blocks):
        p = g.shape[0]
        Gq[i, :p] = g
        hq[i, :p] = hh

    prob = ConeLP(
        P=jnp.asarray(H_ext, dtype=dtype), q=jnp.asarray(q_ext, dtype=dtype),
        Gl=jnp.asarray(Gl, dtype=dtype), hl=jnp.asarray(hl, dtype=dtype),
        Gq=jnp.asarray(Gq, dtype=dtype), hq=jnp.asarray(hq, dtype=dtype),
    )
    iters = int(settings.get("ipm_iters", 35))
    tol_exp = int(settings.get("ipm_tol_exp", -8 if dtype == np.float64 else -5))
    kappa = float(settings.get("ipm_kappa", 1e-10 if dtype == np.float64 else 1e-7))
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
        aux=v[nz:],
    )
    return X, U, data
