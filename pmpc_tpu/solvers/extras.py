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

The whole program assembly is DEVICE-NATIVE: states are eliminated through
the condensed ``x = Xmap w + xoff``, the dense cone program over
``v = [w; aux]`` is built with jnp block/broadcast ops inside ONE jitted
function per constraint signature (the static row/cone counts), and solved by
the NT-scaled cone IPM in the same compiled program — nothing is assembled on
the host per SCP iteration (the reference instead re-runs sparse CSC assembly
on the CPU every iteration, ``cone_utils.jl:64-95``).

Exp cones make the program non-symmetric and are solved by a host (scipy)
convex fallback (`_solve_exp_host`) — note the reference's own logbarrier
smoothing never takes this path: pmpc_tpu solves it as a TPU central-path
target (``solvers/ipm.py`` ``mu_target``), proven equivalent in
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coneipm import ConeLP, cone_qp_solve
from .reduced import CondensedQP


def dense_H_q(cqp: CondensedQP) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Densify the arrow-structured Hessian/linear term over z = [uc; uf_1..M]
    (jnp, trace-compatible: broadcast-mask block placement, no host loops)."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    Hcc, Hcf, Hff = cqp.Hcc, cqp.Hcf, cqp.Hff
    eyeM = jnp.eye(M, dtype=Hff.dtype)
    Hff_bd = (eyeM[:, None, :, None] * Hff[:, :, None, :]).reshape(M * nf, M * nf)
    top = jnp.transpose(Hcf, (1, 0, 2)).reshape(nc, M * nf)
    H = jnp.concatenate([
        jnp.concatenate([Hcc, top], axis=1),
        jnp.concatenate([top.T, Hff_bd], axis=1),
    ], axis=0)
    q = jnp.concatenate([cqp.qc, cqp.qf.reshape(-1)])
    return H, q


def x_map(cqp: CondensedQP) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense map from z to the stacked states x_all = Xmap z + xoff (jnp)."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    Ft = cqp.Ft
    eyeM = jnp.eye(M, dtype=Ft.dtype)
    left = Ft[:, :, :nc].reshape(M * NX, nc)
    right = (eyeM[:, None, :, None] * Ft[:, :, None, nc:]).reshape(M * NX, M * nf)
    return jnp.concatenate([left, right], axis=1), cqp.g.reshape(-1)


def _full_layout_sizes(M, nc, nf, NX):
    """(nu_total, n_full) of the canonical full layout [u_cons; u_free; x]."""
    nu_total = nc + M * nf
    return nu_total, nu_total + M * NX


def terminal_cross_cost(cqp: CondensedQP, N: int, xdim: int, Hf, hf=None):
    """Dense (H, q) updates from a cross-particle terminal cost
    0.5 xN' Hf xN + hf' xN over the stacked final states xN (M*xdim,)
    — parity with the Hf/hf settings of ``lqp_utils.jl:105-163,192-204``."""
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    nz = nc + M * nf
    dtype = cqp.qf.dtype
    Xmap, xoff = x_map(cqp)
    # rows selecting each particle's final state, without a host selector
    S = Xmap.reshape(M, N, xdim, nz)[:, N - 1].reshape(M * xdim, nz)
    s0 = xoff.reshape(M, N, xdim)[:, N - 1].reshape(M * xdim)
    Hf = jnp.asarray(Hf, dtype=dtype)
    hf = jnp.zeros(M * xdim, dtype) if hf is None \
        else jnp.asarray(hf, dtype=dtype).reshape(-1)
    H_extra = S.T @ Hf @ S
    q_extra = S.T @ (Hf @ s0 + hf)
    return H_extra, q_extra


def _canon_extras(extra_cstrs, n_full) -> Tuple[Tuple, Tuple]:
    """Canonicalize user tuples once on the host: numpy shapes cleaned up,
    split into a STATIC signature (cache key of the jitted assembly) and the
    dynamic arrays."""
    sig, arrays = [], []
    for ec in (extra_cstrs or []):
        l, qsizes, e, G_left, G_right, h, c_left, c_right = tuple(ec)
        G_left = np.asarray(G_left, dtype=float)
        if G_left.ndim == 1:
            G_left = G_left[None, :]
        assert G_left.shape[1] == n_full, (
            f"extra constraint G_left has {G_left.shape[1]} cols, expected "
            f"{n_full} (consensus layout [u_cons; u_free_1..M; x_1..M])")
        h = np.asarray(h, dtype=float).reshape(-1)
        G_right = np.asarray(G_right, dtype=float)
        if G_right.ndim != 2:
            G_right = G_right[:, None] if G_right.size else \
                G_right.reshape(len(h), 0)
        c_left = np.asarray(c_left, dtype=float).reshape(-1)
        c_right = np.asarray(c_right, dtype=float).reshape(-1)
        qsizes = tuple(int(s) for s in np.asarray(qsizes).reshape(-1))
        n_rows = int(l) + sum(qsizes) + 3 * int(e)
        # under-declared rows would be silently truncated by the slicing
        # below (and over-declared ones silently ignored) — the solver would
        # "converge" on the wrong constraint geometry
        if G_left.shape[0] != n_rows or h.shape[0] != n_rows \
                or G_right.shape[0] != n_rows:
            raise ValueError(
                f"extra constraint declares l={int(l)}, q={qsizes}, "
                f"e={int(e)} -> {n_rows} rows, but G_left has "
                f"{G_left.shape[0]}, G_right {G_right.shape[0]}, "
                f"h {h.shape[0]}")
        if c_right.size != G_right.shape[1]:
            raise ValueError(
                f"extra constraint c_right has {c_right.size} entries for "
                f"{G_right.shape[1]} auxiliary variables")
        sig.append((int(l), qsizes, int(e), int(G_right.shape[1])))
        arrays.append((G_left, G_right, h, c_left, c_right))
    return tuple(sig), tuple(arrays)


def _build_program(cqp: CondensedQP, dims, sig, ubounds, xbounds, ecs,
                   H_extra, q_extra):
    """Trace-time builder of the dense cone program over v = [z; aux].

    Returns (P, q_ext, Gl, hl, soc_blocks, exp_blocks, Xmap, xoff); all jnp,
    all shapes static functions of (dims, sig, operand shapes)."""
    N, udim, xdim = dims
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    nz = nc + M * nf
    nu_total, n_full = _full_layout_sizes(M, nc, nf, NX)
    dtype = cqp.qf.dtype

    H, q = dense_H_q(cqp)
    if H_extra is not None:
        H = H + H_extra
    if q_extra is not None:
        q = q + q_extra
    Xmap, xoff = x_map(cqp)

    n_aux_total = sum(int(G_right.shape[1]) for (_, G_right, _, _, _) in ecs)
    nv = nz + n_aux_total
    q_ext = jnp.concatenate([q, jnp.zeros((n_aux_total,), dtype)])
    P = jnp.zeros((nv, nv), dtype).at[:nz, :nz].set(H)

    Gl_rows: List[jnp.ndarray] = []
    hl_rows: List[jnp.ndarray] = []
    eye_v = jnp.eye(nv, dtype=dtype)

    u_l, u_u = ubounds
    if u_l is not None and u_u is not None:
        ul = jnp.asarray(u_l, dtype).reshape(M, N * udim)
        uu = jnp.asarray(u_u, dtype).reshape(M, N * udim)
        # consensus controls take particle 0's bounds (lqp_utils.jl:323-331)
        if nc:
            sel_c = eye_v[:nc]
            Gl_rows += [sel_c, -sel_c]
            hl_rows += [uu[0, :nc], -ul[0, :nc]]
        if nf:
            sel_f = eye_v[nc:nz]  # (M*nf, nv) particle-major
            Gl_rows += [sel_f, -sel_f]
            hl_rows += [uu[:, nc:].reshape(-1), -ul[:, nc:].reshape(-1)]
    x_l, x_u = xbounds
    if x_l is not None and x_u is not None:
        xl = jnp.asarray(x_l, dtype).reshape(M * NX)
        xu = jnp.asarray(x_u, dtype).reshape(M * NX)
        Gx = jnp.zeros((M * NX, nv), dtype).at[:, :nz].set(Xmap)
        Gl_rows += [Gx, -Gx]
        hl_rows += [xu - xoff, -(xl - xoff)]

    soc_blocks: List[Tuple[Tuple[int, ...], jnp.ndarray, jnp.ndarray]] = []
    exp_blocks: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    aux_off = nz
    for (l, qsizes, e, _), (G_left, G_right, h, c_left, c_right) in zip(sig, ecs):
        G_left = jnp.asarray(G_left, dtype)
        G_right = jnp.asarray(G_right, dtype)
        h = jnp.asarray(h, dtype)
        n_aux = G_right.shape[1]
        # lift rows over z_full = [u; x] onto v (states eliminated)
        Gu = G_left[:, :nu_total]
        Gx_part = G_left[:, nu_total:]
        Gv = Gu + Gx_part @ Xmap
        h_adj = h - Gx_part @ xoff
        G_full = jnp.zeros((Gv.shape[0], nv), dtype).at[:, :nz].set(Gv)
        if n_aux:
            G_full = G_full.at[:, aux_off:aux_off + n_aux].set(G_right)

        if c_left.size:
            assert c_left.size in (n_full, nz), c_left.size
            cl = jnp.asarray(c_left, dtype)
            if c_left.size == n_full:
                q_ext = q_ext.at[:nz].add(cl[:nu_total] + Xmap.T @ cl[nu_total:])
            else:
                q_ext = q_ext.at[:nz].add(cl)
        if n_aux and c_right.size:
            q_ext = q_ext.at[aux_off:aux_off + n_aux].add(
                jnp.asarray(c_right, dtype))

        if l:
            Gl_rows.append(G_full[:l])
            hl_rows.append(h_adj[:l])
        nq = sum(qsizes)
        if nq:
            # one contiguous slice per CONSTRAINT; the per-cone split happens
            # later as a single static gather (not one slice per cone — at
            # hundreds of cones the unrolled slicing dominated the program)
            soc_blocks.append((qsizes, G_full[l:l + nq], h_adj[l:l + nq]))
        r = l + nq
        # exp cones: e TRIPLES of rows after the lin/SOC sections, ECOS
        # convention (cone_utils.jl:99-170, make_logbarrier_constraint):
        # s = h - Gv with exp(s_x / s_z) <= s_y / s_z, s_z > 0
        for _ in range(e):
            exp_blocks.append((G_full[r:r + 3], h_adj[r:r + 3]))
            r += 3
        aux_off += n_aux

    Gl = jnp.concatenate(Gl_rows, axis=0) if Gl_rows \
        else jnp.zeros((0, nv), dtype)
    hl = jnp.concatenate(hl_rows) if hl_rows else jnp.zeros((0,), dtype)
    return P, q_ext, Gl, hl, soc_blocks, exp_blocks, Xmap, xoff


def _pad_socs(soc_blocks, nv, dtype):
    """Stack SOC cones into padded (ncones, pmax, nv) arrays with ONE static
    gather. ``soc_blocks`` is [(qsizes, G_rows, h_rows), ...] per constraint;
    all cone sizes are static, so the padded row-index table is plain numpy
    (padding indexes a sentinel zero row)."""
    sizes = [int(s) for (qsizes, _, _) in soc_blocks for s in qsizes]
    ncones = len(sizes)
    if not ncones:
        return jnp.zeros((0, 1, nv), dtype), jnp.zeros((0, 1), dtype)
    pmax = max(sizes)
    G_all = jnp.concatenate([g for (_, g, _) in soc_blocks], axis=0)
    h_all = jnp.concatenate([h for (_, _, h) in soc_blocks])
    n_rows = int(G_all.shape[0])
    idx = np.full((ncones, pmax), n_rows, dtype=np.int32)  # sentinel = pad
    r = 0
    for i, sz in enumerate(sizes):
        idx[i, :sz] = np.arange(r, r + sz)
        r += sz
    Gq = jnp.concatenate([G_all, jnp.zeros((1, nv), dtype)], axis=0)[idx]
    hq = jnp.concatenate([h_all, jnp.zeros((1,), dtype)])[idx]
    return Gq, hq


def _recover_XU(w, Xmap, xoff, M, nc, nf, N, udim, xdim):
    """Stitch (M, N, udim) controls + roll states through the condensed map."""
    U = jnp.concatenate([
        jnp.broadcast_to(w[:nc], (M, nc)),
        w[nc:nc + M * nf].reshape(M, nf)], axis=1).reshape(M, N, udim)
    X = (Xmap @ w + xoff).reshape(M, N, xdim)
    return X, U


@partial(jax.jit, static_argnames=("dims", "sig", "iters", "tol_exp", "kappa"))
def _solve_extras_device(cqp, dims, sig, ubounds, xbounds, ecs,
                         H_extra, q_extra, iters: int, tol_exp: int,
                         kappa: float, tol_dynamic=None, warm=None):
    """One compiled program per constraint signature: assemble the dense cone
    QP and solve it with the NT-scaled cone IPM, all on device."""
    N, udim, xdim = dims
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    dtype = cqp.qf.dtype
    P, q_ext, Gl, hl, soc_blocks, exp_blocks, Xmap, xoff = _build_program(
        cqp, dims, sig, ubounds, xbounds, ecs, H_extra, q_extra)
    assert not exp_blocks  # exp cones take the host fallback
    nv = q_ext.shape[0]
    Gq, hq = _pad_socs(soc_blocks, nv, dtype)
    prob = ConeLP(P=P, q=q_ext, Gl=Gl, hl=hl, Gq=Gq, hq=hq)
    v, s, z, stats = cone_qp_solve(prob, iters=iters, tol_exp=tol_exp,
                                   kappa=kappa, tol_dynamic=tol_dynamic,
                                   warm=warm)
    nz = nc + M * nf
    X, U = _recover_XU(v[:nz], Xmap, xoff, M, nc, nf, N, udim, xdim)
    return X, U, v[nz:], stats, (v, z)


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
        cons.append(sopt.LinearConstraint(np.asarray(Gl, float), -np.inf,
                                          np.asarray(hl, float)))
    for qsizes, Gc, hc in soc_blocks:
        Gc, hc = np.asarray(Gc, float), np.asarray(hc, float)
        r = 0
        for sz in qsizes:
            G, h = Gc[r:r + sz], hc[r:r + sz]
            r += sz

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
    # status 1 (gtol) / 2 (xtol) are converged; 0 (maxiter) / 3 are not
    return res.x, res.status in (1, 2) and np.isfinite(res.x).all()


def cone_solve_with_extras(
    cqp: CondensedQP,
    N: int,
    udim: int,
    xdim: int,
    u_l, u_u, x_l, x_u,
    extra_cstrs: Sequence[Tuple],
    settings: Optional[Dict[str, Any]] = None,
    H_extra: Optional[jnp.ndarray] = None,
    q_extra: Optional[jnp.ndarray] = None,
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
    _, n_full = _full_layout_sizes(M, nc, nf, NX)
    dtype = np.dtype(np.asarray(cqp.qf).dtype)

    sig, ecs = _canon_extras(extra_cstrs, n_full)
    dims = (N, udim, xdim)
    ubounds = (None if u_l is None else jnp.asarray(u_l, dtype),
               None if u_u is None else jnp.asarray(u_u, dtype))
    xbounds = (None if x_l is None else jnp.asarray(x_l, dtype),
               None if x_u is None else jnp.asarray(x_u, dtype))
    ecs_j = tuple(tuple(jnp.asarray(a, dtype) for a in ec) for ec in ecs)

    has_exp = any(e for (_, _, e, _) in sig)
    if has_exp:
        # exponential cones make the program non-symmetric (the NT-scaled
        # IPM is for symmetric cones): solved by the device central-path
        # barrier method (solvers/expbarrier.py, f64) — same accuracy class
        # as the reference's ECOS-on-CPU for these programs. A scipy host
        # solve remains as the fallback (settings["exp_device"]=False, or
        # a non-converged device run). pmpc_tpu's own logbarrier smoothing
        # never reaches here (it is the TPU central-path solve, see
        # solvers/ipm.py mu_target).
        P, q_ext, Gl, hl, soc_blocks, exp_blocks, Xmap, xoff = _build_program(
            cqp, dims, sig, ubounds, xbounds, ecs_j, H_extra, q_extra)
        v = None
        if bool(settings.get("exp_device", True)):
            from .expbarrier import exp_barrier_solve

            nv = q_ext.shape[0]
            Gq, hq = _pad_socs(soc_blocks, nv, dtype)
            Ge = jnp.stack([g for g, _ in exp_blocks]) if exp_blocks \
                else jnp.zeros((0, 3, nv), dtype)
            he = jnp.stack([h for _, h in exp_blocks]) if exp_blocks \
                else jnp.zeros((0, 3), dtype)
            tol_exp = int(settings.get(
                "ipm_tol_exp", -8 if dtype == np.float64 else -5))
            v_dev, stats = exp_barrier_solve(P, q_ext, Gl, hl, Gq, hq, Ge, he,
                                             tol_exp=tol_exp)
            if bool(stats["converged"]) and np.isfinite(np.asarray(v_dev)).all():
                v = np.asarray(v_dev)
                data_extra = dict(exp_device=True,
                                  ipm_mu=float(stats["mu"]))
        if v is None:
            v, host_ok = _solve_exp_host(P, q_ext, Gl, hl, soc_blocks,
                                         exp_blocks)
            # both the device barrier and the host solve failed: garbage,
            # not an approximation — the SCP loop rejects the subproblem
            data_extra = dict(exp_host_fallback=True,
                              ipm_failed=not bool(host_ok))
        w = jnp.asarray(v[:nz], dtype)
        X, U = _recover_XU(w, Xmap, xoff, M, nc, nf, N, udim, xdim)
        data = dict(solver_state=settings.get("solver_state"),
                    ipm_converged=not data_extra.get("ipm_failed", False),
                    aux=v[nz:], **data_extra)
        return np.asarray(X), np.asarray(U), data

    # shared host-cone prelude: generous early-exit iteration cap,
    # inexact-Newton forcing from the SCP residual, and the warm (v, zl, zq)
    # start from the previous SCP iteration (reference parity:
    # osqp_solver.jl reuses its solver object), keyed on the exact problem
    # signature so stale warm tuples are dropped, never trial-traced
    from .coneipm import cone_host_setup, cone_host_state, cone_host_stats

    sig_key = ("extras", dims, sig, M, nc, nf,
               ubounds[0] is not None, xbounds[0] is not None,
               H_extra is not None)
    iters, tol_exp, kappa, tol_eff, tol_dyn, warm = cone_host_setup(
        settings, dtype, sig_key, "cone_warm", iters32=35, tolexp32=-5,
        kappa32=1e-7)
    X, U, aux, stats, (v_out, z_out) = _solve_extras_device(
        cqp, dims, sig, ubounds, xbounds, ecs_j, H_extra, q_extra,
        iters=iters, tol_exp=tol_exp, kappa=kappa,
        tol_dynamic=None if tol_dyn is None else jnp.asarray(tol_dyn, dtype),
        warm=warm)
    data = dict(
        solver_state=cone_host_state(sig_key, "cone_warm", v_out, z_out),
        aux=np.asarray(aux),
        **cone_host_stats(stats, tol_eff),
    )
    return np.asarray(X), np.asarray(U), data
