"""Composed cone-program combinations vs independent scipy oracles.

The reference's ``lcone_solve`` composes the k-worst epigraph, box bounds,
constraint smoothing and user extra cones in ONE conic program
(``PMPC.jl/src/main.jl:204-317``); these tests check each combination of
`pmpc_tpu`'s composed path against direct scipy solves of the same
mathematical program built from the independent numpy oracle
(`tests/oracle.py`) — never touching pmpc_tpu solver code.
"""

import numpy as np
import pytest
import scipy.optimize as sopt

from pmpc_tpu.solvers.dispatch import affine_solve_np

import oracle

EPS_ANCHOR = 1e-3


def _mk(seed, M=2, N=5, xdim=3, udim=2, Nc=2):
    rng = np.random.default_rng(seed)
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    reg = dict(reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
               slew_reg=np.zeros(M), slew_reg0=np.zeros(M),
               slew_um1=np.zeros((M, udim)))
    P, q = oracle.build_Pq(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg["reg_x"], reg["reg_u"], reg["slew_reg"], reg["slew_reg0"],
        reg["slew_um1"], Nc)
    A, b = oracle.build_Ab(p["x0"], p["f"], p["fx"], p["fu"],
                           p["X_prev"], p["U_prev"], Nc)
    return p, reg, P, q, A, b


def _eliminate_states(P, q, A, b, n_u):
    """z = [u; x], A z = b with invertible state block -> quadratic over u:
    0.5 u'Pu u + qu'u + const, and the affine map z = T u + t0."""
    Au, Ax = A[:, :n_u], A[:, n_u:]
    S = -np.linalg.solve(Ax, Au)
    s0 = np.linalg.solve(Ax, b)
    n = P.shape[0]
    T = np.vstack([np.eye(n_u), S])
    t0 = np.concatenate([np.zeros(n_u), s0])
    Pu = T.T @ P @ T
    qu = T.T @ (q + P @ t0)
    return Pu, qu, T, t0


def _box_rows_z(u_l, u_u, N, xdim, udim, M, Nc):
    """Box bounds as rows g'z <= h over the full oracle layout."""
    lo, hi = oracle.bounds_vectors(None, None, u_l, u_u, N, xdim, udim, M, Nc)
    n = lo.shape[0]
    G_rows, h_rows = [], []
    eye = np.eye(n)
    for i in range(n):
        if np.isfinite(hi[i]):
            G_rows.append(eye[i])
            h_rows.append(hi[i])
        if np.isfinite(lo[i]):
            G_rows.append(-eye[i])
            h_rows.append(-lo[i])
    return np.array(G_rows), np.array(h_rows)


def _extras_row(n_full, udim, rhs=0.25):
    """One linear extras row: sum of the first consensus control <= rhs."""
    g = np.zeros(n_full)
    g[:udim] = 1.0
    ec = (1, [], 0, g[None, :], np.zeros((1, 0)), np.array([rhs]),
          np.zeros(n_full), np.zeros(0))
    return g, ec


def _solve_ours(p, reg, Nc, settings, u_l=None, u_u=None):
    M = p["f"].shape[0]
    return affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"], **reg,
        u_l=u_l, u_u=u_u, x_l=None, x_u=None, Nc=Nc,
        settings=dict(settings))


def _U_from_u(u, T, t0, N, xdim, udim, M, Nc):
    z = T @ u + t0
    _, U = oracle.split_z(z, N, xdim, udim, M, Nc)
    return U


def test_smooth_logbarrier_with_extras_matches_oracle():
    """logbarrier smoothing must apply to BOTH box rows and the extras'
    linear rows (main.jl:242-316) — previously the extras path silently
    ignored smooth_cstr."""
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p, reg, P, q, A, b = _mk(40, M, N, xdim, udim, Nc)
    n_u = Nc * udim + M * (N - Nc) * udim
    n_full = P.shape[0]
    alpha = 20.0
    u_l = np.full((M, N, udim), -0.8)
    u_u = np.full((M, N, udim), 0.8)
    g_ex, ec = _extras_row(n_full, udim, rhs=0.25)

    X, U, data = _solve_ours(
        p, reg, Nc, dict(extra_cstrs=[ec], smooth_cstr="logbarrier",
                         smooth_alpha=alpha), u_l=u_l, u_u=u_u)
    assert data["ipm_converged"], data
    # routing contract: linear extras + logbarrier ride the STRUCTURED
    # mu-target IPM (the rows sit in the same flat product family as the
    # box rows), not the densified exp-cone program — measured 280x faster
    # at M=8/N=30 (132 ms vs 37 s)
    assert "aux" not in data, "must not densify through the composed path"
    assert abs(float(data["ipm_mu"]) - 1.0 / alpha) < 0.05 / alpha

    # oracle: smooth barrier objective over u (states eliminated), rows =
    # box rows + the extras row, solved with an analytic-gradient BFGS from
    # a strictly feasible start
    Pu, qu, T, t0 = _eliminate_states(P, q, A, b, n_u)
    Gz, hz = _box_rows_z(u_l, u_u, N, xdim, udim, M, Nc)
    Gz = np.vstack([Gz, g_ex])
    hz = np.concatenate([hz, [0.25]])
    Gu = Gz @ T
    hu = hz - Gz @ t0

    def F(u):
        s = hu - Gu @ u
        if np.any(s <= 0):
            return 1e12
        return (0.5 * u @ Pu @ u + qu @ u
                - np.sum(np.log(alpha * s)) / alpha)

    def dF(u):
        s = np.maximum(hu - Gu @ u, 1e-300)
        return Pu @ u + qu + Gu.T @ (1.0 / (alpha * s))

    u0 = np.zeros(n_u)
    assert np.all(hu - Gu @ u0 > 0), "oracle start must be interior"
    res = sopt.minimize(F, u0, jac=dF, method="BFGS",
                        options=dict(maxiter=2000, gtol=1e-12))
    U_o = _U_from_u(res.x, T, t0, N, xdim, udim, M, Nc)
    np.testing.assert_allclose(U, U_o, atol=2e-3)
    # barrier semantics: strictly inside every smoothed row
    z = np.concatenate([np.zeros(n_u), np.zeros(n_full - n_u)])
    u_ours = np.concatenate([U[0, :Nc].reshape(-1), U[:, Nc:].reshape(-1)])
    assert np.all(Gu @ u_ours < hu), "logbarrier solution must be interior"


def test_smooth_squareplus_with_extras_matches_oracle():
    """squareplus smooths the BOX rows while the extras' linear rows stay
    EXACT (the reference smooths extras only in its logbarrier branch,
    main.jl:301-316)."""
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p, reg, P, q, A, b = _mk(41, M, N, xdim, udim, Nc)
    n_u = Nc * udim + M * (N - Nc) * udim
    n_full = P.shape[0]
    alpha, beta = 50.0, 4.0
    u_l = np.full((M, N, udim), -0.4)
    u_u = np.full((M, N, udim), 0.4)
    g_ex, ec = _extras_row(n_full, udim, rhs=0.25)

    X, U, data = _solve_ours(
        p, reg, Nc, dict(extra_cstrs=[ec], smooth_cstr="squareplus",
                         smooth_alpha=alpha, smooth_beta=beta),
        u_l=u_l, u_u=u_u)
    assert data["ipm_converged"], data

    Pu, qu, T, t0 = _eliminate_states(P, q, A, b, n_u)
    Gz, hz = _box_rows_z(u_l, u_u, N, xdim, udim, M, Nc)
    Gu, hu = Gz @ T, hz - Gz @ t0
    ge_u, he_u = g_ex @ T, 0.25 - g_ex @ t0

    def phi(y):  # (beta/2)(y + sqrt(y^2 + 1/alpha^2))
        return 0.5 * beta * (y + np.sqrt(y * y + 1.0 / alpha**2))

    def F(u):
        return 0.5 * u @ Pu @ u + qu @ u + np.sum(phi(Gu @ u - hu))

    def dF(u):
        y = Gu @ u - hu
        w = 0.5 * beta * (1.0 + y / np.sqrt(y * y + 1.0 / alpha**2))
        return Pu @ u + qu + Gu.T @ w

    res = sopt.minimize(
        F, np.zeros(n_u), jac=dF, method="trust-constr",
        constraints=[sopt.LinearConstraint(ge_u[None, :], -np.inf, he_u)],
        options=dict(gtol=1e-12, xtol=1e-14, maxiter=3000))
    U_o = _U_from_u(res.x, T, t0, N, xdim, udim, M, Nc)
    np.testing.assert_allclose(U, U_o, atol=2e-3)
    # extras row enforced exactly (not smoothed under squareplus)
    u_ours = np.concatenate([U[0, :Nc].reshape(-1), U[:, Nc:].reshape(-1)])
    assert ge_u @ u_ours <= he_u + 1e-6


def _epigraph_oracle(p, reg, k, N, xdim, udim, M, lin_cons=(), soc_stage_r=None,
                     u_box=None, barrier_rows=None, alpha=None):
    """Independent scipy solve of the k-worst epigraph program over
    (u, y, t) with full consensus (Nc=N): minimize
    (1+eps) sum y + (1-eps) k t (+ logbarrier terms) s.t. J_i(u) <= y_i + t,
    y >= 0, plus linear rows / per-stage SOC cones / u-box."""
    n_u = N * udim

    def J_i(i, u):
        U_ = u.reshape(N, udim)
        X = np.zeros((N, xdim))
        xlin = np.concatenate([p["x0"][i][None], p["X_prev"][i][:-1]], axis=0)
        xc = p["x0"][i]
        for j in range(N):
            xc = (p["f"][i, j] + p["fx"][i, j] @ (xc - xlin[j])
                  + p["fu"][i, j] @ (U_[j] - p["U_prev"][i, j]))
            X[j] = xc
        dX, dU = X - p["X_ref"][i], U_ - p["U_ref"][i]
        J = 0.5 * np.einsum("ni,nij,nj->", dX, p["Q"][i], dX)
        J += 0.5 * np.einsum("ni,nij,nj->", dU, p["R"][i], dU)
        J += 0.5 * reg["reg_x"][i] * np.sum((X - p["X_prev"][i]) ** 2)
        J += 0.5 * reg["reg_u"][i] * np.sum((U_ - p["U_prev"][i]) ** 2)
        return J

    nv = n_u + M + 1

    def obj(v):
        u, y, t = v[:n_u], v[n_u:n_u + M], v[n_u + M]
        val = (1 + EPS_ANCHOR) * y.sum() + (1 - EPS_ANCHOR) * k * t
        if barrier_rows is not None:
            G, h = barrier_rows
            s = h - G @ u
            if np.any(s <= 0):
                return 1e12
            val -= np.sum(np.log(alpha * s)) / alpha
        return val

    cons = []
    for i in range(M):
        cons.append(sopt.NonlinearConstraint(
            lambda v, i=i: v[n_u + i] + v[n_u + M] - J_i(i, v[:n_u]),
            0.0, np.inf))
    lb = np.full(nv, -np.inf)
    lb[n_u:n_u + M] = 0.0
    ub = np.full(nv, np.inf)
    if u_box is not None:
        lo, hi = u_box
        lb[:n_u], ub[:n_u] = lo.reshape(-1), hi.reshape(-1)
    for G, h in lin_cons:
        Gv = np.zeros((G.shape[0], nv))
        Gv[:, :n_u] = G
        cons.append(sopt.LinearConstraint(Gv, -np.inf, h))
    if soc_stage_r is not None:
        for j in range(N):
            cons.append(sopt.NonlinearConstraint(
                lambda v, j=j: soc_stage_r[j]
                - np.linalg.norm(v[j * udim:(j + 1) * udim]),
                0.0, np.inf))
    v0 = np.zeros(nv)
    v0[:n_u] = np.clip(p["U_prev"][0].reshape(-1), lb[:n_u], ub[:n_u]) * 0.0
    Js0 = np.array([J_i(i, v0[:n_u]) for i in range(M)])
    v0[n_u + M] = np.sort(Js0)[-min(k, M)]
    v0[n_u:n_u + M] = np.maximum(Js0 - v0[n_u + M], 0.0) + 1e-3
    res = sopt.minimize(obj, v0, method="trust-constr",
                        bounds=sopt.Bounds(lb, ub), constraints=cons,
                        options=dict(gtol=1e-12, xtol=1e-14, maxiter=5000))
    return res.x[:n_u].reshape(N, udim)


def test_cvar_with_extras_matches_oracle():
    """k (CVaR) + extra_cstrs in one epigraph cone program (main.jl:292-316)."""
    M, N, xdim, udim = 3, 5, 3, 2
    p, reg, *_ = _mk(42, M, N, xdim, udim, Nc=N)
    n_full = N * udim + M * N * xdim  # full consensus layout
    g_ex, ec = _extras_row(n_full, udim, rhs=0.1)
    u_l = np.full((M, N, udim), -0.8)
    u_u = np.full((M, N, udim), 0.8)
    X, U, data = _solve_ours(p, reg, N, dict(k=1, extra_cstrs=[ec]),
                             u_l=u_l, u_u=u_u)
    assert data["ipm_converged"], data
    assert np.ptp(U, axis=0).max() < 1e-8  # full consensus
    # the extras row acts on the u-part only here
    g_u = g_ex[:N * udim]
    assert g_u @ U[0].reshape(-1) <= 0.1 + 1e-6
    U_o = _epigraph_oracle(p, reg, 1, N, xdim, udim, M,
                           lin_cons=[(g_u[None, :], np.array([0.1]))],
                           u_box=(u_l[0], u_u[0]))
    np.testing.assert_allclose(U[0], U_o, atol=3e-3)


def test_cvar_with_usoc_matches_oracle():
    """k (CVaR) + per-stage control-norm cones (thrust cones as SOCs)."""
    M, N, xdim, udim = 3, 5, 3, 2
    p, reg, *_ = _mk(43, M, N, xdim, udim, Nc=N)
    r = np.full((M, N), 0.6)
    X, U, data = _solve_ours(p, reg, N, dict(k=1, u_soc_r=r))
    assert data["ipm_converged"], data
    norms = np.linalg.norm(U, axis=-1)
    assert norms.max() <= 0.6 + 1e-6, norms.max()
    U_o = _epigraph_oracle(p, reg, 1, N, xdim, udim, M, soc_stage_r=r[0])
    np.testing.assert_allclose(U[0], U_o, atol=3e-3)


def test_cvar_with_logbarrier_smoothing_matches_oracle():
    """k (CVaR) + logbarrier-smoothed box rows: exp cones spliced into the
    same epigraph program (main.jl:242-290)."""
    M, N, xdim, udim = 2, 4, 3, 2
    p, reg, *_ = _mk(44, M, N, xdim, udim, Nc=N)
    alpha = 10.0
    u_l = np.full((M, N, udim), -0.7)
    u_u = np.full((M, N, udim), 0.7)
    X, U, data = _solve_ours(
        p, reg, N, dict(k=1, smooth_cstr="logbarrier", smooth_alpha=alpha),
        u_l=u_l, u_u=u_u)
    assert data["ipm_converged"], data
    assert np.abs(U).max() < 0.7  # strictly interior
    n_u = N * udim
    G = np.vstack([np.eye(n_u), -np.eye(n_u)])
    h = np.concatenate([u_u[0].reshape(-1), -u_l[0].reshape(-1)])
    U_o = _epigraph_oracle(p, reg, 1, N, xdim, udim, M,
                           barrier_rows=(G, h), alpha=alpha)
    np.testing.assert_allclose(U[0], U_o, atol=3e-3)


def test_usoc_with_extras_matches_oracle():
    """u_soc_r + extra_cstrs in one cone program (previously refused)."""
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p, reg, P, q, A, b = _mk(45, M, N, xdim, udim, Nc)
    n_u = Nc * udim + M * (N - Nc) * udim
    n_full = P.shape[0]
    g_ex, ec = _extras_row(n_full, udim, rhs=0.2)
    r = np.full((M, N), 0.5)
    X, U, data = _solve_ours(p, reg, Nc, dict(u_soc_r=r, extra_cstrs=[ec]))
    assert data["ipm_converged"], data
    assert np.linalg.norm(U, axis=-1).max() <= 0.5 + 1e-6

    Pu, qu, T, t0 = _eliminate_states(P, q, A, b, n_u)
    ge_u, he_u = g_ex @ T, 0.2 - g_ex @ t0
    cons = [sopt.LinearConstraint(ge_u[None, :], -np.inf, [he_u])]
    # cones over the consensus layout u = [u_cons; u_free_1..M]
    Nf = N - Nc
    for j in range(Nc):
        cons.append(sopt.NonlinearConstraint(
            lambda u, j=j: 0.5 - np.linalg.norm(u[j * udim:(j + 1) * udim]),
            0.0, np.inf))
    for i in range(M):
        for j in range(Nf):
            s = Nc * udim + (i * Nf + j) * udim
            cons.append(sopt.NonlinearConstraint(
                lambda u, s=s: 0.5 - np.linalg.norm(u[s:s + udim]),
                0.0, np.inf))
    res = sopt.minimize(
        lambda u: 0.5 * u @ Pu @ u + qu @ u, np.zeros(n_u),
        jac=lambda u: Pu @ u + qu, method="trust-constr", constraints=cons,
        options=dict(gtol=1e-12, xtol=1e-14, maxiter=5000))
    U_o = _U_from_u(res.x, T, t0, N, xdim, udim, M, Nc)
    np.testing.assert_allclose(U, U_o, atol=3e-3)


def test_smooth_with_extras_changes_solution():
    """Silent-drop regression: smooth_cstr with extras must actually smooth —
    the strongly-smoothed solution must differ from the exact-constraint one
    and converge back to it as alpha grows."""
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p, reg, P, q, A, b = _mk(46, M, N, xdim, udim, Nc)
    n_full = P.shape[0]
    g_ex, ec = _extras_row(n_full, udim, rhs=0.25)
    u_l = np.full((M, N, udim), -0.8)
    u_u = np.full((M, N, udim), 0.8)
    _, U_exact, _ = _solve_ours(p, reg, Nc, dict(extra_cstrs=[ec]),
                                u_l=u_l, u_u=u_u)
    _, U_soft, _ = _solve_ours(
        p, reg, Nc, dict(extra_cstrs=[ec], smooth_cstr="logbarrier",
                         smooth_alpha=1.0), u_l=u_l, u_u=u_u)
    _, U_hard, _ = _solve_ours(
        p, reg, Nc, dict(extra_cstrs=[ec], smooth_cstr="logbarrier",
                         smooth_alpha=1e4), u_l=u_l, u_u=u_u)
    d_soft = np.abs(U_soft - U_exact).max()
    d_hard = np.abs(U_hard - U_exact).max()
    assert d_soft > 1e-2, "alpha=1 smoothing must visibly move the solution"
    assert d_hard < 5e-3, (d_hard, "alpha->inf must recover the exact solve")


def test_cvar_with_hf_raises():
    """Cross-particle terminal cost has no per-particle epigraph: k + Hf
    must fail loudly, never drop either term."""
    M, N, xdim, udim = 2, 4, 3, 2
    p, reg, *_ = _mk(47, M, N, xdim, udim, Nc=N)
    Hf = np.eye(M * xdim)
    with pytest.raises(NotImplementedError):
        _solve_ours(p, reg, N, dict(k=1, Hf=Hf))


def test_diff_cost_fn_with_extras_raises():
    M, N, xdim, udim = 2, 4, 3, 2
    p, reg, *_ = _mk(48, M, N, xdim, udim, Nc=N)
    n_full = N * udim + M * N * xdim
    _, ec = _extras_row(n_full, udim)
    with pytest.raises(NotImplementedError):
        _solve_ours(p, reg, N,
                    dict(extra_cstrs=[ec], diff_cost_fn=lambda X, U: 0.0))
