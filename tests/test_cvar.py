"""CVaR-k (k-worst-particle) consensus objective vs scipy oracle."""

import numpy as np
import jax.numpy as jnp
import scipy.optimize as sopt

from pmpc_tpu.solvers.dispatch import affine_solve_np

import oracle


def _setup(seed=30, M=3, N=6, xdim=3, udim=2):
    rng = np.random.default_rng(seed)
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    return p


def _particle_cost(p, i, U, reg_x, reg_u):
    """True particle cost of shared controls U (N, udim) via linear rollout."""
    N, xdim = p["f"].shape[1:]
    x = None
    X = np.zeros((N, xdim))
    xlin = np.concatenate([p["x0"][i][None], p["X_prev"][i][:-1]], axis=0)
    xc = p["x0"][i]
    for j in range(N):
        xc = p["f"][i, j] + p["fx"][i, j] @ (xc - xlin[j]) + p["fu"][i, j] @ (U[j] - p["U_prev"][i, j])
        X[j] = xc
    dX, dU = X - p["X_ref"][i], U - p["U_ref"][i]
    J = 0.5 * np.einsum("ni,nij,nj->", dX, p["Q"][i], dX)
    J += 0.5 * np.einsum("ni,nij,nj->", dU, p["R"][i], dU)
    J += 0.5 * reg_x * np.sum((X - p["X_prev"][i]) ** 2)
    J += 0.5 * reg_u * np.sum((U - p["U_prev"][i]) ** 2)
    return J


def _solve_ours(p, k, Nc=None):
    M, N, xdim = p["f"].shape
    udim = p["fu"].shape[-1]
    Nc = N if Nc is None else Nc
    return affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None,
        Nc=Nc, settings=dict(k=k),
    )


def test_cvar_k1_minimizes_worst_particle():
    p = _setup()
    M, N, xdim = p["f"].shape
    udim = p["fu"].shape[-1]
    X, U, data = _solve_ours(p, k=1)
    assert data["ipm_converged"], data
    # full consensus: all particles share all controls
    assert np.ptp(U, axis=0).max() < 1e-8

    # oracle: minimize max_i J_i(U) (k=1 == worst case) with eps anchor
    eps = 1e-3

    def obj(uflat):
        U_ = uflat.reshape(N, udim)
        Js = np.array([_particle_cost(p, i, U_, 1.0, 0.1) for i in range(M)])
        # reference objective: (1+eps) sum y + (1-eps) k t at optimum equals
        # min over t of that expression with y = max(J - t, 0)
        ts = np.sort(Js)
        best = np.inf
        for t in np.concatenate([Js, [Js.min() - 1]]):
            val = (1 + eps) * np.maximum(Js - t, 0).sum() + (1 - eps) * 1 * t
            best = min(best, val)
        return best

    res = sopt.minimize(obj, U[0].reshape(-1), method="Nelder-Mead",
                        options=dict(maxiter=40000, xatol=1e-10, fatol=1e-12))
    np.testing.assert_allclose(U[0].reshape(-1), res.x, atol=2e-3)


def test_cvar_kM_matches_sum_objective():
    """k = M must reproduce the plain summed-cost consensus solution."""
    p = _setup(seed=31)
    M, N, xdim = p["f"].shape
    udim = p["fu"].shape[-1]
    X_k, U_k, data = _solve_ours(p, k=M)  # k == M routes to the regular path
    X_s, U_s, _ = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=N, settings={},
    )
    np.testing.assert_allclose(U_k, U_s, atol=1e-6)


def test_cvar_intermediate_k():
    """1 < k < M: solution differs from both sum and worst-case solutions and
    improves the sum-of-k-largest metric over both."""
    p = _setup(seed=32, M=4)
    M, N, xdim = p["f"].shape
    udim = p["fu"].shape[-1]
    k = 2
    _, U2, d2 = _solve_ours(p, k=k)
    _, U1, _ = _solve_ours(p, k=1)
    _, UM, _ = _solve_ours(p, k=M)
    assert d2["ipm_converged"]

    def sum_k_largest(U):
        Js = np.array([_particle_cost(p, i, U[0], 1.0, 0.1) for i in range(M)])
        return np.sort(Js)[-k:].sum()

    v2, v1, vM = sum_k_largest(U2), sum_k_largest(U1), sum_k_largest(UM)
    # slack proportional to the objective scale (~200): solver tolerance
    assert v2 <= v1 + 1e-4 and v2 <= vM + 1e-4


def test_cvar_scp_iterates_without_reject():
    """End-to-end SCP with k-worst objective: the SECOND subproblem is
    LP-like re-linearized around the first solution — a regression point
    where the a_aff^2-damped Mehrotra corrector jammed at mu ~ 0.3 and the
    reject contract killed the loop after one iteration. The adaptive
    full/damped corrector must converge every subproblem."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn

    M, N, xdim, udim = 8, 10, 4, 2
    rng = np.random.default_rng(7)
    Q = np.tile(np.eye(xdim), (M, N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (M, N, 1, 1))
    x0 = np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))
    X, U, data = pmpc_tpu.solve(
        dubins_f_fx_fu_fn(), Q, R, x0, max_it=5, res_tol=1e-9,
        verbose=False, solver_settings=dict(k=3))
    assert U is not None
    assert "rejected_subproblem" not in data, data.get("solver_data")
    assert len(data["hist"]) == 5  # every iteration accepted
    resids = [h["resid"] for h in data["hist"]]
    # the k-worst objective leaves non-worst particles loosely determined,
    # so SCP contraction is slow — assert steady decrease, not a rate
    assert resids[-1] < resids[0] * 0.05, resids
    assert all(b < a for a, b in zip(resids, resids[1:])), resids
    assert all(sd["ipm_converged"] for sd in data["solver_data"])
