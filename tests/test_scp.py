"""SCP outer loop: convergence + exactness on linear problems (eq path)."""

import numpy as np
import pytest

import pmpc_tpu
from fixtures import dubins_f_fx_fu_fn, linear_f_fx_fu_fn

import oracle


def test_scp_linear_system_matches_oracle_one_iteration():
    """With linear dynamics and no constraints, the SCP subproblem is exact, so
    the first iteration already solves the QP: compare against the dense KKT
    oracle of the canonical consensus form."""
    rng = np.random.default_rng(0)
    M, N, xdim, udim = 2, 10, 3, 2
    A = 0.9 * np.eye(xdim) + 0.05 * rng.normal(size=(xdim, xdim))
    B = rng.normal(size=(xdim, udim))
    f_fn = linear_f_fx_fu_fn(A, B)

    Q = np.tile(np.eye(xdim), (M, N, 1, 1))
    R = np.tile(0.1 * np.eye(udim), (M, N, 1, 1))
    x0 = rng.normal(size=(M, xdim))
    X_ref = rng.normal(size=(M, N, xdim))
    U_ref = np.zeros((M, N, udim))
    reg_x, reg_u = 0.0, 0.0

    X, U, data = pmpc_tpu.solve(
        f_fn, Q, R, x0, X_ref=X_ref, U_ref=U_ref,
        reg_x=reg_x, reg_u=reg_u, max_it=2, res_tol=1e-9, verbose=False,
        solver_settings=dict(Nc=0),  # independent particles (default is FULL consensus)
    )
    assert X.shape == (M, N + 1, xdim) and U.shape == (M, N, udim)

    # oracle on the linearization at X_prev=X_ref (first SCP iteration's problem)
    X_prev, U_prev = X_ref, U_ref
    X_ = np.concatenate([x0[:, None, :], X_prev[:, :-1, :]], axis=1)
    f, fx, fu = f_fn(X_, U_prev)
    p = dict(x0=x0, f=f, fx=fx, fu=fu, X_prev=X_prev, U_prev=U_prev,
             Q=Q, R=R, X_ref=X_ref, U_ref=U_ref)
    P, q = oracle.build_Pq(**p, reg_x=reg_x, reg_u=reg_u, slew_reg=np.zeros(M),
                           slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)), Nc=0)
    Ab, bb = oracle.build_Ab(x0, f, fx, fu, X_prev, U_prev, 0)
    z = oracle.solve_eq_kkt(P, q, Ab, bb)
    X_o, U_o = oracle.split_z(z, N, xdim, udim, M, 0)

    np.testing.assert_allclose(U[:, :, :], U_o, atol=1e-6)
    np.testing.assert_allclose(X[:, 1:, :], X_o, atol=1e-6)


def test_scp_dubins_converges():
    """Dubins-car MPC (BASELINE config 1) converges on the eq path."""
    N, xdim, udim = 20, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    x0 = np.ones(xdim)
    X_ref, U_ref = np.zeros((N, xdim)), np.zeros((N, udim))
    X, U, data = pmpc_tpu.solve(
        f_fn, Q, R, x0, X_ref=X_ref, U_ref=U_ref,
        reg_x=1e0, reg_u=1e-1, max_it=60, res_tol=1e-5, verbose=False,
    )
    assert X is not None, "solver failed"
    assert X.shape == (N + 1, xdim)
    resids = [h["resid"] for h in data["hist"]]
    assert resids[-1] < 1e-5, f"SCP did not converge: {resids[-5:]}"
    # the car should have moved toward the origin reference
    assert np.linalg.norm(X[-1, :2]) < np.linalg.norm(X[0, :2])


def test_scp_consensus_particles_share_first_controls():
    """M particles with different dynamics parameters; Nc consensus controls
    shared (BASELINE config 2 shape)."""
    M, N, xdim, udim, Nc = 4, 15, 4, 2, 5
    rng = np.random.default_rng(3)
    fns = [dubins_f_fx_fu_fn((1.0 + 0.1 * rng.normal(), 1.0 + 0.1 * rng.normal(), 0.3))
           for _ in range(M)]

    def f_fx_fu_fn(X, U):  # per-particle dynamics: X (M,N,xdim)
        outs = [fn(X[i], U[i]) for i, fn in enumerate(fns)]
        f = np.stack([np.asarray(o[0]) for o in outs])
        fx = np.stack([np.asarray(o[1]) for o in outs])
        fu = np.stack([np.asarray(o[2]) for o in outs])
        return f, fx, fu

    Q = np.tile(np.eye(xdim), (M, N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (M, N, 1, 1))
    x0 = np.tile(np.ones(xdim), (M, 1))
    X, U, data = pmpc_tpu.solve(
        f_fx_fu_fn, Q, R, x0,
        reg_x=1e0, reg_u=1e-1, max_it=40, res_tol=1e-6, verbose=False,
        solver_settings=dict(Nc=Nc),
    )
    assert X is not None
    spread = np.ptp(U[:, :Nc, :], axis=0).max()
    assert spread < 1e-8, f"consensus controls differ across particles: {spread}"
    free_spread = np.ptp(U[:, Nc:, :], axis=0).max()
    assert free_spread > 1e-6, "free controls should differ across particles"


def test_scp_data_contract():
    N, xdim, udim = 8, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q, R = np.tile(np.eye(xdim), (N, 1, 1)), np.tile(0.1 * np.eye(udim), (N, 1, 1))
    X, U, data = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), max_it=3, verbose=False, debug=True)
    assert set(["solver_data", "hist", "t_aff_solve", "sol_hist"]) <= set(data.keys())
    assert len(data["hist"]) <= 3
    for h in data["hist"]:
        assert set(["it", "elaps", "obj", "resid", "reg_x", "reg_u"]) == set(h.keys())


def test_scp_nan_failure_contract():
    """Solver failure (NaN dynamics) returns (None, None, None) like
    pmpc/scp_mpc.py:391-395."""
    N, xdim, udim = 5, 2, 1

    def bad_fn(X, U):
        f = np.full(X.shape, np.nan)
        fx = np.zeros(X.shape + (xdim,))
        fu = np.zeros(X.shape + (udim,))
        return f, fx, fu

    Q, R = np.tile(np.eye(xdim), (N, 1, 1)), np.tile(np.eye(udim), (N, 1, 1))
    X, U, data = pmpc_tpu.solve(bad_fn, Q, R, np.ones(xdim), max_it=2, verbose=False)
    assert X is None and U is None and data is None


def test_scp_dubins_with_control_bounds():
    """Reference tests/simple.py configuration: Dubins car, |u| <= 1."""
    N, xdim, udim = 25, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    x0 = np.ones(xdim)
    u_l, u_u = -np.ones((N, udim)), np.ones((N, udim))
    X, U, data = pmpc_tpu.solve(
        f_fn, Q, R, x0, u_l=u_l, u_u=u_u,
        reg_x=1e0, reg_u=1e-1, max_it=60, res_tol=1e-5, verbose=False,
    )
    assert X is not None
    assert data["hist"][-1]["resid"] < 1e-5
    assert U.max() <= 1.0 + 1e-6 and U.min() >= -1.0 - 1e-6
    # bounds must actually bind somewhere for this config
    assert (np.abs(np.abs(U) - 1.0) < 1e-4).any()


def test_one_sided_bounds_enforced():
    """A u_u without u_l (and vice versa) must be enforced, not silently
    dropped (the old both-or-neither check discarded one-sided bounds)."""
    from fixtures import dubins_f_fx_fu_fn

    N, xdim, udim = 10, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    Q[:, :2, :2] *= 50.0  # strong position tracking pushes controls hard
    R = np.tile(1e-3 * np.eye(udim), (N, 1, 1))
    X_ref = np.tile(np.array([5.0, 5.0, 0.0, 0.0]), (N, 1))
    kw = dict(X_ref=X_ref, reg_x=1.0, reg_u=0.1, max_it=15, res_tol=1e-6,
              verbose=False)
    X0, U0, _ = pmpc_tpu.solve(f_fn, Q, R, np.zeros(xdim), **kw)
    assert U0.max() > 0.31, "fixture must want controls above the cap"
    X1, U1, _ = pmpc_tpu.solve(f_fn, Q, R, np.zeros(xdim),
                               u_u=0.3 * np.ones((N, udim)), **kw)
    assert U1.max() <= 0.3 + 1e-6
    X2, U2, _ = pmpc_tpu.solve(f_fn, Q, R, np.zeros(xdim),
                               u_l=-0.1 * np.ones((N, udim)), **kw)
    assert U2.min() >= -0.1 - 1e-6
