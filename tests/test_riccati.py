"""Riccati sweep vs the condensed eq solver (same problem, two algorithms)."""

import numpy as np
import jax
import jax.numpy as jnp

from pmpc_tpu.solvers.reduced import assemble_condensed, solve_eq, recover_XU
from pmpc_tpu.solvers.riccati import riccati_solve_scp

import oracle


def test_riccati_matches_condensed():
    rng = np.random.default_rng(70)
    M, N, xdim, udim = 3, 12, 4, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    reg_x, reg_u = 1.0, 0.1

    cqp = assemble_condensed(
        *[jnp.asarray(p[k]) for k in
          ["x0", "f", "fx", "fu", "X_prev", "U_prev", "Q", "R", "X_ref", "U_ref"]],
        reg_x=jnp.full(M, reg_x), reg_u=jnp.full(M, reg_u),
        slew_reg=jnp.zeros(M), slew_reg0=jnp.zeros(M), slew_um1=jnp.zeros((M, udim)),
        Nc=0,
    )
    uc, uf = solve_eq(cqp)
    X_c, U_c = recover_XU(cqp, uc, uf, N=N)

    sol = jax.vmap(riccati_solve_scp, in_axes=(0,) * 10 + (None, None))(
        *[jnp.asarray(p[k]) for k in
          ["x0", "f", "fx", "fu", "X_prev", "U_prev", "Q", "R", "X_ref", "U_ref"]],
        reg_x, reg_u,
    )
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(U_c), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.X), np.asarray(X_c), atol=1e-8)


def test_riccati_long_horizon():
    """N=200 (where condensation would be O(N^2)): solution satisfies the
    KKT conditions of the canonical problem."""
    rng = np.random.default_rng(71)
    M, N, xdim, udim = 1, 200, 4, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    # contract the dynamics so the long rollout stays bounded
    p["fx"] = 0.7 * p["fx"]
    sol = riccati_solve_scp(
        *[jnp.asarray(p[k][0]) for k in
          ["x0", "f", "fx", "fu", "X_prev", "U_prev", "Q", "R", "X_ref", "U_ref"]],
        1.0, 0.1,
    )
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    assert np.isfinite(X).all() and np.isfinite(U).all()
    # KKT check via the dense canonical form
    P, q = oracle.build_Pq(**p, reg_x=1.0, reg_u=0.1, slew_reg=np.zeros(M),
                           slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)), Nc=0)
    A, b = oracle.build_Ab(p["x0"], p["f"], p["fx"], p["fu"],
                           p["X_prev"], p["U_prev"], 0)
    n, u_idx, x_idx = oracle.layout(N, xdim, udim, M, 0)
    z = np.zeros(n)
    for j in range(N):
        z[u_idx(0, j)] = U[j]
        z[x_idx(0, j)] = X[j]
    # primal feasibility
    assert np.abs(A @ z - b).max() < 1e-8
    # stationarity on the constraint manifold: grad must lie in row space of A
    g = P @ z + q
    nu, *_ = np.linalg.lstsq(A.T, -g, rcond=None)
    assert np.abs(A.T @ nu + g).max() < 1e-6


def test_riccati_consensus_matches_condensed():
    """The theta-parameterized consensus Riccati solve must agree with the
    condensed arrow solve on a joint M-particle problem (Nc > 0)."""
    from pmpc_tpu.solvers.dispatch import affine_solve_np

    rng = np.random.default_rng(5)
    M, N, xdim, udim, Nc = 3, 7, 4, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    kw = dict(
        x0=p["x0"], f=p["f"], fx=p["fx"], fu=p["fu"],
        X_prev=p["X_prev"], U_prev=p["U_prev"], Q=p["Q"], R=p["R"],
        X_ref=p["X_ref"], U_ref=p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=Nc,
    )
    X_c, U_c, _ = affine_solve_np(**kw, settings={})
    X_r, U_r, _ = affine_solve_np(**kw, settings=dict(method="riccati"))
    np.testing.assert_allclose(U_r, U_c, atol=1e-6)
    np.testing.assert_allclose(X_r, X_c, atol=1e-6)
    # consensus block genuinely shared
    assert np.ptp(U_r[:, :Nc], axis=0).max() < 1e-8


def test_fused_scp_riccati_matches_condensed():
    """build_scp_solver(method='riccati') end-to-end vs the condensed path."""
    from fixtures import unicycle_step
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data

    M, N, xdim, udim, Nc = 4, 12, 4, 2, 3
    rng = np.random.default_rng(0)
    x0 = (np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim)))
    Q = np.tile(np.eye(xdim), (M, N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (M, N, 1, 1))
    data = make_scp_data(x0, Q, R, reg_x=1.0, reg_u=0.1)
    mk = lambda method: build_scp_solver(
        unicycle_step, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=10, res_tol=1e-7, method=method)
    X_c, U_c, i_c = mk("condensed")(data)
    X_r, U_r, i_r = mk("riccati")(data)
    np.testing.assert_allclose(np.asarray(U_r), np.asarray(U_c), atol=5e-5)
    assert abs(float(i_r["resid"]) - float(i_c["resid"])) < 1e-4
