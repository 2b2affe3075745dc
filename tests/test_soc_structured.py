"""Structured per-stage SOC cones (||u_j|| <= r) in the arrow IPM.

Validates the fused/structured cone path (solvers/ipm.py SocSpec) against the
scipy trust-constr oracle and against the dense cone path (solvers/extras.py),
and end-to-end through the fused build_scp_solver (BASELINE config 3 shape).
"""

import numpy as np
import scipy.optimize as sopt

import pmpc_tpu  # noqa: F401
from pmpc_tpu.solvers.dispatch import affine_solve_np
from fixtures import dubins_f_fx_fu_fn, unicycle_step

import oracle
from test_extras import _u_norm_socs


def _solve_structured(p, M, N, xdim, udim, Nc, umax, **extra_settings):
    return affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None,
        Nc=Nc,
        settings=dict(u_soc_r=np.full((M, N), umax), ipm_iters=40,
                      ipm_tol_exp=-9, **extra_settings),
    )


def test_structured_soc_matches_dense_cone_path():
    rng = np.random.default_rng(21)
    M, N, xdim, udim, Nc = 2, 6, 3, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    umax = 0.6

    X_s, U_s, data_s = _solve_structured(p, M, N, xdim, udim, Nc, umax)
    assert data_s["ipm_converged"], data_s

    ec = _u_norm_socs(M, N, xdim, udim, Nc, umax)
    X_d, U_d, data_d = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None,
        Nc=Nc, settings=dict(extra_cstrs=[ec]),
    )
    np.testing.assert_allclose(U_s, U_d, atol=5e-5)
    assert np.linalg.norm(U_s, axis=-1).max() <= umax + 1e-6
    assert np.ptp(U_s[:, :Nc, :], axis=0).max() < 1e-10


def test_structured_soc_matches_oracle():
    rng = np.random.default_rng(33)
    M, N, xdim, udim, Nc = 3, 5, 2, 2, 1
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    umax = 0.5
    X_s, U_s, data_s = _solve_structured(p, M, N, xdim, udim, Nc, umax)
    assert data_s["ipm_converged"]

    P, q = oracle.build_Pq(**p, reg_x=1.0, reg_u=0.1, slew_reg=np.zeros(M),
                           slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)), Nc=Nc)
    A, b = oracle.build_Ab(p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"], Nc)
    n, u_idx, x_idx = oracle.layout(N, xdim, udim, M, Nc)
    cons = [sopt.LinearConstraint(A, b, b)]
    seen = set()
    for i in range(M):
        for j in range(N):
            sl = u_idx(i, j)
            if (sl.start, sl.stop) in seen:
                continue
            seen.add((sl.start, sl.stop))
            cons.append(sopt.NonlinearConstraint(
                (lambda sl=sl: lambda z: umax - np.linalg.norm(z[sl]))(), 0.0, np.inf))
    z0 = oracle.solve_eq_kkt(P, q, A, b)
    res = sopt.minimize(lambda z: 0.5 * z @ P @ z + q @ z, z0,
                        jac=lambda z: P @ z + q, hess=lambda z: P,
                        constraints=cons, method="trust-constr",
                        options=dict(maxiter=3000, gtol=1e-12, xtol=1e-14))
    X_o, U_o = oracle.split_z(res.x, N, xdim, udim, M, Nc)
    np.testing.assert_allclose(U_s, U_o, atol=2e-4)


def test_structured_soc_with_box_bounds():
    """Cones + box bounds together (both constraint families active)."""
    rng = np.random.default_rng(7)
    M, N, xdim, udim, Nc = 2, 5, 2, 2, 0
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    umax = 0.7
    box = 0.5  # tighter than the cone in single coords
    X, U, data = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=np.full((M, N, udim), -box), u_u=np.full((M, N, udim), box),
        x_l=None, x_u=None,
        Nc=Nc, settings=dict(u_soc_r=np.full((M, N), umax), ipm_iters=40,
                             ipm_tol_exp=-9),
    )
    assert data["ipm_converged"]
    assert np.abs(U).max() <= box + 1e-6
    assert np.linalg.norm(U, axis=-1).max() <= umax + 1e-6


def test_fused_scp_solver_with_socs():
    """End-to-end fused SCP with per-stage control cones (config 3 shape)."""
    import jax

    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data

    M, N, xdim, udim, Nc = 4, 12, 4, 2, 3
    umax = 0.8
    solver = build_scp_solver(
        unicycle_step, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=12, res_tol=1e-6, has_u_soc=True, ipm_iters=25,
    )
    rng = np.random.default_rng(0)
    x0 = (np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))).astype(np.float32)
    Q = np.tile(np.eye(xdim, dtype=np.float32), (M, N, 1, 1))
    R = np.tile((1e-2 * np.eye(udim)).astype(np.float32), (M, N, 1, 1))
    data = make_scp_data(x0, Q, R, reg_x=1.0, reg_u=0.1,
                         u_soc_r=np.full((M, N), umax, np.float32))
    X, U, info = solver(data)
    U = np.asarray(U)
    assert np.isfinite(U).all()
    norms = np.linalg.norm(U, axis=-1)
    assert norms.max() <= umax + 1e-4, norms.max()
    assert norms.max() > umax - 0.05, "cone should be active for this problem"
    # consensus stages shared across particles
    assert np.ptp(U[:, :Nc, :], axis=0).max() < 1e-5

    # unconstrained comparison: cones must actually change the solution
    solver0 = build_scp_solver(
        unicycle_step, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=12, res_tol=1e-6,
    )
    X0, U0, _ = solver0(data)
    assert np.linalg.norm(np.asarray(U0), axis=-1).max() > umax + 0.05


def test_partial_soc_radii_inf_masks_cones():
    """+inf radii disable individual cones; only finite-radius stages bind."""
    rng = np.random.default_rng(12)
    M, N, xdim, udim, Nc = 2, 6, 3, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    r = np.full((M, N), np.inf)
    r[:, :3] = 0.4  # cones on the first three stages only
    X, U, data = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None,
        Nc=Nc, settings=dict(u_soc_r=r, ipm_iters=40, ipm_tol_exp=-8),
    )
    assert data["ipm_converged"], data
    norms = np.linalg.norm(U, axis=-1)
    assert norms[:, :3].max() <= 0.4 + 1e-6
    # unconstrained comparison: later stages must be unaffected by the cones
    X0, U0, _ = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=Nc, settings={},
    )
    assert np.linalg.norm(U0, axis=-1)[:, :3].max() > 0.4, "cones should bind"


def test_soc_warm_start_cuts_iterations():
    """solver_state warm starts carry the cone duals too."""
    f_fn = dubins_f_fx_fu_fn()
    N, xdim, udim = 10, 4, 2
    import pmpc_tpu

    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    X, U, data = pmpc_tpu.solve(
        f_fn, Q, R, np.ones(xdim), max_it=8, res_tol=1e-9, verbose=False,
        solver_settings=dict(u_soc_r=np.full((1, N), 0.8)),
    )
    iters = [sd["ipm_iters"] for sd in data["solver_data"]]
    assert min(iters[1:]) < iters[0], iters
    assert np.linalg.norm(U, axis=-1).max() <= 0.8 + 1e-5


def test_fused_soc_batch_respects_cones():
    """A vmapped batch of perturbed problems (bench config-3 shape) must not
    adopt cone-violating iterates: a gave-up cone IPM (f32 NT-scaling
    breakdown) is rejected by the SCP loop (stats["failed"] contract) and the
    breakdown retry first attempts interior restoration of the cone points."""
    import jax
    import jax.numpy as jnp

    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data

    N, xdim, udim = 12, 4, 2
    r = 0.7
    f32 = np.float32
    d = make_scp_data(np.ones((1, xdim), f32),
                      np.tile(np.eye(xdim, dtype=f32), (1, N, 1, 1)),
                      np.tile((1e-2 * np.eye(udim)).astype(f32), (1, N, 1, 1)),
                      reg_x=1.0, reg_u=0.1,
                      u_l=-np.ones((1, N, udim), f32),
                      u_u=np.ones((1, N, udim), f32),
                      u_soc_r=np.full((1, N), r, f32))
    solver = build_scp_solver(unicycle_step, N=N, xdim=xdim, udim=udim, M=1,
                              Nc=0, max_it=8, res_tol=1e-5, has_u_bounds=True,
                              has_u_soc=True, jit=False)
    B = 32
    batched = jax.jit(jax.vmap(solver))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), d)
    rng = np.random.default_rng(7)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(f32)
    X, U, info = batched(stack._replace(x0=jnp.asarray(x0)))
    norms = np.linalg.norm(np.asarray(U), axis=-1)
    # loose-tolerance mid-SCP solves may leave ~sqrt(ipm_tol) violations, but
    # never the gross infeasibility of an adopted failed solve
    assert norms.max() <= r + 5e-3, norms.max()


def test_ipm_stats_failed_flag_clean_solve():
    """Normal structured-SOC solves report failed=False (and converged)."""
    rng = np.random.default_rng(5)
    M, N, xdim, udim, Nc = 2, 6, 3, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    X, U, data = _solve_structured(p, M, N, xdim, udim, Nc, 0.6)
    assert data["ipm_converged"]
    assert data["ipm_failed"] is False
