"""Smooth-constraint (logbarrier / squareplus) Newton path tests."""

import numpy as np

from pmpc_tpu.solvers.dispatch import affine_solve_np

import oracle


def _solve(p, settings, u_bounds=(-0.5, 0.5), Nc=0):
    M, N, xdim = p["f"].shape
    udim = p["fu"].shape[-1]
    u_l = np.full((M, N, udim), u_bounds[0])
    u_u = np.full((M, N, udim), u_bounds[1])
    return affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=u_l, u_u=u_u, x_l=None, x_u=None, Nc=Nc, settings=dict(settings),
    )


def test_logbarrier_approaches_exact_solution():
    """For growing alpha the logbarrier solution converges to the exact
    (IPM) solution of the box QP."""
    rng = np.random.default_rng(11)
    p = oracle.random_problem(rng, M=2, N=8, xdim=3, udim=2)
    # start strictly inside the box so the logbarrier domain is non-empty
    p = dict(p, U_prev=np.clip(p["U_prev"], -0.4, 0.4))
    X_exact, U_exact, data = _solve(p, settings={})
    assert data["ipm_converged"]

    errs = []
    for alpha in [10.0, 100.0, 1000.0]:
        X_s, U_s, _ = _solve(p, settings=dict(smooth_cstr="logbarrier",
                                              smooth_alpha=alpha, newton_iters=40))
        assert np.all(np.isfinite(U_s))
        assert U_s.max() < 0.5 and U_s.min() > -0.5  # strictly interior
        errs.append(np.abs(U_s - U_exact).max())
    assert errs[-1] < errs[0] / 4, f"errors should shrink with alpha: {errs}"
    assert errs[-1] < 5e-2, f"logbarrier(alpha=1e3) too far from exact: {errs}"


def test_logbarrier_matches_smooth_oracle():
    """The logbarrier path must solve the smoothed problem itself (scipy BFGS
    on the identical barrier objective over controls, states eliminated)."""
    import scipy.optimize as sopt

    rng = np.random.default_rng(14)
    M, N, xdim, udim = 1, 6, 3, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    alpha, lo, hi = 50.0, -0.5, 0.5

    X_s, U_s, _ = _solve(p, settings=dict(smooth_cstr="logbarrier", smooth_alpha=alpha))

    # oracle: assemble the reduced quadratic from the canonical form by
    # eliminating states with the dense KKT (U -> X map from dynamics)
    from pmpc_tpu.solvers.reduced import assemble_condensed, recover_XU
    import jax.numpy as jnp

    cqp = assemble_condensed(
        *[jnp.asarray(p[k]) for k in
          ["x0", "f", "fx", "fu", "X_prev", "U_prev", "Q", "R", "X_ref", "U_ref"]],
        reg_x=jnp.full(M, 1.0), reg_u=jnp.full(M, 0.1),
        slew_reg=jnp.zeros(M), slew_reg0=jnp.zeros(M), slew_um1=jnp.zeros((M, udim)),
        Nc=0,
    )
    H = np.asarray(cqp.Hff[0])
    q = np.asarray(cqp.qf[0])

    def F(w):
        pen = -np.sum(np.log(np.maximum(alpha * (w - lo), 1e-300))) / alpha
        pen += -np.sum(np.log(np.maximum(alpha * (hi - w), 1e-300))) / alpha
        return 0.5 * w @ H @ w + q @ w + pen

    def gF(w):
        return H @ w + q - 1.0 / (alpha * (w - lo)) + 1.0 / (alpha * (hi - w))

    w0 = np.zeros(N * udim)
    res = sopt.minimize(F, w0, jac=gF, method="TNC",
                        bounds=[(lo + 1e-9, hi - 1e-9)] * (N * udim),
                        options=dict(maxfun=50000, xtol=1e-14, ftol=1e-16, gtol=1e-12))
    U_o = res.x.reshape(N, udim)
    np.testing.assert_allclose(U_s[0], U_o, atol=2e-4)


def test_squareplus_penalty_approximates():
    rng = np.random.default_rng(12)
    p = oracle.random_problem(rng, M=2, N=8, xdim=3, udim=2)
    X_exact, U_exact, _ = _solve(p, settings={})
    X_s, U_s, _ = _solve(
        p, settings=dict(smooth_cstr="squareplus", smooth_alpha=1e3,
                         smooth_beta=1e3, newton_iters=40))
    assert np.all(np.isfinite(U_s))
    # squareplus is a soft hinge: solution near the exact one
    assert np.abs(U_s - U_exact).max() < 5e-2


def test_smooth_alpha_nan_sentinel_means_exact():
    """smooth_alpha=NaN must route to the exact solver (static_backend.py:250)."""
    rng = np.random.default_rng(13)
    p = oracle.random_problem(rng, M=1, N=6, xdim=3, udim=2)
    X1, U1, d1 = _solve(p, settings=dict(smooth_alpha=float("nan")))
    assert "ipm_converged" in d1


def test_lbfgs_smooth_solver_option():
    """solver_settings solver="LBFGS" (experimental-stack parity) approximates
    the central-path solution of the same smoothed problem."""
    rng = np.random.default_rng(15)
    p = oracle.random_problem(rng, M=2, N=8, xdim=3, udim=2)
    p = dict(p, U_prev=np.clip(p["U_prev"], -0.4, 0.4))
    X_ipm, U_ipm, _ = _solve(p, settings=dict(smooth_cstr="logbarrier", smooth_alpha=50.0))
    X_lb, U_lb, d = _solve(p, settings=dict(smooth_cstr="logbarrier", smooth_alpha=50.0,
                                            solver="LBFGS", max_it=400))
    assert np.isfinite(U_lb).all()
    assert np.abs(U_lb - U_ipm).max() < 5e-3, np.abs(U_lb - U_ipm).max()


def test_diff_cost_fn_quadratic_extra_matches_exact():
    """A quadratic diff_cost_fn must reproduce the exact solve of the
    equivalently-modified QP (experimental diff_cost_fn parity)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(16)
    M, N, xdim, udim = 1, 6, 3, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    c, a = 2.0, 0.3

    def extra(X, U):
        return 0.5 * c * jnp.sum((X - a) ** 2)

    X_s, U_s, d = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=0,
        settings=dict(diff_cost_fn=extra, max_it=600),
    )
    # exact equivalent: Q' = Q + cI, X_ref' with Q' X_ref' = Q X_ref + c a
    Qp = p["Q"] + c * np.eye(xdim)
    Xrefp = np.linalg.solve(Qp, (np.einsum("mnij,mnj->mni", p["Q"], p["X_ref"])
                                 + c * a)[..., None])[..., 0]
    X_e, U_e, _ = affine_solve_np(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        Qp, p["R"], Xrefp, p["U_ref"],
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=0, settings={},
    )
    np.testing.assert_allclose(U_s, U_e, atol=2e-3)


def test_diff_cost_fn_top_level_kwarg_wired():
    """solve(diff_cost_fn=...) as a TOP-LEVEL kwarg must reach the smooth
    path (it used to fall into extra_kw and be silently ignored); it must
    match the solver_settings route exactly."""
    import jax.numpy as jnp

    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn

    N, xdim, udim = 8, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    base = dict(u_l=-np.ones((N, udim)), u_u=np.ones((N, udim)),
                reg_x=3.0, reg_u=1.0, max_it=3, res_tol=1e-5, verbose=False)

    def extra(X, U, *a, **kw):
        return jnp.mean((X + 5.0) ** 2)

    X0, U0, _ = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), **base)
    X1, U1, _ = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), diff_cost_fn=extra, **base)
    X2, U2, _ = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim),
                               solver_settings=dict(diff_cost_fn=extra), **base)
    assert np.abs(U1 - U0).max() > 1e-3, "diff_cost_fn kwarg was ignored"
    np.testing.assert_allclose(U1, U2, atol=1e-9)


def test_riccati_squareplus_matches_condensed():
    """smooth_cstr='squareplus' on method='riccati': the damped Newton with
    O(N) riccati subproblem solves must land on the same smoothed optimum as
    the condensed barrier Newton (round-5 task #7 — the last constraint
    class gaining a long-horizon route). Covers u-boxes, x-boxes, consensus
    and slew."""
    from pmpc_tpu.solvers.dispatch import affine_solve_np

    rng = np.random.default_rng(91)
    for N, with_x, with_slew in ((8, False, False), (10, True, True)):
        M, xdim, udim, Nc = 2, 3, 2, 2
        p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
        kw = dict(
            reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
            slew_reg=np.full(M, 0.3 if with_slew else 0.0),
            slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
            u_l=-0.4 * np.ones((M, N, udim)), u_u=0.4 * np.ones((M, N, udim)),
            x_l=(-2.5 * np.ones((M, N, xdim)) if with_x else None),
            x_u=(2.5 * np.ones((M, N, xdim)) if with_x else None),
            Nc=Nc,
        )
        args = (p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
                p["Q"], p["R"], p["X_ref"], p["U_ref"])
        ss = dict(smooth_cstr="squareplus", smooth_alpha=8.0,
                  smooth_beta=1.0, newton_iters=40)
        X_c, U_c, d_c = affine_solve_np(*args, **kw, settings=ss)
        X_r, U_r, d_r = affine_solve_np(*args, **kw,
                                        settings=dict(ss, method="riccati"))
        np.testing.assert_allclose(U_r, U_c, atol=1e-5)
        np.testing.assert_allclose(X_r, X_c, atol=1e-5)


def test_riccati_squareplus_long_horizon_smoke():
    """N=280 squareplus: the auto route must take the riccati Newton (the
    condensed f32 path overflows past N~240) and return finite, smoothly
    box-respecting controls."""
    from pmpc_tpu.solvers.dispatch import affine_solve_np

    rng = np.random.default_rng(5)
    M, N, xdim, udim = 1, 280, 4, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    kw = dict(
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M),
        slew_um1=np.zeros((M, udim)),
        u_l=-0.5 * np.ones((M, N, udim)), u_u=0.5 * np.ones((M, N, udim)),
        x_l=None, x_u=None, Nc=0,
    )
    args = (p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
            p["Q"], p["R"], p["X_ref"], p["U_ref"])
    # pin the route: the auto-N dispatch must take the riccati Newton
    from pmpc_tpu.solvers import barrier as bar
    calls = []
    orig = bar.riccati_barrier_solve_np

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    bar.riccati_barrier_solve_np = spy
    try:
        X, U, d = affine_solve_np(
            *args, **kw,
            settings=dict(smooth_cstr="squareplus", smooth_alpha=20.0,
                          smooth_beta=200.0, newton_iters=15))
    finally:
        bar.riccati_barrier_solve_np = orig
    assert calls, "auto route must take the riccati squareplus Newton"
    assert np.isfinite(U).all() and np.isfinite(X).all()
    # vs the unpenalized solve: the soft box must pull the controls in hard
    kw_free = dict(kw, u_l=None, u_u=None)
    X0, U0, _ = affine_solve_np(*args, **kw_free, settings={})
    assert np.abs(U).max() < 0.35 * np.abs(U0).max()
