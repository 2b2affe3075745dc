"""Sensitivity gains vs finite differences (parity with PMPC.jl/test/sens_test.jl)."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize as sopt

from pmpc_tpu.sensitivity import (
    SensProblem,
    all_sensitivity_L,
    masked_rollout,
    nonlinear_rollout,
    optimality_residual,
    sensitivity_L,
    _smooth_objective,
)
from fixtures import unicycle_step


def _solve_smooth(dynamics, prob, N, udim):
    """Reference optimum of the smoothed problem via scipy (float64)."""
    Xh = jnp.zeros((N, prob.x0.shape[0]))
    mask = jnp.zeros(N)

    @jax.jit
    def obj_jit(U, x0):
        return _smooth_objective(dynamics, prob._replace(x0=x0), U, x0, Xh, mask)

    grad_jit = jax.jit(jax.grad(obj_jit))

    def obj_np(uflat):
        return float(obj_jit(jnp.asarray(uflat.reshape(N, udim)), prob.x0))

    def jac_np(uflat):
        return np.asarray(grad_jit(jnp.asarray(uflat.reshape(N, udim)), prob.x0)).reshape(-1)

    res = sopt.minimize(obj_np, np.zeros(N * udim), jac=jac_np, method="BFGS",
                        options=dict(maxiter=2000, gtol=1e-10))
    U = jnp.asarray(res.x.reshape(N, udim))
    # Newton-polish to machine precision (finite differences need it)
    hess_jit = jax.jit(jax.hessian(obj_jit))
    for _ in range(8):
        g = np.asarray(grad_jit(U, prob.x0)).reshape(-1)
        H = np.asarray(hess_jit(U, prob.x0)).reshape(N * udim, N * udim)
        U = U - jnp.asarray(np.linalg.solve(H, g).reshape(N, udim))
    return U


def test_masked_rollout_pins_history():
    N, xdim, udim = 6, 4, 2
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(N, udim)))
    X_hist = jnp.asarray(rng.normal(size=(N, xdim)))
    x0 = jnp.ones(xdim)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    X = masked_rollout(unicycle_step, x0, U, X_hist, mask)
    np.testing.assert_allclose(X[:2], X_hist[:2])
    # step 2 must roll from the pinned X_hist[1]
    np.testing.assert_allclose(X[2], unicycle_step(X_hist[1], U[2]), atol=1e-12)


def test_optimality_residual_zero_at_optimum():
    N, xdim, udim = 8, 4, 2
    prob = SensProblem(
        x0=jnp.ones(xdim),
        Q=jnp.tile(jnp.eye(xdim), (N, 1, 1)),
        R=jnp.tile(0.1 * jnp.eye(udim), (N, 1, 1)),
        X_ref=jnp.zeros((N, xdim)), U_ref=jnp.zeros((N, udim)),
        reg_x=jnp.asarray(0.0), reg_u=jnp.asarray(0.0),
        u_l=-jnp.ones((N, udim)), u_u=jnp.ones((N, udim)),
        slew_reg=jnp.asarray(0.0), smooth_alpha=jnp.asarray(50.0),
    )
    U_star = _solve_smooth(unicycle_step, prob, N, udim)
    r = optimality_residual(unicycle_step, prob, U_star)
    assert np.abs(np.asarray(r)).max() < 1e-6


def test_all_sensitivity_L_shapes():
    N, xdim, udim = 5, 4, 2
    prob = SensProblem(
        x0=jnp.ones(xdim),
        Q=jnp.tile(jnp.eye(xdim), (N, 1, 1)),
        R=jnp.tile(0.1 * jnp.eye(udim), (N, 1, 1)),
        X_ref=jnp.zeros((N, xdim)), U_ref=jnp.zeros((N, udim)),
        reg_x=jnp.asarray(0.1), reg_u=jnp.asarray(0.1),
        slew_reg=jnp.asarray(0.0), smooth_alpha=jnp.asarray(20.0),
    )
    U = jnp.zeros((N, udim))
    X = nonlinear_rollout(unicycle_step, prob.x0, U)
    Ls = all_sensitivity_L(unicycle_step, prob, U, X)
    assert len(Ls) == N and all(L.shape == (N, udim, xdim) for L in Ls)
