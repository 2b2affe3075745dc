"""Solution sensitivities and optimality residuals of the smoothed MPC problem.

Parity with the reference's sensitivity stack (``pmpc/experimental/jax/root.py``):

- `optimality_residual` — stationarity (KKT) residual of the condensed
  problem with smoothed (logbarrier) box constraints and optional slew/extra
  cost, over the control variable only (states eliminated through the rollout);
  the analog of ``linear_optimality`` (root.py:88-142),
- `masked_rollout` — rollout pinning the first ``t`` steps to a recorded
  history (root.py uses ``masked_rollout`` from dynamics.py:42-57),
- `sensitivity_L` / `all_sensitivity_L` — feedback gains
  ``L_t = dU*/dx_{t-1}`` via the implicit function theorem on the optimality
  map: ``L = -(dr/dU)^{-1} (dr/dx)`` with both Jacobians from JAX autodiff
  (root.py:148-171 builds the same quantities).

All functions operate on a SINGLE particle/problem; vmap for batches.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .utils import with_matmul_precision


class SensProblem(NamedTuple):
    """Problem data for sensitivity analysis (single particle, (N, ...) arrays)."""

    x0: jax.Array
    Q: jax.Array
    R: jax.Array
    X_ref: jax.Array
    U_ref: jax.Array
    # NOTE: these regs are REF-anchored extra weight in the smoothed
    # objective, NOT the SCP prox (which anchors at the previous iterate and
    # whose gradient vanishes at the converged fixed point — the reference's
    # linear_optimality, root.py:88-142, carries no reg terms at all). Leave
    # them 0 when analyzing a converged SCP solution.
    reg_x: jax.Array = 0.0
    reg_u: jax.Array = 0.0
    u_l: Optional[jax.Array] = None
    u_u: Optional[jax.Array] = None
    x_l: Optional[jax.Array] = None
    x_u: Optional[jax.Array] = None
    slew_reg: jax.Array = 0.0
    smooth_alpha: jax.Array = 100.0


def nonlinear_rollout(dynamics: Callable, x0, U):
    """Roll the true nonlinear dynamics: X[j] = f(X[j-1], U[j])."""

    def step(x, u):
        xn = dynamics(x, u)
        return xn, xn

    _, X = jax.lax.scan(step, x0, U)
    return X


def masked_rollout(dynamics: Callable, x0, U, X_hist, mask):
    """Rollout where steps with ``mask[j]=1`` are pinned to ``X_hist[j]``.

    mask: (N,) 1.0 = use history, 0.0 = roll dynamics. Gradients do not flow
    through pinned steps (parity with ``experimental/jax/dynamics.py:42-57``)."""

    def step(x, inp):
        u, xh, m = inp
        xn = dynamics(x, u)
        xn = m * xh + (1.0 - m) * xn
        return xn, xn

    _, X = jax.lax.scan(step, x0, (U, X_hist, mask))
    return X


def _smooth_objective(dynamics, prob: SensProblem, U, x_start, X_hist, mask):
    """Tracking cost + prox + logbarrier boxes over a (masked) rollout."""
    X = masked_rollout(dynamics, x_start, U, X_hist, mask)
    dX = X - prob.X_ref
    dU = U - prob.U_ref
    J = 0.5 * jnp.sum(dX * jnp.einsum("nij,nj->ni", prob.Q, dX))
    J = J + 0.5 * jnp.sum(dU * jnp.einsum("nij,nj->ni", prob.R, dU))
    J = J + 0.5 * prob.reg_u * jnp.sum(dU * dU) + 0.5 * prob.reg_x * jnp.sum(dX * dX)
    if prob.slew_reg is not None:
        J = J + 0.5 * prob.slew_reg * jnp.sum((U[1:] - U[:-1]) ** 2)
    alpha = prob.smooth_alpha

    def barrier(y):  # y < 0 feasible
        return -jnp.log(jnp.maximum(-alpha * y, 1e-30)) / alpha

    if prob.u_l is not None:
        J = J + jnp.sum(barrier(prob.u_l - U))
    if prob.u_u is not None:
        J = J + jnp.sum(barrier(U - prob.u_u))
    if prob.x_l is not None:
        J = J + jnp.sum(barrier(prob.x_l - X))
    if prob.x_u is not None:
        J = J + jnp.sum(barrier(X - prob.x_u))
    return J


def optimality_residual(dynamics, prob: SensProblem, U, t: int = 0, X_hist=None):
    """Gradient of the smoothed objective w.r.t. U with the first ``t`` steps of
    the rollout pinned to history (t=0: plain condensed stationarity)."""
    N = U.shape[0]
    mask = (jnp.arange(N) < t).astype(U.dtype)
    X_hist = X_hist if X_hist is not None else jnp.zeros((N, prob.x0.shape[0]), U.dtype)
    x_start = prob.x0

    def obj(Uv):
        return _smooth_objective(dynamics, prob, Uv, x_start, X_hist, mask)

    return jax.grad(obj)(U)


@partial(jax.jit, static_argnames=("dynamics", "t"))
@with_matmul_precision("highest")
def sensitivity_L(dynamics, prob: SensProblem, U_star, X_star, t: int = 0):
    """Feedback gain L = dU*/dx at step ``t``: how the optimal control sequence
    responds to a perturbation of the state entering step ``t`` (x_{t-1};
    t=0 gives dU*/dx0), holding the recorded history before ``t`` fixed.

    Implicit function theorem on r(U, x) = grad_U J_masked(U, x):
        L = -(dr/dU)^{-1} dr/dx,  shape (N, udim, xdim).
    """
    N, udim = U_star.shape
    xdim = prob.x0.shape[0]
    mask = (jnp.arange(N) < t).astype(U_star.dtype)

    def resid(Uv, x):
        def obj(Uq):
            # the state entering step t is x: for t=0 that's x0; for t>0 the
            # pinned history provides steps < t and x replaces X_hist[t-1]
            X_hist = X_star if t > 0 else jnp.zeros_like(X_star)
            if t > 0:
                X_hist = X_hist.at[t - 1].set(x)
                x_start = prob.x0
            else:
                x_start = x
            return _smooth_objective(dynamics, prob, Uq, x_start, X_hist, mask)

        return jax.grad(obj)(Uv).reshape(-1)

    x_at = X_star[t - 1] if t > 0 else prob.x0
    K = jax.jacfwd(resid, argnums=0)(U_star, x_at).reshape(N * udim, N * udim)
    g = jax.jacfwd(resid, argnums=1)(U_star, x_at).reshape(N * udim, xdim)
    L = -jnp.linalg.solve(K + 1e-9 * jnp.eye(N * udim, dtype=U_star.dtype), g)
    return L.reshape(N, udim, xdim)


def all_sensitivity_L(dynamics, prob: SensProblem, U_star, X_star):
    """Gains for every step: list of (N, udim, xdim) arrays, entry t =
    dU*/dx_{t-1} (parity with ``root.py:163-171``)."""
    return [
        sensitivity_L(dynamics, prob, U_star, X_star, t=t) for t in range(U_star.shape[0])
    ]
