"""Dense second-order smooth solvers + the named-solver registry.

Role parity with the reference's experimental solver registry
(``pmpc/experimental/solver_definitions.py:25-28,92-105``) and its dense
second-order solvers (``pmpc/experimental/second_order_solvers.py``):

- ``CVX``  — damped Newton with Cholesky solves and a backtracking linesearch
  (the ``ConvexSolver`` role),
- ``SQP``  — same, plus an automatic Hessian-regularization search: bisection
  for (approximately) the smallest ``lam`` making ``H + lam I`` positive
  definite (the ``SQPSolver`` role, ``second_order_solvers.py:177-215``) —
  needed when a user ``diff_cost_fn`` makes the objective locally nonconvex,
- ``BFGS`` / ``LBFGS`` — first-order quasi-Newton (optax), in `barrier.py`.

These operate on the DENSE stacked variable z = [u_cons; u_free_1..M] exactly
like the reference's dense solvers operate on vec(U); the structured arrow
Newton in `barrier.py`/`ipm.py` remains the fast path.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils import with_matmul_precision


def positive_cholesky_factorization(H: jax.Array, lo: float = 1e-10, hi: float = 1e10,
                                    steps: int = 40):
    """(L, lam): Cholesky of ``H + lam I`` with (approximately) the smallest
    regularizer lam in [lo, hi] that makes it positive definite; lam = 0 is
    used when H itself factors. Log-space bisection, fixed step count
    (jit-friendly). Parity with ``second_order_solvers.py:177-215``."""
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=H.dtype)

    def ok(lam):
        L = jnp.linalg.cholesky(H + lam * eye)
        return jnp.all(jnp.isfinite(L))

    def body(_, carry):
        llo, lhi = carry  # log10 bounds: llo fails (or untested), lhi works
        mid = 0.5 * (llo + lhi)
        good = ok(10.0 ** mid)
        return (jnp.where(good, llo, mid), jnp.where(good, mid, lhi))

    base_ok = ok(jnp.asarray(0.0, H.dtype))
    llo0 = jnp.asarray(jnp.log10(lo), H.dtype)
    lhi0 = jnp.asarray(jnp.log10(hi), H.dtype)
    _, lhi = lax.fori_loop(0, steps, body, (llo0, lhi0))
    lam = jnp.where(base_ok, 0.0, 10.0 ** lhi)
    return jnp.linalg.cholesky(H + lam * eye), lam


def _chol_solve(L, b):
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@partial(jax.jit, static_argnames=("objective", "iters", "ls_steps", "regularized"))
@with_matmul_precision("highest")
def dense_newton_solve(
    objective: Callable,
    z0: jax.Array,
    obj_args: tuple = (),
    iters: int = 20,
    ls_steps: int = 25,
    regularized: bool = False,
):
    """Damped (possibly regularized) dense Newton on ``objective(z, *obj_args)``.

    ``objective`` is a STATIC callable (use a module-level function + traced
    ``obj_args`` so repeated calls hit the jit cache); ``regularized=False``
    is the ``ConvexSolver`` role (fixed tiny jitter); ``regularized=True`` the
    ``SQPSolver`` role (auto Hessian regularization).
    Returns (z, final objective value)."""
    dtype = z0.dtype

    def fval_of(z):
        return objective(z, *obj_args)

    def step(carry, _):
        z, fval = carry
        g = jax.grad(fval_of)(z)
        H = jax.hessian(fval_of)(z)
        if regularized:
            L, _lam = positive_cholesky_factorization(H)
        else:
            L = jnp.linalg.cholesky(H + 1e-10 * jnp.eye(z.shape[0], dtype=dtype))
        dz = -_chol_solve(L, g)
        # NaN factor (nonconvex point without regularization): gradient step
        dz = jnp.where(jnp.all(jnp.isfinite(dz)), dz, -g)

        def ls_body(k, best):
            t = 0.5 ** k
            f_t = fval_of(z + t * dz)
            better = f_t < best[0]
            return (jnp.where(better, f_t, best[0]), jnp.where(better, t, best[1]))

        f_best, t_best = lax.fori_loop(0, ls_steps, ls_body,
                                       (fval, jnp.asarray(0.0, dtype)))
        return (z + t_best * dz, f_best), None

    f0 = fval_of(z0)
    (z, fval), _ = lax.scan(step, (z0, f0), None, length=iters)
    return z, fval
