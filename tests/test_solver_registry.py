"""Named smooth-solver registry parity: BFGS / LBFGS / CVX / SQP.

Role parity with the reference's solver instances
(``pmpc/experimental/solver_definitions.py:25-28``) and the SQP automatic
Hessian regularization (``second_order_solvers.py:177-215``). All four named
solvers must agree on the logbarrier-smoothed bounded problem; SQP must also
survive a locally nonconvex diff_cost_fn.
"""

import numpy as np
import pytest

import pmpc_tpu
from fixtures import dubins_f_fx_fu_fn


def _solve(solver_name=None, diff_cost_fn=None, **kw):
    N, xdim, udim = 8, 4, 2
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    ss = dict(smooth_cstr="logbarrier", smooth_alpha=30.0)
    if solver_name:
        ss["solver"] = solver_name
    if diff_cost_fn is not None:
        ss["diff_cost_fn"] = diff_cost_fn
    return pmpc_tpu.solve(
        dubins_f_fx_fu_fn(), Q, R, np.ones(xdim),
        u_l=-0.7 * np.ones((N, udim)), u_u=0.7 * np.ones((N, udim)),
        reg_x=1.0, reg_u=0.1, max_it=6, res_tol=0.0, verbose=False,
        solver_settings=ss, **kw,
    )


def test_named_solvers_agree():
    X0, U0, _ = _solve()  # central-path IPM (the default smooth path)
    for name in ("CVX", "SQP", "BFGS", "LBFGS"):
        X, U, data = _solve(name)
        err = np.abs(U - U0).max()
        assert err < 5e-3, f"{name}: |U - U_ipm|_inf = {err:.2e}"


def test_sqp_handles_nonconvex_extra_cost():
    """A locally concave extra cost makes the Hessian indefinite away from the
    optimum; SQP's regularization search must still converge."""
    import jax.numpy as jnp

    def diff_cost_fn(X, U):
        # concave bump around the origin of the position coordinates
        p = X[..., :2]
        return -2.0 * jnp.sum(jnp.exp(-jnp.sum(p * p, axis=-1)))

    X, U, data = _solve("SQP", diff_cost_fn=diff_cost_fn)
    assert X is not None and np.isfinite(U).all()
    assert np.abs(U).max() <= 0.7 + 1e-3  # smoothed bounds still respected-ish


def test_positive_cholesky_factorization():
    from pmpc_tpu.solvers.second_order import positive_cholesky_factorization
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6))
    H_pd = A @ A.T + np.eye(6)
    L, lam = positive_cholesky_factorization(jnp.asarray(H_pd))
    assert float(lam) == 0.0
    np.testing.assert_allclose(np.asarray(L) @ np.asarray(L).T, H_pd, atol=1e-8)

    H_indef = H_pd - 20.0 * np.eye(6)
    L, lam = positive_cholesky_factorization(jnp.asarray(H_indef))
    lam = float(lam)
    assert lam > 0 and np.isfinite(np.asarray(L)).all()
    # lam is (close to) the smallest PD-making shift
    w_min = np.linalg.eigvalsh(H_indef).min()
    assert lam >= -w_min - 1e-6
    assert lam <= 4.0 * max(-w_min, 1e-10), (lam, w_min)


def test_diff_cost_fn_closure_does_not_recompile():
    """Equal-code closures canonicalize to one object (cloudpickle hash), so
    the jitted smooth solver is compiled once across SCP iterations."""
    from pmpc_tpu.solvers.barrier import canonical_fn

    def make():
        scale = 2.0

        def fn(X, U):
            return scale * (X.sum() + U.sum())

        return fn

    f1, f2 = make(), make()
    assert f1 is not f2
    assert canonical_fn(f1) is canonical_fn(f2)
