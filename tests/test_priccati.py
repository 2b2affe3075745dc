"""Parallel-in-time (associative-scan) Riccati vs the sequential sweeps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmpc_tpu.solvers.riccati import (
    riccati_solve_scp,
    riccati_consensus_solve,
    _scp_stage_terms,
    riccati_solve,
)
from pmpc_tpu.solvers.priccati import (
    priccati_solve,
    priccati_solve_scp,
    priccati_consensus_solve,
    affine_scan_rollout,
)

import oracle


def _rand_stage_problem(rng, N=17, xdim=3, udim=2):
    A = 0.9 * np.stack([np.eye(xdim) + 0.1 * rng.normal(size=(xdim, xdim))
                        for _ in range(N)])
    B = rng.normal(size=(N, xdim, udim))
    c = 0.1 * rng.normal(size=(N, xdim))
    Qt = np.stack([np.eye(xdim) + 0.5 * w @ w.T
                   for w in rng.normal(size=(N, xdim, 2))])
    Rt = np.stack([0.5 * np.eye(udim) + 0.2 * w @ w.T
                   for w in rng.normal(size=(N, udim, 1))])
    xt = rng.normal(size=(N, xdim))
    ut = rng.normal(size=(N, udim))
    x0 = rng.normal(size=(xdim,))
    return x0, c, A, B, Qt, xt, Rt, ut


def test_affine_scan_rollout_matches_loop():
    rng = np.random.default_rng(0)
    N, xdim = 13, 4
    F = 0.8 * rng.normal(size=(N, xdim, xdim))
    d = rng.normal(size=(N, xdim))
    x0 = rng.normal(size=(xdim,))
    X = np.asarray(affine_scan_rollout(jnp.asarray(F), jnp.asarray(d),
                                       jnp.asarray(x0)))
    x = x0
    for j in range(N):
        x = F[j] @ x + d[j]
        np.testing.assert_allclose(X[j], x, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("N", [1, 2, 7, 40])
def test_priccati_matches_sequential_riccati(N):
    rng = np.random.default_rng(3 + N)
    x0, c, A, B, Qt, xt, Rt, ut = _rand_stage_problem(rng, N=N)
    seq = riccati_solve(*map(jnp.asarray, (x0, c, A, B, Qt, xt, Rt, ut)))
    par = priccati_solve(*map(jnp.asarray, (x0, c, A, B, Qt, xt, Rt, ut)))
    np.testing.assert_allclose(np.asarray(par.U), np.asarray(seq.U),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(seq.X),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k),
                               rtol=1e-6, atol=1e-7)


def test_priccati_scp_matches_sequential():
    rng = np.random.default_rng(11)
    p = oracle.random_problem(rng, M=1, N=12, xdim=3, udim=2)
    args = [jnp.asarray(a[0]) for a in (
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"])]
    seq = riccati_solve_scp(*args, reg_x=1.0, reg_u=0.1)
    par = priccati_solve_scp(*args, reg_x=1.0, reg_u=0.1)
    np.testing.assert_allclose(np.asarray(par.U), np.asarray(seq.U),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("M,Nc", [(1, 0), (3, 0), (3, 2), (4, 5)])
def test_priccati_consensus_matches_sequential(M, Nc):
    rng = np.random.default_rng(29 + 10 * M + Nc)
    N = 9
    p = oracle.random_problem(rng, M=M, N=N, xdim=3, udim=2)
    args = [jnp.asarray(a) for a in (
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"])]
    reg_x = jnp.full((M,), 1.0)
    reg_u = jnp.full((M,), 0.1)
    Xs, Us = riccati_consensus_solve(*args, reg_x, reg_u, Nc=Nc)
    Xp, Up = priccati_consensus_solve(*args, reg_x, reg_u, Nc=Nc)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xs),
                               rtol=1e-6, atol=1e-8)
    if Nc:
        assert np.ptp(np.asarray(Up)[:, :Nc, :], axis=0).max() < 1e-9


def test_priccati_f32_accuracy_long_horizon():
    """f32 parallel combine tracks the f64 sequential sweep at N=160."""
    rng = np.random.default_rng(5)
    x0, c, A, B, Qt, xt, Rt, ut = _rand_stage_problem(rng, N=160)
    # stabilize: scale A to keep the rollout bounded over 160 steps
    A = 0.95 * A / np.maximum(1.0, np.abs(np.linalg.eigvals(A)).max(axis=-1)[:, None, None])
    ref = riccati_solve(*map(jnp.asarray, (x0, c, A, B, Qt, xt, Rt, ut)))
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    par = priccati_solve(*map(f32, (x0, c, A, B, Qt, xt, Rt, ut)))
    err = np.abs(np.asarray(par.U, np.float64) - np.asarray(ref.U)).max()
    scale = np.abs(np.asarray(ref.U)).max()
    assert err <= 2e-3 * max(1.0, scale), (err, scale)
