"""General cone IPM (nonneg + SOC, NT scaling) vs scipy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.optimize as sopt

from pmpc_tpu.solvers.coneipm import ConeLP, cone_qp_solve


def _solve_oracle(P, q, Gl, hl, socs):
    """scipy trust-constr with nonlinear SOC constraints ||(Gz-h)[1:]|| <= -(Gz-h)[0]...

    Convention here: G v + s = h, s in SOC  =>  s = h - Gv in SOC."""
    n = P.shape[0]
    cons = []
    if Gl is not None and len(hl):
        cons.append(sopt.LinearConstraint(Gl, -np.inf, hl))
    for (Gq, hq) in socs:
        def make(Gq=Gq, hq=hq):
            def fn(v):
                s = hq - Gq @ v
                return s[0] - np.linalg.norm(s[1:])
            return fn
        cons.append(sopt.NonlinearConstraint(make(), 0.0, np.inf))
    res = sopt.minimize(
        lambda v: 0.5 * v @ P @ v + q @ v, np.zeros(n),
        jac=lambda v: P @ v + q,
        hess=lambda v: P,
        constraints=cons, method="trust-constr",
        options=dict(maxiter=5000, gtol=1e-12, xtol=1e-14),
    )
    assert res.status in (1, 2), res.message
    return res.x


def _pack(P, q, Gl, hl, socs, pmax=None):
    ncones = len(socs)
    pmax = pmax or max((g.shape[0] for g, _ in socs), default=1)
    nv = P.shape[0]
    Gq = np.zeros((max(ncones, 1), pmax, nv))
    hq = np.zeros((max(ncones, 1), pmax))
    for i, (g, h) in enumerate(socs):
        p = g.shape[0]
        Gq[i, :p] = g
        hq[i, :p] = h
    if ncones == 0:
        Gq = np.zeros((0, pmax, nv))
        hq = np.zeros((0, pmax))
    return ConeLP(
        P=jnp.asarray(P), q=jnp.asarray(q),
        Gl=jnp.asarray(Gl), hl=jnp.asarray(hl),
        Gq=jnp.asarray(Gq), hq=jnp.asarray(hq),
    )


def test_nonneg_only_matches_box_qp():
    rng = np.random.default_rng(0)
    n = 8
    A = rng.normal(size=(n, n))
    P = A @ A.T + np.eye(n)
    q = rng.normal(size=n)
    Gl = np.vstack([np.eye(n), -np.eye(n)])
    hl = 0.3 * np.ones(2 * n)
    prob = _pack(P, q, Gl, hl, socs=[])
    v, s, z, stats = cone_qp_solve(prob)
    assert bool(stats["converged"])
    v_o = _solve_oracle(P, q, Gl, hl, [])
    np.testing.assert_allclose(np.asarray(v), v_o, atol=1e-6)


def test_single_soc():
    """min quadratic s.t. ||v - c|| <= r  (ball constraint as SOC)."""
    rng = np.random.default_rng(1)
    n = 6
    A = rng.normal(size=(n, n))
    P = A @ A.T + np.eye(n)
    q = rng.normal(size=n) * 5
    c = rng.normal(size=n)
    r = 0.5
    # s = h - Gv in SOC with s0 = r, s1 = v - c:  G = [[0];[-I]], h = [r; -c]
    Gq = np.vstack([np.zeros((1, n)), -np.eye(n)])
    hq = np.concatenate([[r], -c])
    prob = _pack(P, q, np.zeros((0, n)), np.zeros(0), socs=[(Gq, hq)])
    v, s, z, stats = cone_qp_solve(prob)
    assert bool(stats["converged"]), float(stats["mu"])
    v_o = _solve_oracle(P, q, None, [], [(Gq, hq)])
    np.testing.assert_allclose(np.asarray(v), v_o, atol=1e-5)
    assert np.linalg.norm(np.asarray(v) - c) <= r + 1e-6


def test_mixed_nonneg_and_padded_socs():
    rng = np.random.default_rng(2)
    n = 7
    A = rng.normal(size=(n, n))
    P = A @ A.T + np.eye(n)
    q = rng.normal(size=n) * 3
    Gl = -np.eye(n)[:3]  # v[:3] >= -0.2
    hl = 0.2 * np.ones(3)
    c1 = rng.normal(size=2)
    G1 = np.vstack([np.zeros((1, n)), -np.eye(n)[:2]])
    h1 = np.concatenate([[0.7], -c1])  # ||v[:2]-c1|| <= 0.7 (size-3 cone)
    G2 = np.vstack([np.zeros((1, n)), -np.eye(n)[2:6]])
    h2 = np.concatenate([[1.0], np.zeros(4)])  # ||v[2:6]|| <= 1 (size-5 cone)
    prob = _pack(P, q, Gl, hl, socs=[(G1, h1), (G2, h2)])  # padded to 5
    v, s, z, stats = cone_qp_solve(prob)
    assert bool(stats["converged"])
    v_o = _solve_oracle(P, q, Gl, hl, [(G1, h1), (G2, h2)])
    np.testing.assert_allclose(np.asarray(v), v_o, atol=1e-4)
