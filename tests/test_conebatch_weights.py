"""Particle weights in batched cone solves (own module so xdist loadscope
can overlap it with the rest of the conebatch battery — it carries two
serial cross-solves)."""

import numpy as np

import pmpc_tpu
from pmpc_tpu.batch import solve_problems
from test_conebatch import _mk_problem


def test_batched_weights_matches_serial():
    """Particle weights in batched cone solves (the round-4 gate is lifted):
    per-problem weight vectors pre-scale the cost arrays exactly like the
    serial path's scale_probs_cost! parity (main.jl:96-112) on BOTH batched
    routes — structured (u_soc) and composed (CVaR k-worst)."""
    M, N = 3, 8
    B = 3
    rng = np.random.default_rng(7)

    # structured route: boxes + control-norm cones, per-problem weights
    probs = []
    for i in range(B):
        w = 1.0 + rng.uniform(0.0, 2.0, size=M)
        p = _mk_problem(20 + i, M=M, N=N,
                        u_soc_r=np.full((M, N), 0.8), weights=w)
        probs.append(p)
    out = solve_problems(probs, fused=True)
    for i, (X, U, d) in enumerate(out):
        assert d["converged"], (i, d)
    i = 1
    Xs, Us, _ = pmpc_tpu.solve(**{k: v for k, v in probs[i].items()})
    np.testing.assert_allclose(out[i][1], Us, atol=2e-4)

    # composed route: CVaR k-worst + weights. Full consensus + k=M-1 is the
    # converging CVaR configuration (round-4 finding: with Nc<N the
    # non-worst particles' free tails are gradient-free and the SCP wanders
    # — a property of the reference formulation too, main.jl:221-232).
    M = 4
    probs = []
    for i in range(B):
        p = _mk_problem(30 + i, M=M, N=N, k=M - 1,
                        weights=1.0 + rng.uniform(0.0, 2.0, size=M))
        p["solver_settings"]["Nc"] = -1
        probs.append(p)
    out = solve_problems(probs, fused=True)
    for i, (X, U, d) in enumerate(out):
        assert d["converged"], (i, d)
        assert np.ptp(U, axis=0).max() < 1e-7  # full consensus
    i = 0
    Xs, Us, _ = pmpc_tpu.solve(**{k: v for k, v in probs[i].items()})
    np.testing.assert_allclose(out[i][1], Us, atol=2e-3)
