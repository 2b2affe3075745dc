"""Scenario-batched cone solves (extras / CVaR / u_soc_r / Hf) vs serial.

The reference solves cone-featured problems strictly serially; pmpc_tpu's
`conebatch.solve_problems_cone` runs B of them with ONE vmapped device cone
solve per SCP iteration — these tests pin the batch == serial contract and
the per-problem failure isolation."""

import numpy as np
import pytest

import pmpc_tpu
from pmpc_tpu.batch import solve_problems
from fixtures import unicycle_step


def _mk_problem(seed, M=3, N=8, xdim=4, udim=2, **ss):
    f_fn = pmpc_tpu.make_f_fx_fu_fn(unicycle_step)
    rng = np.random.default_rng(seed)
    x0 = np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))
    return dict(
        f_fx_fu_fn=f_fn,
        Q=np.tile(np.eye(xdim), (M, N, 1, 1)),
        R=np.tile(1e-2 * np.eye(udim), (M, N, 1, 1)),
        x0=x0, max_it=20, res_tol=5e-4,
        u_l=-np.ones((M, N, udim)), u_u=np.ones((M, N, udim)),
        solver_settings=dict(Nc=3, **ss))


def _extras_row(M, N, xdim, udim, Nc, rhs):
    nu_total = Nc * udim + M * (N - Nc) * udim
    n_full = nu_total + M * N * xdim
    g = np.zeros((1, n_full))
    g[0, :udim] = 1.0
    return (1, [], 0, g, np.zeros((1, 0)), np.array([rhs]),
            np.zeros(n_full), np.zeros(0))


def test_batched_extras_matches_serial():
    """Per-problem extras numerics differ across the batch; each problem's
    batched solution matches its serial solve and respects its own row."""
    M, N, xdim, udim, Nc = 3, 8, 4, 2, 3
    B = 5
    probs = [dict(_mk_problem(i, M=M, N=N),
                  solver_settings=dict(
                      Nc=Nc, extra_cstrs=[
                          _extras_row(M, N, xdim, udim, Nc, 0.1 + 0.03 * i)]))
             for i in range(B)]
    out = solve_problems(probs, fused=True)
    assert len(out) == B
    for i, (X, U, d) in enumerate(out):
        assert d["converged"], (i, d)
        assert U[0, 0].sum() <= 0.1 + 0.03 * i + 1e-5
    # spot-check one problem against the serial path
    i = 2
    Xs, Us, ds = pmpc_tpu.solve(**{k: v for k, v in probs[i].items()})
    np.testing.assert_allclose(out[i][1], Us, atol=1e-4)


def test_batched_failure_isolated_per_problem():
    """An infeasible problem in the batch fails alone (scp failure contract:
    its triple is (None, None, None)); the rest converge normally."""
    M, N, xdim, udim, Nc = 2, 6, 4, 2, 2
    B = 4
    probs = []
    for i in range(B):
        rhs = 0.3 if i != 2 else -50.0  # sum u_0 <= -50 with u >= -1: infeasible
        probs.append(dict(
            _mk_problem(20 + i, M=M, N=N),
            solver_settings=dict(
                Nc=Nc,
                extra_cstrs=[_extras_row(M, N, xdim, udim, Nc, rhs)])))
    out = solve_problems(probs, fused=True)
    assert out[2] == (None, None, None)
    for i in (0, 1, 3):
        X, U, d = out[i]
        assert d["converged"], (i, d)
        assert U[0, 0].sum() <= 0.3 + 1e-5


def test_batched_signature_mismatch_raises():
    M, N, xdim, udim, Nc = 2, 6, 4, 2, 2
    p1 = dict(_mk_problem(1, M=M, N=N), solver_settings=dict(
        Nc=Nc, extra_cstrs=[_extras_row(M, N, xdim, udim, Nc, 0.3)]))
    ec2 = _extras_row(M, N, xdim, udim, Nc, 0.3)
    ec2 = (2, [], 0, np.vstack([ec2[3], ec2[3]]), np.zeros((2, 0)),
           np.array([0.3, 0.4]), ec2[6], ec2[7])
    p2 = dict(_mk_problem(2, M=M, N=N), solver_settings=dict(
        Nc=Nc, extra_cstrs=[ec2]))
    with pytest.raises(ValueError, match="signature"):
        solve_problems([p1, p2], fused=True)
