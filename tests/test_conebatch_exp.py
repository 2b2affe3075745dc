"""Exp-cone (logbarrier) scenario batching — split from test_conebatch so
the xdist loadscope scheduler can overlap this module's exp-barrier
centering (the suite's single most expensive test) with the rest of the
conebatch module."""

import numpy as np

import pmpc_tpu
from pmpc_tpu.batch import solve_problems
from test_conebatch import _mk_problem, _extras_row


def test_batched_logbarrier_matches_serial():
    """Logbarrier smoothing (exponential cones) now batches: the vmapped
    central-path barrier driver must match each problem's serial solve
    (role of cone_utils.jl:173-202 — exp-cone smoothing is a first-class
    reference mode, previously serial-only here)."""
    M, N, xdim, udim, Nc = 2, 6, 4, 2, 2
    B = 3
    probs = [dict(_mk_problem(i, M=M, N=N),
                  solver_settings=dict(
                      Nc=Nc, smooth_cstr="logbarrier", smooth_alpha=50.0,
                      extra_cstrs=[
                          _extras_row(M, N, xdim, udim, Nc, 0.2 + 0.05 * i)]))
             for i in range(B)]
    out = solve_problems(probs, fused=True)
    assert len(out) == B
    for i, (X, U, d) in enumerate(out):
        assert d["converged"], (i, d)
    # one problem against its serial path (same smoothing semantics); the
    # remaining problems are pinned by the batch's own convergence flags
    i = 2
    Xs, Us, ds = pmpc_tpu.solve(**{k: v for k, v in probs[i].items()})
    np.testing.assert_allclose(out[i][1], Us, atol=2e-3)
