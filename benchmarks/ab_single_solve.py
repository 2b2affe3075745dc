"""A/B: Mehrotra predictor-corrector vs single-solve heuristic-sigma IPM.

The round-4 roofline statement (roofline_headline_out.txt) concluded the
flagship is bound by sequential dispatch depth, suggesting "fewer solves per
IPM iteration" as a candidate lever.  ``ipm_core(predictor=False)`` tests the
strongest version of that idea: drop the affine probe entirely and take one
LOQO-sigma centering solve per iteration (factor + 1 solve instead of
factor + 2 solves).

Result (see ab_single_solve_out.txt): a decisively measured NEGATIVE.  The
affine probe's second-order information is worth far more than its chain
cost.  On a single CPU instance, single-solve mode already needs ~3x the
inner budget (ipm_iters 8 -> 24) and ~30% more SCP iterations (16 -> 21) to
reach 1e-3; on the B=64 varied-x0 chip batch it does not converge at all at
the max_it=30 cap (converged frac 0.33-0.38 vs 1.000, 30.8-34.9 vs 297.6
converged solves/s).  Mehrotra predictor-corrector stays the default; depth
cuts must come from fewer SCP iterations, not cheaper IPM steps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import pmpc_tpu  # noqa: F401  (compile cache)
from __graft_entry__ import _flagship
from bench import _stack_varied

B, REPS = 64, 5


def run(tag, **kw):
    solver, data = _flagship(**kw)
    batched = jax.jit(jax.vmap(solver))
    stack = _stack_varied(data, B)
    X, U, info = batched(stack)
    _ = float(U.sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        X, U, info = batched(stack)
    _ = float(U.sum())
    dt = time.perf_counter() - t0
    conv = np.asarray(info["converged"])
    rate = conv.sum() * REPS / dt
    print(f"{tag:34s} {rate:7.1f} conv-solves/s  frac={conv.mean():.3f} "
          f"it_med={np.median(np.asarray(info['iters'])):.0f} "
          f"resid_max={np.asarray(info['resid']).max():.1e}")


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform} B={B} reps={REPS}")
    base = dict(max_it=30, res_tol=1e-3, accel="AA")
    run("mehrotra ipm=8 (headline)", ipm_iters=8, **base)
    run("single-solve ipm=24", ipm_iters=24, ipm_predictor=False, **base)
    run("single-solve ipm=16", ipm_iters=16, ipm_predictor=False, **base)
