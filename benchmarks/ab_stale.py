"""A/B: stale-Jacobian sub-iterations on the headline config (round-5 #1).

The per-SCP-iteration profile (profile_condense4_out.txt) splits 13.2 ms
into ~5.0 ms assembly + 8.1 ms IPM. A stale sub-iteration keeps the affine
map (Ft, g) and Hessian blocks and refreshes only the prox/ref linear terms
(`reduced.update_condensed_linear`), so it costs ~8.3 ms instead of 13.2.
If the sub-iteration count stays close to the fresh count, throughput rises
by up to ~1.25x; if stale steps stall the contraction, it loses. Measured
headline-style (CONVERGED solves/s, resid<=1e-3, B=64, AA on).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import pmpc_tpu  # noqa: F401
    from __graft_entry__ import _flagship
    from bench import HEADLINE_KW, _stack_varied, _timed

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    reps = 5
    for stale in (0, 1, 2):
        kw = dict(HEADLINE_KW)
        if stale:
            kw["relin_stale"] = stale
            # keep the TOTAL subproblem budget comparable: max_it counts
            # sub-steps and the while_loop checks between super-iterations
            kw["max_it"] = (HEADLINE_KW["max_it"] + stale) // (1 + stale) \
                * (1 + stale) + stale
        solver, data = _flagship(**kw)
        batched = jax.jit(jax.vmap(solver))
        stack = _stack_varied(data, B)
        dt, info = _timed(batched, stack, reps)
        conv = np.asarray(info["converged"])
        resid = np.asarray(info["resid"], np.float64)
        print(json.dumps(dict(
            variant=f"relin_stale={stale}",
            converged_solves_per_s=round(float(conv.sum() * reps / dt), 1),
            converged_frac=round(float(conv.mean()), 4),
            it_med=float(np.median(np.asarray(info["iters"]))),
            resid_med=float(np.median(resid)),
            resid_max=float(resid.max()),
        )), flush=True)


if __name__ == "__main__":
    main()
