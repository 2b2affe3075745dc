"""Round-5 final headline knob check: B-sweep and ipm_iters at the new code
balance (assembly rewrite + VPU step moved the per-iteration split; verify
B=64/ipm8 is still the operating point)."""

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

    def run(tag, B, **over):
        kw = dict(HEADLINE_KW, **over)
        solver, data = _flagship(**kw)
        batched = jax.jit(jax.vmap(solver))
        stack = _stack_varied(data, B)
        dt, info = _timed(batched, stack, 5)
        conv = np.asarray(info["converged"])
        print(json.dumps(dict(
            variant=tag, B=B,
            converged_solves_per_s=round(float(conv.sum() * 5 / dt), 1),
            frac=round(float(conv.mean()), 4),
            it_med=float(np.median(np.asarray(info["iters"]))))), flush=True)

    for B in (48, 64, 96, 128):
        run(f"B{B}", B)
    for ipm in (7, 9):
        run(f"ipm{ipm}", 64, ipm_iters=ipm)


if __name__ == "__main__":
    main()
