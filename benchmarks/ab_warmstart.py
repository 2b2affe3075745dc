"""A/B: closed-loop warm-start depth (round-5 task #8).

Round-4 receding-horizon artifact: warm median 11 SCP iterations per control
step (target <=6). Variants on the same 30-step tracking loop
(examples/receding_horizon.closed_loop_fused, N=20, moving target):

  baseline       shift-init + IPM dual carry (round-4 config)
  +AA            device-loop Anderson acceleration added
  no_shift       X_prev/U_prev NOT shifted (cold linearization point)
  no_duals       IPM state not carried across steps
  +AA tol5e-4    AA with the f32 closed-loop envelope tolerance

Reports per variant: warm-step median/p90 SCP iterations, warm p50 ms,
closed-loop Hz (1/p50), final tracking error. Real chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import numpy as np


def main():
    import pmpc_tpu  # noqa: F401
    from receding_horizon import closed_loop_fused

    N, T, xdim, udim = 20, 30, 4, 2

    variants = [
        ("baseline_shift_duals", dict()),
        ("plus_AA", dict(accel="AA")),
        ("no_shift", dict(shift_warm=False)),
        ("no_duals", dict(carry_duals=False)),
        ("AA_tol5e-4", dict(accel="AA", res_tol=5e-4)),
    ]
    for tag, kw in variants:
        t0 = time.perf_counter()
        times_ms, errs, iters = closed_loop_fused(
            N, T, xdim, udim, quiet=True, **kw)
        warm_it = np.asarray(iters[1:])
        warm_ms = np.asarray(times_ms[1:])
        print(json.dumps(dict(
            variant=tag,
            cold_iters=int(iters[0]),
            warm_iters_median=float(np.median(warm_it)),
            warm_iters_p90=float(np.percentile(warm_it, 90)),
            warm_ms_p50=round(float(np.median(warm_ms)), 1),
            closed_loop_hz=round(1e3 / float(np.median(warm_ms)), 1),
            err_final=round(errs[-1], 3),
            total_s=round(time.perf_counter() - t0, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
