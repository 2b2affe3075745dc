"""Long-horizon cliff characterization + unroll A/B (round-5 task #3).

Round-4 artifact (long_horizon_xbox_out.txt): N=280 state-boxed+slew cold
solve 1131 s (~19 min compile through the remote toolchain), warm 26.6 s
~= 0.6 s/SCP-iteration. Hypothesis: warm latency is riccati scan-step
overhead at M=1 (tiny per-step tensors, ~6-8 scans of length N per IPM
iteration, ~27 us/step); `riccati_unroll` amortizes the loop overhead.

For (N, unroll) combinations: time the FIRST host-loop solve (compile +
max_it=3 iterations), then a warm solve (max_it=12), and report
compile-time estimate, warm s/SCP-iteration (t_aff median), and host
overhead. Prints one JSON line each. Real chip; fresh jit keys per (N,
unroll) static pair so compiles are honest.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def run(N, unroll):
    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn

    xdim, udim = 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    kw = dict(
        res_tol=1e-3, verbose=False,
        u_l=-np.ones((N, udim)), u_u=np.ones((N, udim)),
        x_l=-np.full((N, xdim), 6.0), x_u=np.full((N, xdim), 6.0),
        slew_reg=0.1, time_limit=1e6,
        solver_settings=dict(riccati_unroll=unroll, method="riccati"),
    )
    t0 = time.time()
    X, U, d = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), max_it=3, **kw)
    t_first = time.time() - t0
    t0 = time.time()
    X, U, d = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), max_it=12, **kw)
    t_warm = time.time() - t0
    taff = [t for t in d["t_aff_solve"]]
    it_s = float(np.median(taff))
    print(json.dumps(dict(
        piece=f"N{N}_unroll{unroll}",
        first_call_s=round(t_first, 1),
        compile_est_s=round(t_first - 3 * it_s, 1),
        warm_s=round(t_warm, 2),
        s_per_scp_it=round(it_s, 3),
        host_overhead_s=round(t_warm - sum(taff), 2),
        resid=float(d["hist"][-1]["resid"]),
    )), flush=True)


if __name__ == "__main__":
    order = [(140, 1), (140, 8), (280, 8), (280, 1)]
    only = os.environ.get("PMPC_LH_ONLY")
    if only:
        order = [tuple(map(int, x.split(":"))) for x in only.split(",")]
    for N, unroll in order:
        run(N, unroll)
