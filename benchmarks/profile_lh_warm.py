"""Long-horizon warm-latency decomposition (round-5 #3, probe 2).

The 0.47-0.53 s/SCP-iteration at N in {140, 280} is N-INDEPENDENT, so it is
not the riccati scans. Split it: raw jitted riccati_ipm_solve_np call
(device + dispatch + packed pull) vs the host loop's per-iteration work
(torch linearize, conversions), and the inner IPM iteration count.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn
    from pmpc_tpu.solvers.riccati_ipm import riccati_ipm_solve_np

    N, xdim, udim = 280, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    kw = dict(res_tol=1e-3, verbose=False, max_it=6,
              u_l=-np.ones((N, udim)), u_u=np.ones((N, udim)),
              x_l=-np.full((N, xdim), 6.0), x_u=np.full((N, xdim), 6.0),
              slew_reg=0.1, time_limit=1e6,
              solver_settings=dict(method="riccati"))
    X, U, d = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), **kw)  # warm compile
    t0 = time.time()
    X, U, d = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), **kw)
    t_solve = time.time() - t0
    taff = d["t_aff_solve"]
    print(json.dumps(dict(piece="host_loop_6it", s=round(t_solve, 2),
                          t_aff=[round(t, 3) for t in taff])), flush=True)

    # host linearize cost (torch fixture)
    Xl = np.tile(np.ones(xdim), (N, 1))
    Ul = np.zeros((N, udim))
    t0 = time.time()
    for _ in range(5):
        f, fx, fu = f_fn(Xl, Ul)
    print(json.dumps(dict(piece="torch_linearize",
                          ms=round((time.time() - t0) / 5 * 1e3, 1))),
          flush=True)

    # raw solver-call latency at fixed inputs (warm program)
    M = 1
    base_args = tuple(np.asarray(a, np.float32)[None] if a.ndim < 3 else
                      np.asarray(a, np.float32)[None]
                      for a in (np.ones(xdim), f, fx, fu, Xl, Ul, Q, R,
                                np.zeros((N, xdim)), np.zeros((N, udim))))
    reg_args = (np.ones(M, np.float32), np.full(M, 1e-2, np.float32),
                np.full(M, 0.1, np.float32), np.zeros(M, np.float32),
                np.zeros((M, udim), np.float32))
    s = dict()
    args = dict(u_l=np.asarray(kw["u_l"], np.float32)[None],
                u_u=np.asarray(kw["u_u"], np.float32)[None],
                x_l=np.asarray(kw["x_l"], np.float32)[None],
                x_u=np.asarray(kw["x_u"], np.float32)[None])
    X1, U1, dd = riccati_ipm_solve_np(base_args, reg_args, args["u_l"],
                                      args["u_u"], Nc=0, settings=s,
                                      x_l=args["x_l"], x_u=args["x_u"])
    t0 = time.time()
    for _ in range(5):
        X1, U1, dd = riccati_ipm_solve_np(base_args, reg_args, args["u_l"],
                                          args["u_u"], Nc=0, settings=s,
                                          x_l=args["x_l"], x_u=args["x_u"])
    print(json.dumps(dict(piece="raw_riccati_call",
                          ms=round((time.time() - t0) / 5 * 1e3, 1),
                          ipm_iters=dd["ipm_iters"],
                          converged=dd["ipm_converged"])), flush=True)


if __name__ == "__main__":
    main()
