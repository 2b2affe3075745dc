"""Fused-path long-horizon latency (round-5 #3, probe 3).

The host-API warm latency decomposed as 0.27 s/iteration of TORCH callback
linearization (reference-parity arbitrary-Python path — the reference pays
this too) + ~0.1-0.15 s device + overhead. The fused solver (JAX dynamics
protocol) runs linearize+IPM on device with zero per-iteration host
traffic: this measures its per-SCP-iteration cost at N=280 (state boxes +
slew, M=1, f32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    N, xdim, udim, M = 280, 4, 2, 1
    f32 = np.float32
    for max_it in (4, 12):
        solver = build_scp_solver(
            _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=0,
            max_it=max_it, res_tol=1e-9,  # never early-exit: fixed its
            has_u_bounds=True, has_x_bounds=True, has_slew=True,
            method="riccati", ipm_iters=8)
        data = make_scp_data(
            np.ones((M, xdim), f32),
            np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
            np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
            reg_x=1.0, reg_u=0.1, slew_reg=0.1,
            u_l=-np.ones((M, N, udim), f32), u_u=np.ones((M, N, udim), f32),
            x_l=-np.full((M, N, xdim), 6.0, f32),
            x_u=np.full((M, N, xdim), 6.0, f32))
        t0 = time.time()
        X, U, info = solver(data)
        _ = float(np.asarray(U).sum())
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            X, U, info = solver(data)
        _ = float(np.asarray(U).sum())
        t_warm = (time.time() - t0) / 3
        print(json.dumps(dict(
            piece=f"fused_N280_maxit{max_it}",
            first_s=round(t_first, 1), warm_s=round(t_warm, 3),
            resid=float(np.asarray(info["resid"])),
            iters=int(np.asarray(info["iters"])))), flush=True)
    # marginal per-SCP-iteration from the two fixed budgets
    # (printed rows; compute externally: (warm12 - warm4) / 8)


if __name__ == "__main__":
    main()
