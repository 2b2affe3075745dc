"""B=1 single-solve latency of the flagship config across methods."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.jax_scp import build_scp_solver
from __graft_entry__ import _flagship, _dubins


def main():
    print(f"platform={jax.default_backend()}")
    _, data = _flagship()
    N, xdim, udim, M = 30, 4, 2, 32
    for method in ("condensed", "riccati"):
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=5,
                             max_it=8, res_tol=1e-5, has_u_bounds=True,
                             ipm_iters=15, jit=True, method=method)
        X, U, info = s(data)
        _ = float(U.sum())
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            X, U, info = s(data)
            _ = float(U.sum())
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"  {method:10s}: p50 {ts[len(ts)//2]*1e3:7.1f} ms  "
              f"min {ts[0]*1e3:7.1f} ms  resid {float(info['resid']):.2e}")


if __name__ == "__main__":
    main()
