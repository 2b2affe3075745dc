"""A/B: IPM fraction-to-boundary tau on the flagship config (iters + time)."""

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

B = int(os.environ.get("PMPC_BENCH_B", "64"))


def main():
    print(f"platform={jax.default_backend()} B={B}")
    _, data = _flagship()
    N, xdim, udim, M = 30, 4, 2, 32
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(np.float32)
    stack = stack._replace(x0=jnp.asarray(x0))

    for tau in (None, 0.995, 0.999):
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=5,
                             max_it=8, res_tol=1e-5, has_u_bounds=True,
                             ipm_iters=15, jit=False, collect_stats=True,
                             ipm_tau=tau)
        batched = jax.jit(jax.vmap(s))
        X, U, info = batched(stack)
        it = np.asarray(info["scan_stats"]["ipm_iters"])
        _ = float(U.sum())
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            X, U, info = batched(stack)
        _ = float(U.sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"  tau={tau}: {dt*1e3:7.1f} ms/call = {B/dt:7.1f} solves/s  "
              f"ipm its/scp it {it.mean(axis=0).round(2)} total {it.sum(axis=1).mean():.1f}  "
              f"resid_med {np.median(np.asarray(info['resid'])):.2e}")


if __name__ == "__main__":
    main()
