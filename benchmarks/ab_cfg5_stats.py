"""Config-5 IPM iteration counts + time split (collect_stats run)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
from __graft_entry__ import _dubins

f32 = np.float32
M, N, xdim, udim = 64, 50, 4, 2
B = int(os.environ.get("PMPC_CFG5_B", "16"))


def main():
    print(f"platform={jax.default_backend()} B={B} M={M} N={N}")
    d5 = make_scp_data(np.ones((M, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((M, N, udim), f32),
                       u_u=np.ones((M, N, udim), f32))
    s5 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=5,
                          max_it=8, res_tol=1e-5, has_u_bounds=True,
                          ipm_iters=15, jit=False, collect_stats=True)
    batched = jax.jit(jax.vmap(s5))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), d5)
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.02 * rng.normal(size=stack.x0.shape).astype(f32)
    stack = stack._replace(x0=jnp.asarray(x0))
    X, U, info = batched(stack)
    it = np.asarray(info["scan_stats"]["ipm_iters"])  # (B, max_it)
    _ = float(U.sum())
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        X, U, info = batched(stack)
    _ = float(U.sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"  full solve: {dt*1e3:.1f} ms/call = {B/dt:.1f} solves/s")
    print(f"  ipm iters per SCP it (mean over batch): {it.mean(axis=0).round(2)}")
    print(f"  ipm iters max: {it.max(axis=0)}, total mean {it.sum(axis=1).mean():.1f}")
    print(f"  resid: {np.median(np.asarray(info['resid'])):.2e}")


if __name__ == "__main__":
    main()
