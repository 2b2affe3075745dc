"""A/B: seeding the first subproblem's IPM from the eq solution."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
from __graft_entry__ import _flagship, _dubins


def run(tag, N, M, B, d, Nc=5, ipm_iters=15):
    for eqw in (False, True):
        s = build_scp_solver(_dubins, N=N, xdim=4, udim=2, M=M, Nc=Nc,
                             max_it=8, res_tol=1e-5, has_u_bounds=True,
                             ipm_iters=ipm_iters, jit=False, collect_stats=True,
                             eq_warm_start=eqw)
        batched = jax.jit(jax.vmap(s))
        stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), d)
        rng = np.random.default_rng(1)
        x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(np.float32)
        stack = stack._replace(x0=jnp.asarray(x0))
        X, U, info = batched(stack)
        it = np.asarray(info["scan_stats"]["ipm_iters"])
        _ = float(U.sum())
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            X, U, info = batched(stack)
        _ = float(U.sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"  {tag} eq_warm={eqw}: {dt*1e3:7.1f} ms = {B/dt:7.1f} solves/s"
              f"  its {it.mean(axis=0).round(1)} total {it.sum(axis=1).mean():.1f}"
              f"  resid {np.median(np.asarray(info['resid'])):.2e}")


def main():
    print(f"platform={jax.default_backend()}")
    _, dflag = _flagship()
    run("N30/M32 B64 ", 30, 32, 64, dflag)

    M, N = 64, 50
    f32 = np.float32
    d5 = make_scp_data(np.ones((M, 4), f32),
                       np.tile(np.eye(4, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(2)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((M, N, 2), f32), u_u=np.ones((M, N, 2), f32))
    run("N50/M64 B32 ", 50, 64, 32, d5)


if __name__ == "__main__":
    main()
