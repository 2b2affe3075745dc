"""A/B: Gondzio multiple centrality correctors in the fused box IPM.

Each extra corrector reuses the iteration's factorization (one extra
back-substitution) and targets outlier complementarity products — the classic
trade when the per-particle Cholesky dominates the IPM iteration (flagship
nf=50, pod-scale config-5 nf=90). Measures headline-style throughput, mean
IPM iterations, and solution agreement vs the no-corrector baseline at the
flagship (M=32, N=30) and config-5 (M=64, N=50) shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(tag, M, N, B, gondzio, cap=1e-3, reps=5, max_it=8):
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    xdim, udim, Nc = 4, 2, 5
    dtype = np.float32
    solver = build_scp_solver(
        _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=max_it, res_tol=1e-5, has_u_bounds=True,
        ipm_iters=15, jit=False, adaptive_cap=cap, ipm_gondzio=gondzio,
        collect_stats=True,
    )
    rng = np.random.default_rng(0)
    x0 = (np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))).astype(dtype)
    Q = np.tile(np.eye(xdim, dtype=dtype), (M, N, 1, 1))
    R = np.tile((1e-2 * np.eye(udim)).astype(dtype), (M, N, 1, 1))
    data = make_scp_data(
        x0, Q, R, reg_x=1.0, reg_u=0.1,
        u_l=-np.ones((M, N, udim), dtype=dtype),
        u_u=np.ones((M, N, udim), dtype=dtype))
    batched = jax.jit(jax.vmap(solver))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    rng = np.random.default_rng(1)
    stack = stack._replace(x0=jnp.asarray(
        np.asarray(stack.x0)
        + 0.05 * rng.normal(size=stack.x0.shape).astype(dtype)))
    X, U, info = batched(stack)
    _ = float(np.asarray(U).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        X, U, info = batched(stack)
    _ = float(np.asarray(U).sum())
    dt = time.perf_counter() - t0
    rate = B * reps / dt
    ipm_its = float(np.asarray(info["scan_stats"]["ipm_iters"], np.float64).mean(0).sum())
    resid = float(np.asarray(info["resid"]).max())
    print(f"{tag}: gondzio={gondzio} cap={cap:.0e}  {rate:7.1f} solves/s  "
          f"ipm_its/solve={ipm_its:.1f}  resid@{max_it}={resid:.4f}",
          flush=True)
    return np.asarray(U)


def main():
    for M, N, B, tag in ((32, 30, 64, "flagship"), (64, 50, 16, "config5")):
        U0 = run(tag, M, N, B, gondzio=0)
        for g in (1, 2):
            Ug = run(tag, M, N, B, gondzio=g)
            print(f"  |U(g={g}) - U(g=0)|_inf = {np.abs(Ug - U0).max():.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
