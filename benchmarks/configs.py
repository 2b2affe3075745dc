"""BASELINE.json measurement configs 1-5: throughput + correctness signals.

Prints one JSON line per config. Config 5 (pod-scale 4096 scenarios x M=64) is
run at a reduced scenario count on a single chip (the full config is a
multi-host job); the per-chip number extrapolates linearly over the batch axis.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_solver(solver, data, B, reps=3):
    import jax
    import jax.numpy as jnp

    batched = jax.jit(jax.vmap(solver))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.02 * rng.normal(size=stack.x0.shape).astype(
        np.asarray(stack.x0).dtype)
    stack = stack._replace(x0=jnp.asarray(x0))
    X, U, info = batched(stack)
    _ = float(U.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        X, U, info = batched(stack)
    _ = float(U.sum())
    dt = time.perf_counter() - t0
    return B * reps / dt, np.asarray(U), np.asarray(info["resid"])


def main():
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    f32 = np.float32
    out = []

    def report(name, sps, extra):
        line = dict(config=name, solves_per_s=round(sps, 1), **extra)
        print(json.dumps(line), flush=True)
        out.append(line)

    # 1: Dubins single-system quadratic MPC, N=20
    N, xdim, udim = 20, 4, 2
    d1 = make_scp_data(np.ones((1, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (1, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (1, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1)
    s1 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=1, Nc=0,
                          max_it=10, res_tol=1e-5, jit=False)
    sps, U, resid = bench_solver(s1, d1, B=512)
    report("1_dubins_single_N20", sps, dict(median_resid=float(np.median(resid))))

    # 2: particle consensus M=10, shared first control (Nc=1)
    M, N = 10, 20
    d2 = make_scp_data(np.ones((M, xdim), f32) + 0.05 * np.random.default_rng(0)
                       .normal(size=(M, xdim)).astype(f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1)
    s2 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=1,
                          max_it=10, res_tol=1e-5, jit=False)
    sps, U, resid = bench_solver(s2, d2, B=128)
    spread = float(np.ptp(U[:, :, :1, :], axis=1).max())
    report("2_consensus_M10_Nc1", sps, dict(consensus_spread=spread))

    # 3: linear (box) + second-order-cone constrained MPC: per-coordinate box
    # bounds AND a per-stage thrust cone ||u_j|| <= 0.9, both exact, both on
    # the fused structured-IPM path
    soc_r = 0.9
    d3 = make_scp_data(np.ones((1, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (1, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (1, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((1, N, udim), f32), u_u=np.ones((1, N, udim), f32),
                       u_soc_r=np.full((1, N), soc_r, f32))
    s3 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=1, Nc=0,
                          max_it=10, res_tol=1e-5, has_u_bounds=True,
                          has_u_soc=True, jit=False)
    sps, U, resid = bench_solver(s3, d3, B=512)
    report("3_box_plus_soc_constrained", sps,
           dict(u_max=float(np.abs(U).max()),
                u_norm_max=float(np.linalg.norm(U, axis=-1).max()), soc_r=soc_r))

    # 4: nonconvex custom cost (log-barrier obstacle via lin_cost_fn)
    obs = jnp.asarray(np.array([0.5, 0.5], f32))

    def lin_cost_fn(X_prev, U_prev, data):
        # gradient of -w*log(||p - obs||^2 + eps): pushes away from the obstacle
        p = X_prev[..., :2]
        diff = p - obs
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True) + 0.1
        cx_pos = -0.5 * 2.0 * diff / d2
        cx = jnp.concatenate([cx_pos, jnp.zeros_like(X_prev[..., 2:])], axis=-1)
        return cx, None

    s4 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=1, Nc=0,
                          max_it=12, res_tol=1e-5, lin_cost_fn=lin_cost_fn, jit=False)
    sps, U, resid = bench_solver(s4, d1, B=512)
    report("4_obstacle_lin_cost", sps, dict(median_resid=float(np.median(resid))))

    # 5: pod-scale shape (M=64, N=50, Nc=5, bounded) at reduced B on one chip
    M, N = 64, 50
    d5 = make_scp_data(np.ones((M, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((M, N, udim), f32), u_u=np.ones((M, N, udim), f32))
    s5 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=5,
                          max_it=8, res_tol=1e-5, has_u_bounds=True,
                          ipm_iters=15, jit=False)
    B5 = int(os.environ.get("PMPC_CFG5_B", "32"))  # sweep: 8->74, 16->71, 32->80, 64->68 solves/s
    sps, U, resid = bench_solver(s5, d5, B=B5, reps=2)
    report("5_podscale_M64_N50_per_chip", sps,
           dict(B_per_chip=B5, note="full 4096-scenario config is a multi-host job"))


if __name__ == "__main__":
    main()
