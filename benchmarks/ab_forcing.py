"""A/B: inexact-Newton forcing cap on the fused path's early SCP iterations.

The adaptive rule tol = clip(1e-3 r^2, 0, CAP) gives every early iteration
(r >= 1) the same CAP; the first cold IPM burns ~12.7 iterations reaching it.
A looser CAP only affects iterations whose SCP residual is still large
(the quadratic forcing tightens later iterations identically), so final
accuracy at convergence is unchanged — candidate for cutting the ~40 IPM
iterations/solve. Measures headline throughput and the converged-answer
drift vs the tight setting.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(cap, B=64, reps=5):
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    M, N, xdim, udim, Nc = 32, 30, 4, 2, 5
    dtype = np.float32
    solver = build_scp_solver(
        _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=8, res_tol=1e-5, has_u_bounds=True,
        ipm_iters=15, jit=False, adaptive_cap=cap,
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
    resid = float(np.asarray(info["resid"]).max())
    # converged-answer drift: run the same config to convergence (max_it 30)
    solver_c = build_scp_solver(
        _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=30, res_tol=1e-5, has_u_bounds=True,
        ipm_iters=15, jit=False, adaptive_cap=cap)
    Xc, Uc, ic = jax.jit(jax.vmap(solver_c))(stack)
    return rate, resid, np.asarray(Uc), bool(np.asarray(ic["converged"]).all())


def main():
    U_ref = None
    for cap in (1e-3, 3e-3, 1e-2, 3e-2):
        rate, resid, Uc, conv = run(cap)
        drift = 0.0 if U_ref is None else float(np.abs(Uc - U_ref).max())
        if U_ref is None:
            U_ref = Uc
        print(f"cap={cap:7.0e}  {rate:7.1f} solves/s  resid@8={resid:.4f}  "
              f"converged_drift={drift:.2e}  conv={conv}", flush=True)


if __name__ == "__main__":
    main()
