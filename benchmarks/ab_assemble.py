"""Isolated timing of assemble_condensed + solve pieces at config-5 shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.solvers.reduced import assemble_condensed, solve_eq, recover_XU

B, M, N, xdim, udim, Nc = 16, 64, 50, 4, 2, 5


def main():
    print(f"platform={jax.default_backend()} B={B} M={M} N={N} Nc={Nc}")
    rng = np.random.default_rng(0)
    f32 = np.float32
    f = jnp.asarray(rng.normal(size=(B, M, N, xdim)).astype(f32))
    fx = jnp.asarray((0.9 * np.eye(xdim) + 0.05 * rng.normal(size=(B, M, N, xdim, xdim))).astype(f32))
    fu = jnp.asarray(rng.normal(size=(B, M, N, xdim, udim)).astype(f32))
    x0 = jnp.asarray(rng.normal(size=(B, M, xdim)).astype(f32))
    Xp = jnp.asarray(rng.normal(size=(B, M, N, xdim)).astype(f32))
    Up = jnp.asarray(rng.normal(size=(B, M, N, udim)).astype(f32))
    Q = jnp.broadcast_to(jnp.eye(xdim, dtype=f32), (B, M, N, xdim, xdim))
    R = jnp.broadcast_to(0.1 * jnp.eye(udim, dtype=f32), (B, M, N, udim, udim))
    Xr = jnp.zeros((B, M, N, xdim), f32)
    Ur = jnp.zeros((B, M, N, udim), f32)
    ones = jnp.ones((B, M), f32)
    um1 = jnp.zeros((B, M, udim), f32)

    asm = jax.jit(jax.vmap(lambda *a: assemble_condensed(*a, Nc=Nc)))
    args = (x0, f, fx, fu, Xp, Up, Q, R, Xr, Ur, ones, 1e-2 * ones,
            0.0 * ones, 0.0 * ones, um1)
    cqp = asm(*args)
    _ = float(cqp.Hff.sum())
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        cqp = asm(*args)
    _ = float(cqp.Hff.sum())
    print(f"  assemble_condensed: {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/call")

    sol = jax.jit(jax.vmap(solve_eq))
    uc, uf = sol(cqp)
    _ = float(uf.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        uc, uf = sol(cqp)
    _ = float(uf.sum())
    print(f"  solve_eq:           {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/call")

    rec = jax.jit(jax.vmap(lambda c, a, b: recover_XU(c, a, b, N=N)))
    X, U = rec(cqp, uc, uf)
    _ = float(U.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        X, U = rec(cqp, uc, uf)
    _ = float(U.sum())
    print(f"  recover_XU:         {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
