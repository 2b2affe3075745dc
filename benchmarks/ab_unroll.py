"""A/B: lax.scan unroll factor in the condense scan, config-5 shapes.

The condense scan is N sequential steps of tiny matmuls; at N=50 with
B*M=1024 lanes each step is dispatch/latency-bound. `unroll=k` trades
program size for k fewer sequential dispatches.

Run on the TPU: python benchmarks/ab_unroll.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401  (compile cache)
from pmpc_tpu.dynamics import condense

B, M, N, xdim, udim = 16, 64, 50, 4, 2


def make_inputs(rng):
    f = jnp.asarray(rng.normal(size=(B, M, N, xdim)).astype(np.float32))
    fx = jnp.asarray(
        (0.9 * np.eye(xdim) + 0.05 * rng.normal(size=(B, M, N, xdim, xdim))).astype(np.float32))
    fu = jnp.asarray(rng.normal(size=(B, M, N, xdim, udim)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, M, xdim)).astype(np.float32))
    Xp = jnp.asarray(rng.normal(size=(B, M, N, xdim)).astype(np.float32))
    Up = jnp.asarray(rng.normal(size=(B, M, N, udim)).astype(np.float32))
    return x0, f, fx, fu, Xp, Up


def bench(unroll, args, reps=20):
    fn = jax.jit(jax.vmap(jax.vmap(
        lambda *a: condense(*a, unroll=unroll))))
    Ft, ft = fn(*args)
    ref = float(Ft.sum() + ft.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        Ft, ft = fn(*args)
    _ = float(Ft.sum())
    dt = (time.perf_counter() - t0) / reps
    return dt, ref


def main():
    print(f"platform={jax.default_backend()} B={B} M={M} N={N}")
    rng = np.random.default_rng(0)
    args = make_inputs(rng)
    base = None
    for unroll in (1, 2, 5, 10, 25):
        dt, ref = bench(unroll, args)
        if base is None:
            base = ref
        ok = abs(ref - base) <= 1e-2 * max(1.0, abs(base))
        print(f"  unroll={unroll:3d}: {dt*1e3:8.2f} ms/call  (checksum ok={ok})")


if __name__ == "__main__":
    main()
