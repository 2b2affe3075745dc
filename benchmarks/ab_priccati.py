"""Parallel-in-time (associative-scan) vs sequential Riccati vs condensed.

Eq-only (no bounds) SCP at long horizons: the sequential riccati sweep is
latency-bound (N dependent steps of tiny matmuls); the priccati path runs the
same value recursion as a suffix associative scan (O(log N) depth). Sweep N
at fixed M/Nc/B. Writes benchmarks/ab_priccati_out.txt."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ab_priccati_out.txt")
_lines = []


def log(msg):
    _lines.append(str(msg))
    print(msg, flush=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(_lines) + "\n")


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from __graft_entry__ import _dubins

    f32 = np.float32
    M, xdim, udim, Nc = 8, 4, 2, 5
    B = 16
    log(f"platform={jax.devices()[0].platform} M={M} Nc={Nc} B={B} eq-only")

    sols = {}

    def bench(method, N, reps=3):
        d = make_scp_data(np.ones((M, xdim), f32),
                          np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                          np.tile((1e-2 * np.eye(udim)).astype(f32),
                                  (M, N, 1, 1)),
                          reg_x=1.0, reg_u=0.1)
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
                             max_it=8, res_tol=1e-5, method=method, jit=False)
        fn = jax.jit(jax.vmap(s))
        stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), d)
        rng = np.random.default_rng(1)
        x0 = np.asarray(stack.x0) + 0.02 * rng.normal(
            size=stack.x0.shape).astype(f32)
        stack = stack._replace(x0=jnp.asarray(x0))
        t0 = time.perf_counter()
        X, U, info = fn(stack)
        _ = float(U.sum())
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            X, U, info = fn(stack)
        _ = float(U.sum())
        dt = (time.perf_counter() - t0) / reps
        sols[(method, N)] = np.asarray(U)
        log(f"  {method:10s} N={N:4d}: {dt*1e3:9.1f} ms/call = "
            f"{B/dt:7.1f} solves/s (compile {t_compile:.0f}s, "
            f"resid_med={np.median(np.asarray(info['resid'])):.2e}, "
            f"|U|max={np.abs(np.asarray(U)).max():.4f})")
        return B / dt

    for N in (50, 120, 240, 480):
        r_c = bench("condensed", N)
        r_r = bench("riccati", N)
        r_p = bench("priccati", N)
        dU = np.abs(sols[("priccati", N)] - sols[("riccati", N)]).max()
        log(f"  -> N={N}: priccati/riccati = {r_p/r_r:.2f}x, "
            f"priccati/condensed = {r_p/r_c:.2f}x, |dU|max = {dU:.2e}")

    log("done")


if __name__ == "__main__":
    main()
