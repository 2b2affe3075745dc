"""A/B timing of IPM/condense variants on the flagship config (run serially on TPU)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_ipm_out.txt")
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
    from pmpc_tpu.jax_scp import build_scp_solver
    from __graft_entry__ import _dubins, _flagship

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    M, N, xdim, udim, Nc = 32, 30, 4, 2, 5
    _, data = _flagship()
    rng = np.random.default_rng(1)
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(np.float32)
    stack = stack._replace(x0=jnp.asarray(x0))

    def run(tag, reps=5, **kw):
        solver = build_scp_solver(
            _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
            max_it=8, res_tol=1e-5, has_u_bounds=True, jit=False,
            collect_stats=True, **kw,
        )
        fn = jax.jit(jax.vmap(solver))
        X, U, info = fn(stack)
        float(np.asarray(info["resid"]).sum())  # force
        t0 = time.perf_counter()
        for _ in range(reps):
            X, U, info = fn(stack)
        resid = float(np.asarray(info["resid"]).mean())
        dt = (time.perf_counter() - t0) / reps
        it_mat = np.asarray(info["scan_stats"]["ipm_iters"])
        log(f"{tag:42s}: {dt*1e3:7.2f} ms  {B/dt:7.1f} solves/s  "
            f"resid={resid:.2e}  ipm_its={np.mean(it_mat, axis=0).round(1).tolist()}")
        return np.asarray(U)

    log(f"platform={jax.devices()[0].platform} B={B}")
    U_tight = run("tight ref (iters=40, fixed tol)", ipm_iters=40, adaptive_tol=False)
    variants = dict(
        base_fixedtol=dict(ipm_iters=15, adaptive_tol=False),
        adaptive=dict(ipm_iters=15, adaptive_tol=True),
        adaptive_tau99=dict(ipm_iters=15, adaptive_tol=True, ipm_tau=0.99),
        fixedtol_tau99=dict(ipm_iters=15, adaptive_tol=False, ipm_tau=0.99),
    )
    for tag, kw in variants.items():
        U = run(tag, **kw)
        log(f"    |U - U_tight|_inf = {np.abs(U - U_tight).max():.2e}")

    log("done")


if __name__ == "__main__":
    main()
