"""Stage breakdown of the pod-scale config 5 (M=64, N=50, Nc=5, bounded).

Where does the 305 ms/batched-call go at the long-horizon shape? Times the
full fused solve vs SCP count, the isolated condense+assemble, the isolated
IPM at the config-5 shape, and the eq-only path. Host-forced reads (the axon
tunnel's block_until_ready returns early). Writes benchmarks/profile_cfg5_out.txt.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile_cfg5_out.txt")
_lines = []


def log(msg):
    _lines.append(str(msg))
    print(msg, flush=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(_lines) + "\n")


def _force(out):
    import jax

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(np.asarray(leaves[-1]).ravel()[0]) if leaves else None
    for x in leaves:
        jax.block_until_ready(x)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from pmpc_tpu.dynamics import linearize
    from pmpc_tpu.solvers.ipm import BoxBounds, ipm_core
    from pmpc_tpu.solvers.reduced import assemble_condensed, solve_eq
    from pmpc_tpu.utils import with_matmul_precision
    from __graft_entry__ import _dubins

    f32 = np.float32
    M, N, xdim, udim, Nc = 64, 50, 4, 2, 5
    B = int(os.environ.get("PMPC_CFG5_B", "16"))
    log(f"platform={jax.devices()[0].platform} B={B} M={M} N={N} Nc={Nc}")

    d5 = make_scp_data(np.ones((M, xdim), f32),
                       np.tile(np.eye(xdim, dtype=f32), (M, N, 1, 1)),
                       np.tile((1e-2 * np.eye(udim)).astype(f32), (M, N, 1, 1)),
                       reg_x=1.0, reg_u=0.1,
                       u_l=-np.ones((M, N, udim), f32),
                       u_u=np.ones((M, N, udim), f32))
    rng = np.random.default_rng(1)
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), d5)
    x0 = np.asarray(stack.x0) + 0.02 * rng.normal(size=stack.x0.shape).astype(f32)
    stack = stack._replace(x0=jnp.asarray(x0))

    # 1. full fused solve vs SCP count (slope = ms per SCP iteration)
    log("\n== full fused bounded solve vs max_it ==")
    ts = {}
    for max_it in (1, 2, 4, 8):
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
                             max_it=max_it, res_tol=1e-5, has_u_bounds=True,
                             ipm_iters=15, jit=False)
        fn = jax.jit(jax.vmap(s))
        ts[max_it] = timeit(fn, stack)
        log(f"  max_it={max_it}: {ts[max_it]*1e3:8.1f} ms/call")
    log(f"  slope 4->8: {(ts[8]-ts[4])/4*1e3:.1f} ms per SCP it")

    # 2. eq-only path (no IPM) at the same shape
    log("\n== eq-only (no bounds) vs max_it ==")
    for max_it in (4, 8):
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
                             max_it=max_it, res_tol=1e-5, jit=False)
        fn = jax.jit(jax.vmap(s))
        t = timeit(fn, stack)
        log(f"  max_it={max_it}: {t*1e3:8.1f} ms/call")

    # 2b. riccati eq path at the same shape
    log("\n== riccati eq path vs max_it ==")
    for max_it in (4, 8):
        s = build_scp_solver(_dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
                             max_it=max_it, res_tol=1e-5, method="riccati",
                             jit=False)
        fn = jax.jit(jax.vmap(s))
        t = timeit(fn, stack)
        log(f"  max_it={max_it}: {t*1e3:8.1f} ms/call")

    # 3. isolated condense+assemble at the config-5 shape
    log("\n== isolated stages ==")
    X_prev = jnp.zeros((B, M, N, xdim), f32)
    U_prev = jnp.zeros((B, M, N, udim), f32)

    @jax.jit
    @with_matmul_precision("highest")
    def lin(stack, X_prev, U_prev):
        def one(data, Xp, Up):
            X_ = jnp.concatenate([data.x0[:, None, :], Xp[:, :-1, :]], axis=1)
            return linearize(_dubins, X_, Up)
        return jax.vmap(one)(stack, X_prev, U_prev)

    f, fx, fu = lin(stack, X_prev, U_prev)
    t = timeit(lin, stack, X_prev, U_prev)
    log(f"  linearize:          {t*1e3:8.1f} ms")

    @jax.jit
    @with_matmul_precision("highest")
    def cond(stack, f, fx, fu, X_prev, U_prev):
        def one(data, f_, fx_, fu_, Xp, Up):
            return assemble_condensed(
                data.x0, f_, fx_, fu_, Xp, Up, data.Q, data.R,
                data.X_ref, data.U_ref, data.reg_x, data.reg_u,
                data.slew_reg, data.slew_reg0, data.slew_um1, Nc=Nc)
        return jax.vmap(one)(stack, f, fx, fu, X_prev, U_prev)

    cqp = cond(stack, f, fx, fu, X_prev, U_prev)
    t = timeit(cond, stack, f, fx, fu, X_prev, U_prev)
    log(f"  condense+assemble:  {t*1e3:8.1f} ms")

    # 4. isolated IPM at forced iteration counts (slope = ms per IPM it)
    nc, nf = Nc * udim, (N - Nc) * udim
    ul = np.asarray(stack.u_l).reshape(B, M, N * udim)
    uu = np.asarray(stack.u_u).reshape(B, M, N * udim)
    bounds = BoxBounds(
        lo_c=jnp.asarray(ul[:, 0, :nc]), hi_c=jnp.asarray(uu[:, 0, :nc]),
        lo_f=jnp.asarray(ul[:, :, nc:]), hi_f=jnp.asarray(uu[:, :, nc:]),
        lo_x=jnp.full((B, M, N * xdim), -np.inf, f32),
        hi_x=jnp.full((B, M, N * xdim), np.inf, f32),
    )
    tsi = {}
    for iters in (2, 6, 12):
        fn = jax.jit(jax.vmap(lambda cqp_, b_: ipm_core(
            cqp_, b_, has_u=True, has_x=False, iters=iters, tol_exp=-10,
            kappa=1e-7, mu_target=0.0)))
        tsi[iters] = timeit(fn, cqp, bounds)
        log(f"  ipm iters={iters}:     {tsi[iters]*1e3:8.1f} ms")
    log(f"  slope 6->12: {(tsi[12]-tsi[6])/6*1e3:.2f} ms per IPM it")

    log("\ndone")


if __name__ == "__main__":
    main()
