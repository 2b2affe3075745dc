"""Per-stage timing breakdown of the fused flagship solve (VERDICT r1 item 1).

Times, on the real chip, with host-forced reads (block_until_ready lies through
the axon tunnel — see benchmarks/RESULTS_r1.md):
  1. the full fused solve at several SCP iteration counts (slope = cost/SCP it),
  2. the IPM at forced iteration counts (slope = cost/IPM it),
  3. the equality-only path (no IPM) for the same SCP counts,
  4. isolated stages: linearize, condense+assemble, IPM solve, on the same shapes,
  5. actual IPM iteration counts taken inside the fused solve (warm-start check).

Writes a human-readable report to benchmarks/profile_fused_out.txt (and stdout).
Run serially — concurrent compiles thrash the axon compile service.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile_fused_out.txt")
_lines = []


def log(msg):
    _lines.append(str(msg))
    print(msg, flush=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(_lines) + "\n")


def timeit(fn, *args, reps=5):
    """Compile+warm once, then time reps calls ending with a host read."""
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def _force(out):
    import jax

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    # host read forces real completion through the tunnel
    float(np.asarray(leaves[-1]).ravel()[0]) if leaves else None
    for x in leaves:
        jax.block_until_ready(x)


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
    from pmpc_tpu.solvers.ipm import BoxBounds, ipm_core
    from pmpc_tpu.solvers.reduced import assemble_condensed, recover_XU, solve_eq
    from pmpc_tpu.dynamics import linearize
    from pmpc_tpu.utils import with_matmul_precision
    from __graft_entry__ import _dubins, _flagship

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    M, N, xdim, udim, Nc = 32, 30, 4, 2, 5
    log(f"platform={jax.devices()[0].platform} B={B} M={M} N={N} Nc={Nc}")

    _, data = _flagship()
    rng = np.random.default_rng(1)
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(np.float32)
    stack = stack._replace(x0=jnp.asarray(x0))

    # -- 1. full solve vs SCP iteration count -----------------------------------
    log("\n== full fused solve (box IPM path), time per batched call ==")
    ts = {}
    for max_it in (1, 2, 4, 8):
        solver = build_scp_solver(
            _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
            max_it=max_it, res_tol=1e-5, has_u_bounds=True, ipm_iters=15, jit=False,
        )
        fn = jax.jit(jax.vmap(solver))
        ts[max_it] = timeit(fn, stack)
        log(f"  max_it={max_it}: {ts[max_it]*1e3:8.2f} ms  "
            f"({B*max(1,0)+0:d}b, {B*8/ts[8]:.1f} solves/s @8 eq)" if max_it == 8 else
            f"  max_it={max_it}: {ts[max_it]*1e3:8.2f} ms")
    slope = (ts[8] - ts[4]) / 4
    log(f"  per-SCP-iteration cost (8-4 slope): {slope*1e3:.2f} ms; "
        f"intercept~{(ts[1]-slope)*1e3:.2f} ms")
    log(f"  headline equivalent: {B/ts[8]:.1f} solves/s/chip")

    # -- 2. eq-only path (no IPM) ----------------------------------------------
    log("\n== eq-only path (no bounds) ==")
    for max_it in (4, 8):
        solver = build_scp_solver(
            _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
            max_it=max_it, res_tol=1e-5, has_u_bounds=False, jit=False,
        )
        fn = jax.jit(jax.vmap(solver))
        t = timeit(fn, stack)
        log(f"  max_it={max_it}: {t*1e3:8.2f} ms")

    # -- 3. actual IPM iteration counts inside the fused solve ------------------
    log("\n== IPM iterations taken per SCP iteration (warm-start check) ==")
    solver = build_scp_solver(
        _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=8, res_tol=1e-5, has_u_bounds=True, ipm_iters=15, jit=False,
        collect_stats=True,
    )
    fn = jax.jit(jax.vmap(solver))
    X, U, info = fn(stack)
    it_mat = np.asarray(info["scan_stats"]["ipm_iters"])  # (B, max_it)
    res_mat = np.asarray(info["scan_stats"]["resid"])
    log(f"  ipm_iters per SCP it (mean over batch): "
        f"{np.mean(it_mat, axis=0).round(2).tolist()}")
    log(f"  scp resid per it (batch mean): "
        f"{[float(f'{v:.2e}') for v in np.mean(res_mat, axis=0)]}")
    log(f"  total IPM its/solve: {np.sum(np.mean(it_mat, axis=0)):.1f}")

    # -- 4. isolated stages on flagship shapes ----------------------------------
    log("\n== isolated stages (batched over B*M or B as appropriate) ==")
    X_prev = jnp.zeros((B, M, N, xdim), jnp.float32)
    U_prev = jnp.zeros((B, M, N, udim), jnp.float32)

    @jax.jit
    def lin_stage(x0b, Xp, Up):
        X_ = jnp.concatenate([x0b[:, :, None, :], Xp[:, :, :-1, :]], axis=2)
        return linearize(_dubins, X_, Up)

    t = timeit(lin_stage, stack.x0, X_prev, U_prev)
    log(f"  linearize (jacfwd, B*M*N): {t*1e3:8.2f} ms")

    f, fx, fu = lin_stage(stack.x0, X_prev, U_prev)

    asm = jax.jit(jax.vmap(
        lambda x0_, f_, fx_, fu_, Xp_, Up_, Q_, R_, Xr_, Ur_, rx_, ru_, sr_, sr0_, su_:
        assemble_condensed(x0_, f_, fx_, fu_, Xp_, Up_, Q_, R_, Xr_, Ur_,
                           rx_, ru_, sr_, sr0_, su_, Nc=Nc)))

    args = (stack.x0, f, fx, fu, X_prev, U_prev, stack.Q, stack.R,
            stack.X_ref, stack.U_ref, stack.reg_x, stack.reg_u,
            stack.slew_reg, stack.slew_reg0, stack.slew_um1)
    t_asm = timeit(asm, *args)
    log(f"  condense+assemble: {t_asm*1e3:8.2f} ms")

    cqp = asm(*args)
    nc, nf = Nc * udim, (N - Nc) * udim
    ul = stack.u_l.reshape(B, M, N * udim)
    uu = stack.u_u.reshape(B, M, N * udim)
    bounds = BoxBounds(
        lo_c=ul[:, 0, :nc], hi_c=uu[:, 0, :nc],
        lo_f=ul[:, :, nc:], hi_f=uu[:, :, nc:],
        lo_x=jnp.full((B, M, N * xdim), -jnp.inf),
        hi_x=jnp.full((B, M, N * xdim), jnp.inf),
    )

    for iters in (1, 5, 10, 15):
        ipm = jax.jit(jax.vmap(
            lambda c, b: ipm_core(c, b, has_u=True, has_x=False, iters=iters,
                                  tol_exp=-12, kappa=1e-7)[:2]))
        t = timeit(ipm, cqp, bounds)
        log(f"  ipm_core iters={iters:2d} (tol=-12, no early exit): {t*1e3:8.2f} ms")

    eqs = jax.jit(jax.vmap(solve_eq))
    t = timeit(eqs, cqp)
    log(f"  solve_eq (arrow + 2 refine): {t*1e3:8.2f} ms")

    rec = jax.jit(jax.vmap(lambda c, a, b: recover_XU(c, a, b, N=N)))
    uc_, uf_ = eqs(cqp)
    t = timeit(rec, cqp, uc_, uf_)
    log(f"  recover_XU: {t*1e3:8.2f} ms")

    # -- 5. optional jax profiler trace -----------------------------------------
    try:
        solver8 = build_scp_solver(
            _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
            max_it=8, res_tol=1e-5, has_u_bounds=True, ipm_iters=15, jit=False,
        )
        fn8 = jax.jit(jax.vmap(solver8))
        _force(fn8(stack))
        tracedir = os.path.join(os.path.dirname(OUT), "jax_trace")
        with jax.profiler.trace(tracedir):
            _force(fn8(stack))
        log(f"\njax profiler trace written to {tracedir}")
    except Exception as e:  # noqa: BLE001
        log(f"\njax profiler trace unavailable: {type(e).__name__}: {e}")

    log("\ndone")


if __name__ == "__main__":
    main()
