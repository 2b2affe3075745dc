"""Decompose the headline solve's per-SCP-iteration time (round-5 task #1).

The roofline artifact (roofline_headline_out.txt) says the flagship is bound
by SEQUENTIAL DISPATCH DEPTH: ~16 SCP iterations x (1 condense + 8 IPM
steps). This attributes the ~13.4 ms/SCP-iteration (214 ms / 16 its at
B=64) to its pieces, each measured as a MARGINAL per-call time inside one
jitted lax.fori_loop (two loop lengths K1/K2; marginal = (tK2-tK1)/(K2-K1))
with output-dependent perturbations threaded through EVERY varying input so
XLA cannot hoist loop-invariant subgraphs. Per-dispatch tunnel overhead
cancels in the marginal.

Pieces: linearize (dubins jacfwd), condense (the O(N) scan), full
assemble_condensed, the Pallas factor, arrow factor (factor+W+Schur), arrow
apply (one solve), and ipm_core at 8 iterations.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import pmpc_tpu  # noqa: F401
    from __graft_entry__ import _flagship, _dubins
    from pmpc_tpu.dynamics import linearize as lin_fn, condense
    from pmpc_tpu.solvers.reduced import (assemble_condensed,
                                          arrow_factor_diag, arrow_apply)
    from pmpc_tpu.solvers.ipm import BoxBounds, ipm_core
    from pmpc_tpu.ops.linalg import spd_factor_diag
    from bench import HEADLINE_KW, _stack_varied

    def timed(fn, *args):
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / REPS

    def marginal(make_loop, *args, K1=4, K2=20):
        t1, t2 = timed(make_loop(K1), *args), timed(make_loop(K2), *args)
        return (t2 - t1) / (K2 - K1), t1, t2

    def report(piece, m, t1, t2, **extra):
        print(json.dumps(dict(piece=piece, ms=round(m * 1e3, 4),
                              tK1=round(t1 * 1e3, 2), tK2=round(t2 * 1e3, 2),
                              **extra)), flush=True)

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    solver, data = _flagship(**HEADLINE_KW)
    M, N, xdim = data.Q.shape[:3]
    udim = data.R.shape[-1]
    Nc = 5
    nc, nf = Nc * udim, (N - Nc) * udim

    # ---- reference point: the full batched headline solve -------------------
    batched = jax.jit(jax.vmap(solver))
    stack = _stack_varied(data, B)
    t_full = timed(batched, stack)
    X, U, info = batched(stack)
    it_med = float(np.median(np.asarray(info["iters"])))
    print(json.dumps(dict(piece="full_solve_B%d" % B, ms=round(t_full * 1e3, 2),
                          it_med=it_med,
                          ms_per_scp_it=round(t_full * 1e3 / it_med, 3))),
          flush=True)

    # ---- fixtures ------------------------------------------------------------
    def lin_b(s, U_prev):
        X_ = jnp.concatenate([s.x0[:, None, :], s.X_prev[:, :-1, :]], axis=1)
        return lin_fn(_dubins, X_, U_prev)

    f, fx, fu = jax.jit(jax.vmap(lin_b))(stack, stack.U_prev)

    # ---- marginals -----------------------------------------------------------
    def mk_lin(K):
        @jax.jit
        def run(stack, U_prev):
            def body(i, carry):
                U_, acc = carry
                f_, fx_, fu_ = jax.vmap(lin_b)(stack, U_)
                d = jnp.sum(f_) * 1e-20
                return (U_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (U_prev, jnp.float32(0)))
            return acc
        return run

    report("linearize", *marginal(mk_lin, stack, stack.U_prev))

    def mk_cond(K):
        @jax.jit
        def run(stack, f, fx, fu):
            def body(i, carry):
                fx_, acc = carry
                Ft, ft = jax.vmap(jax.vmap(condense))(
                    stack.x0, f, fx_, fu, stack.X_prev, stack.U_prev)
                d = jnp.sum(ft) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("condense_scan", *marginal(mk_cond, stack, f, fx, fu))

    def mk_asm(K):
        @jax.jit
        def run(stack, f, fx, fu):
            def body(i, carry):
                fx_, acc = carry
                cqp = jax.vmap(lambda s, a, b, c: assemble_condensed(
                    s.x0, a, b, c, s.X_prev, s.U_prev, s.Q, s.R, s.X_ref,
                    s.U_ref, s.reg_x, s.reg_u, s.slew_reg, s.slew_reg0,
                    s.slew_um1, Nc=Nc))(stack, f, fx_, fu)
                d = jnp.sum(cqp.qf) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("assemble_condensed", *marginal(mk_asm, stack, f, fx, fu))

    cqp = jax.jit(jax.vmap(lambda s, a, b, c: assemble_condensed(
        s.x0, a, b, c, s.X_prev, s.U_prev, s.Q, s.R, s.X_ref, s.U_ref,
        s.reg_x, s.reg_u, s.slew_reg, s.slew_reg0, s.slew_um1,
        Nc=Nc)))(stack, f, fx, fu)

    rng = np.random.default_rng(0)
    wc = jnp.asarray(rng.uniform(0.5, 2.0, (B, nc)).astype(np.float32))
    wf = jnp.asarray(rng.uniform(0.5, 2.0, (B, M, nf)).astype(np.float32))
    bc = jnp.asarray(rng.normal(size=(B, nc)).astype(np.float32))
    bf = jnp.asarray(rng.normal(size=(B, M, nf)).astype(np.float32))

    def mk_chol(K):
        @jax.jit
        def run(Hff, wf):
            def body(i, carry):
                wf_, acc = carry
                L = spd_factor_diag(Hff, wf_)
                d = jnp.sum(L) * 1e-20
                return (wf_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (wf, jnp.float32(0)))
            return acc
        return run

    report("pallas_factor_only", *marginal(mk_chol, cqp.Hff, wf))

    def mk_factor(K):
        @jax.jit
        def run(Hcc, Hcf, Hff, wc, wf):
            def body(i, carry):
                wc_, wf_, acc = carry
                F = jax.vmap(arrow_factor_diag)(Hcc, Hcf, Hff, wc_, wf_)
                d = jnp.sum(F.LS) * 1e-20
                return (wc_ + d, wf_ + d, acc + d)
            _, _, acc = lax.fori_loop(0, K, body, (wc, wf, jnp.float32(0)))
            return acc
        return run

    report("arrow_factor_diag", *marginal(mk_factor, cqp.Hcc, cqp.Hcf,
                                          cqp.Hff, wc, wf))

    F0 = jax.jit(jax.vmap(arrow_factor_diag))(cqp.Hcc, cqp.Hcf, cqp.Hff, wc, wf)

    def mk_apply(K):
        @jax.jit
        def run(F, bc, bf):
            def body(i, carry):
                bc_, bf_, acc = carry
                uc, uf = jax.vmap(arrow_apply)(F, bc_, bf_)
                d = jnp.sum(uc) * 1e-20
                return (bc_ + d, bf_ + d, acc + d)
            _, _, acc = lax.fori_loop(0, K, body, (bc, bf, jnp.float32(0)))
            return acc
        return run

    report("arrow_apply", *marginal(mk_apply, F0, bc, bf))

    # ---- ipm_core iters=8 on fixed subproblems ------------------------------
    ul = stack.u_l.reshape(B, M, N * udim)
    uu = stack.u_u.reshape(B, M, N * udim)
    bounds = BoxBounds(lo_c=ul[:, 0, :nc], hi_c=uu[:, 0, :nc],
                       lo_f=ul[:, :, nc:], hi_f=uu[:, :, nc:],
                       lo_x=stack.x_l.reshape(B, M, N * xdim),
                       hi_x=stack.x_u.reshape(B, M, N * xdim))

    def mk_ipm(K):
        @jax.jit
        def run(cqp, bounds):
            def body(i, carry):
                qf, acc = carry
                c = cqp._replace(qf=qf)
                uc, uf, stats = jax.vmap(
                    lambda cq, bd: ipm_core(cq, bd, has_u=True, has_x=False,
                                            iters=8, tol_exp=-6,
                                            kappa=1e-7))(c, bounds)
                d = jnp.sum(uc) * 1e-20
                return (qf + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (cqp.qf, jnp.float32(0)))
            return acc
        return run

    m, t1, t2 = marginal(mk_ipm, cqp, bounds, K1=2, K2=6)
    report("ipm_core_8it", m, t1, t2, ms_per_ipm_it=round(m * 1e3 / 8, 4))


if __name__ == "__main__":
    main()
