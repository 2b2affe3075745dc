"""Probe 7: vmapped (production-layout) assembly decomposition by output.

With the custom_vmap fold live, measure under jax.vmap(B) (exactly the
production batching):
  condense_folded   consume Ft only
  asm_H_only        consume Hcc/Hcf/Hff only (DCE drops the q chain)
  asm_q_only        consume qc/qf only (DCE drops the H chain)
  asm_all           consume everything (= real per-SCP-iteration cost)
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
    from pmpc_tpu.solvers.reduced import assemble_condensed
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
    stack = _stack_varied(data, B)

    def lin_b(s, U_prev):
        X_ = jnp.concatenate([s.x0[:, None, :], s.X_prev[:, :-1, :]], axis=1)
        return lin_fn(_dubins, X_, U_prev)

    f, fx, fu = jax.jit(jax.vmap(lin_b))(stack, stack.U_prev)

    def mk_cond(K):
        @jax.jit
        def run(stack, f, fx, fu):
            def body(i, carry):
                fx_, acc = carry
                Ft, ft = jax.vmap(condense)(
                    stack.x0, f, fx_, fu, stack.X_prev, stack.U_prev)
                d = (jnp.sum(Ft) + jnp.sum(ft)) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("condense_folded_vmap", *marginal(mk_cond, stack, f, fx, fu))

    def mk_asm(keys):
        def make(K):
            @jax.jit
            def run(stack, f, fx, fu):
                def body(i, carry):
                    fx_, acc = carry
                    cqp = jax.vmap(lambda s, a, b, c: assemble_condensed(
                        s.x0, a, b, c, s.X_prev, s.U_prev, s.Q, s.R,
                        s.X_ref, s.U_ref, s.reg_x, s.reg_u, s.slew_reg,
                        s.slew_reg0, s.slew_um1, Nc=Nc))(stack, f, fx_, fu)
                    d = sum(jnp.sum(getattr(cqp, k)) for k in keys) * 1e-20
                    return (fx_ + d, acc + d)
                _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
                return acc
            return run
        return make

    report("asm_H_only", *marginal(mk_asm(("Hcc", "Hcf", "Hff"))
                                   , stack, f, fx, fu))
    report("asm_q_only", *marginal(mk_asm(("qc", "qf")), stack, f, fx, fu))
    report("asm_all", *marginal(
        mk_asm(("Hcc", "Hcf", "Hff", "qc", "qf", "Ft", "g")),
        stack, f, fx, fu))


if __name__ == "__main__":
    main()
