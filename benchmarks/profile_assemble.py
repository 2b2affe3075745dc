"""Sub-breakdown of assemble_condensed at headline shapes (round-5 #1).

profile_ipm_step_out.txt: assemble_condensed = 3.17 ms/call of the 13.4 ms
SCP iteration, vs ~36 us of pure MXU flops — 100x off. Which piece?
Marginal-in-loop method (see profile_ipm_step.py).
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
    from pmpc_tpu.solvers.reduced import (_bdiag_mm, _block_diag, _slew_T)
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
    stack = _stack_varied(data, B)

    def lin_b(s, U_prev):
        X_ = jnp.concatenate([s.x0[:, None, :], s.X_prev[:, :-1, :]], axis=1)
        return lin_fn(_dubins, X_, U_prev)

    f, fx, fu = jax.jit(jax.vmap(lin_b))(stack, stack.U_prev)
    Ft, ft = jax.jit(jax.vmap(jax.vmap(condense)))(
        stack.x0, f, fx, fu, stack.X_prev, stack.U_prev)
    dt = Ft.dtype
    eye_x = jnp.eye(xdim, dtype=dt)
    Qt = stack.Q + 1.0 * eye_x  # (B, M, N, x, x) stand-in for Q + reg_x I

    # piece: QtFt bdiag multiply
    def mk_qtft(K):
        @jax.jit
        def run(Ft, Qt):
            def body(i, carry):
                Ft_, acc = carry
                QtFt = jax.vmap(jax.vmap(_bdiag_mm))(Qt, Ft_)
                d = jnp.sum(QtFt) * 1e-20
                return (Ft_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (Ft, jnp.float32(0)))
            return acc
        return run

    report("bdiag_QtFt", *marginal(mk_qtft, Ft, Qt))

    QtFt = jax.jit(jax.vmap(jax.vmap(_bdiag_mm)))(Qt, Ft)

    # piece: the big contraction H = Ft' QtFt
    def mk_H(K):
        @jax.jit
        def run(Ft, QtFt):
            def body(i, carry):
                Ft_, acc = carry
                H = jnp.einsum("bmji,bmjk->bmik", Ft_, QtFt)
                d = jnp.sum(H) * 1e-20
                return (Ft_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (Ft, jnp.float32(0)))
            return acc
        return run

    report("H_FtT_QtFt", *marginal(mk_H, Ft, QtFt))

    # piece: block_diag(Rt) + slew kron + partitions
    Rt = stack.R + 1e-2 * jnp.eye(udim, dtype=dt)

    def mk_rest(K):
        @jax.jit
        def run(Rt):
            S = jnp.kron(_slew_T(N, dt), jnp.eye(udim, dtype=dt))

            def body(i, carry):
                Rt_, acc = carry
                D = jax.vmap(jax.vmap(_block_diag))(Rt_)
                H2 = D + S
                d = jnp.sum(H2) * 1e-20
                return (Rt_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (Rt, jnp.float32(0)))
            return acc
        return run

    report("blockdiag_Rt_plus_slew", *marginal(mk_rest, Rt))

    # piece: the q vector chain
    def mk_q(K):
        @jax.jit
        def run(Ft, ft, Qt):
            def body(i, carry):
                ft_, acc = carry
                g = ft_ - jnp.einsum("bmij,bmj->bmi", Ft,
                                     stack.U_prev.reshape(B, M, -1))
                xt = (jnp.einsum("bmnij,bmnj->bmni", stack.Q, stack.X_ref)
                      + 1.0 * stack.X_prev).reshape(B, M, -1)
                Qg = jax.vmap(jax.vmap(
                    lambda Qv, gv: _bdiag_mm(Qv, gv[:, None])[:, 0]))(Qt, g)
                q = jnp.einsum("bmji,bmj->bmi", Ft, Qg - xt)
                d = jnp.sum(q) * 1e-20
                return (ft_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (ft, jnp.float32(0)))
            return acc
        return run

    report("q_chain", *marginal(mk_q, Ft, ft, Qt))


if __name__ == "__main__":
    main()
