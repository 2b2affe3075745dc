"""Probe 4: inside condense — scan vs E-build vs the final moveaxis.

condense_full (Ft consumed) = 2.4 ms; which part? Variants:
  - scan_only: consume rows in scan-native (N, ..., xdim, NU) layout
  - scan_plus_move: today's condense (moveaxis + reshape to (..., NX, NU))
  - E_only: just the one-hot block placement tensor
  - H_from_Nmajor: H computed directly from N-major rows (no transpose),
    the candidate assembly rewrite.
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
    from pmpc_tpu.dynamics import linearize as lin_fn
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
    NU = N * udim
    stack = _stack_varied(data, B)

    def lin_b(s, U_prev):
        X_ = jnp.concatenate([s.x0[:, None, :], s.X_prev[:, :-1, :]], axis=1)
        return lin_fn(_dubins, X_, U_prev)

    f, fx, fu = jax.jit(jax.vmap(lin_b))(stack, stack.U_prev)
    dt = f.dtype
    batch = (B, M)

    def raw_scan(x0, f_, fx_, fu_, X_prev, U_prev):
        """condense internals, returning N-major rows + xs."""
        xlin = jnp.concatenate([x0[..., None, :], X_prev[..., :-1, :]],
                               axis=-2)
        onehot = jnp.eye(N, dtype=dt)
        E = onehot[:, None, :, None] * fu_[..., :, :, None, :]
        E = E.reshape(batch + (N, xdim, NU))
        mv = lambda a: jnp.moveaxis(a, 2, 0)

        def step(carry, inp):
            row_prev, x_prev = carry
            f_j, fx_j, E_j, xlin_j = inp
            row = fx_j @ row_prev + E_j
            x_next = f_j + jnp.einsum("...ij,...j->...i", fx_j,
                                      x_prev - xlin_j)
            return (row, x_next), (row, x_next)

        init = (jnp.zeros(batch + (xdim, NU), dtype=dt), x0)
        _, (rows, xs) = lax.scan(step, init,
                                 (mv(f_), mv(fx_), mv(E), mv(xlin)))
        return rows, xs  # (N, B, M, xdim, NU), (N, B, M, xdim)

    def mk_scan_only(K):
        @jax.jit
        def run(f, fx, fu):
            def body(i, carry):
                fx_, acc = carry
                rows, xs = raw_scan(stack.x0, f, fx_, fu, stack.X_prev,
                                    stack.U_prev)
                d = (jnp.sum(rows) + jnp.sum(xs)) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("scan_only_Nmajor", *marginal(mk_scan_only, f, fx, fu))

    def mk_scan_move(K):
        @jax.jit
        def run(f, fx, fu):
            def body(i, carry):
                fx_, acc = carry
                rows, xs = raw_scan(stack.x0, f, fx_, fu, stack.X_prev,
                                    stack.U_prev)
                Ft = jnp.moveaxis(rows, 0, 2).reshape(batch + (N * xdim, NU))
                d = (jnp.sum(Ft) + jnp.sum(xs)) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("scan_plus_moveaxis", *marginal(mk_scan_move, f, fx, fu))

    def mk_E(K):
        @jax.jit
        def run(fu):
            onehot = jnp.eye(N, dtype=dt)

            def body(i, carry):
                fu_, acc = carry
                E = onehot[:, None, :, None] * fu_[..., :, :, None, :]
                E = E.reshape(batch + (N, xdim, NU))
                d = jnp.sum(E) * 1e-20
                return (fu_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fu, jnp.float32(0)))
            return acc
        return run

    report("E_build_only", *marginal(mk_E, fu))

    # H computed straight from N-major rows: no transpose anywhere
    eye_x = jnp.eye(xdim, dtype=dt)
    Qt = stack.Q + 1.0 * eye_x  # (B, M, N, x, x)
    Qt_n = jnp.moveaxis(Qt, 2, 0)  # (N, B, M, x, x)

    def mk_H_nmajor(K):
        @jax.jit
        def run(f, fx, fu, Qt_n):
            def body(i, carry):
                fx_, acc = carry
                rows, xs = raw_scan(stack.x0, f, fx_, fu, stack.X_prev,
                                    stack.U_prev)
                Qr = jnp.einsum("nbmij,nbmjk->nbmik", Qt_n, rows)
                H = jnp.einsum("nbmji,nbmjk->bmik", rows, Qr)
                d = (jnp.sum(H) + jnp.sum(xs)) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx, jnp.float32(0)))
            return acc
        return run

    report("scan_plus_H_Nmajor", *marginal(mk_H_nmajor, f, fx, fu, Qt_n))


if __name__ == "__main__":
    main()
