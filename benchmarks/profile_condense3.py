"""Probe 5: why is one condense scan step ~80 us, and does grouping help?

Variants at headline shapes ((B*M)=2048 lanes, N=30, xdim=4, NU=60):
  carry_only      scan carrying the (4, NU) row but NO stacked outputs
  no_E            stacked outputs, no E add (row = fx @ row_prev)
  full            today's condense rows scan (= condense_full baseline)
  grouped_G5/G6   two-level condensation: within-group scans (vmapped over
                  groups, depth G) + across-group scan (depth N/G) — cuts
                  the sequential chain from N to G + N/G. Checked equal to
                  the full scan.
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
    BM = B * M
    fx2 = fx.reshape(BM, N, xdim, xdim)
    fu2 = fu.reshape(BM, N, xdim, udim)
    onehot = jnp.eye(N, dtype=dt)
    E0 = (onehot[:, None, :, None] * fu2[:, :, :, None, :]) \
        .reshape(BM, N, xdim, NU)

    def mk_carry_only(K):
        @jax.jit
        def run(fx2, E0):
            def body(i, carry):
                fx_, acc = carry

                def step(row, inp):
                    fx_j, E_j = inp
                    row = fx_j @ row + E_j
                    return row, None

                row, _ = lax.scan(
                    step, jnp.zeros((BM, xdim, NU), dt),
                    (jnp.moveaxis(fx_, 1, 0), jnp.moveaxis(E0, 1, 0)))
                d = jnp.sum(row) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx2, jnp.float32(0)))
            return acc
        return run

    report("carry_only", *marginal(mk_carry_only, fx2, E0))

    def mk_no_E(K):
        @jax.jit
        def run(fx2, E0):
            def body(i, carry):
                fx_, acc = carry

                def step(row, fx_j):
                    row = fx_j @ row
                    return row, row

                _, rows = lax.scan(
                    step, E0[:, 0], jnp.moveaxis(fx_, 1, 0))
                d = jnp.sum(rows) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx2, jnp.float32(0)))
            return acc
        return run

    report("no_E_stacked", *marginal(mk_no_E, fx2, E0))

    def full_rows(fx_, E_):
        def step(row, inp):
            fx_j, E_j = inp
            row = fx_j @ row + E_j
            return row, row

        _, rows = lax.scan(step, jnp.zeros((BM, xdim, NU), dt),
                           (jnp.moveaxis(fx_, 1, 0), jnp.moveaxis(E_, 1, 0)))
        return rows  # (N, BM, xdim, NU)

    def mk_full(K):
        @jax.jit
        def run(fx2, E0):
            def body(i, carry):
                fx_, acc = carry
                rows = full_rows(fx_, E0)
                d = jnp.sum(rows) * 1e-20
                return (fx_ + d, acc + d)
            _, acc = lax.fori_loop(0, K, body, (fx2, jnp.float32(0)))
            return acc
        return run

    report("full_rows", *marginal(mk_full, fx2, E0))

    def grouped_rows(fx_, fu_, G):
        """Two-level condensation. Returns rows (BM, N, xdim, NU)."""
        Ng = N // G
        fxg = fx_.reshape(BM, Ng, G, xdim, xdim)
        fug = fu_.reshape(BM, Ng, G, xdim, udim)
        oh = jnp.eye(G, dtype=dt)
        Eg = (oh[:, None, :, None] * fug[:, :, :, :, None, :]) \
            .reshape(BM, Ng, G, xdim, G * udim)

        # within-group scan over the G stages (vmapped over Ng groups):
        # carry = (local row (.., xdim, G*udim), cumulative product (xdim,xdim))
        def wstep(carry, inp):
            rloc, P = carry
            fx_j, E_j = inp
            rloc = fx_j @ rloc + E_j
            P = fx_j @ P
            return (rloc, P), (rloc, P)

        eyeP = jnp.broadcast_to(jnp.eye(xdim, dtype=dt),
                                (BM, Ng, xdim, xdim))
        init = (jnp.zeros((BM, Ng, xdim, G * udim), dt), eyeP)
        (_, _), (rloc, Pcum) = lax.scan(
            wstep, init,
            (jnp.moveaxis(fxg, 2, 0), jnp.moveaxis(Eg, 2, 0)))
        # rloc: (G, BM, Ng, xdim, G*udim); Pcum: (G, BM, Ng, xdim, xdim)

        # across-group scan over Ng groups: carry = previous group-end row
        def astep(rowend, inp):
            rloc_g, Pcum_g, g = inp
            # full rows of this group's stages: local columns + chain into
            # the previous groups' columns
            prev = jnp.einsum("gbij,bjk->gbik", Pcum_g, rowend)
            # place local (G*udim) columns at offset g*G*udim
            loc_full = jnp.zeros((G,) + rowend.shape[:-1] + (NU,), dt)
            loc_full = lax.dynamic_update_slice(
                loc_full, rloc_g, (0, 0, 0, g * G * udim))
            rows_g = prev + loc_full
            return rows_g[-1], rows_g

        rloc_t = jnp.moveaxis(rloc, 2, 1)   # (G, Ng, BM, x, G*udim) -> ...
        # reorder to scan over groups: (Ng, G, BM, xdim, ...)
        rloc_s = jnp.moveaxis(rloc, 2, 0)   # (Ng, G, BM, xdim, G*udim)
        Pcum_s = jnp.moveaxis(Pcum, 2, 0)   # (Ng, G, BM, xdim, xdim)
        rowend0 = jnp.zeros((BM, xdim, NU), dt)
        _, rows_gs = lax.scan(astep, rowend0,
                              (rloc_s, Pcum_s, jnp.arange(Ng)))
        # rows_gs: (Ng, G, BM, xdim, NU) -> (BM, N, xdim, NU)
        rows = jnp.moveaxis(rows_gs.reshape(N, BM, xdim, NU), 0, 1)
        return rows

    # correctness check vs the plain scan
    rows_ref = jnp.moveaxis(full_rows(fx2, E0), 0, 1)
    for G in (5, 6, 10):
        rows_g = jax.jit(lambda a, b, G=G: grouped_rows(a, b, G))(fx2, fu2)
        err = float(jnp.max(jnp.abs(rows_g - rows_ref)))
        print(json.dumps(dict(piece=f"grouped_G{G}_maxerr", err=err)),
              flush=True)

        def mk_grouped(K, G=G):
            @jax.jit
            def run(fx2, fu2):
                def body(i, carry):
                    fx_, acc = carry
                    rows = grouped_rows(fx_, fu2, G)
                    d = jnp.sum(rows) * 1e-20
                    return (fx_ + d, acc + d)
                _, acc = lax.fori_loop(0, K, body, (fx2, jnp.float32(0)))
                return acc
            return run

        report(f"grouped_G{G}", *marginal(mk_grouped, fx2, fu2))


if __name__ == "__main__":
    main()
