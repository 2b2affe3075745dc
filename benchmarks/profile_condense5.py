"""Probe 8: condense scan step formulation — tiny batched matmul vs VPU
mult-reduce, on split (B,M) and flat (BM) carries.

The step row = fx_j @ row_prev is a (lanes, 4, 4) @ (lanes, 4, 60) batched
matmul: tiny contraction dims are MXU-hostile (27 us/step flat, worse
split). The mult-reduce form sum_j fx[...,i,j,None] * row[...,None,j,:]
lowers to a VPU fusion instead. Also: mult-reduce with the transpose at the
end (the production need) on the split carry.
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
    fx_flat = fx.reshape(BM, N, xdim, xdim)
    fu_flat = fu.reshape(BM, N, xdim, udim)
    onehot = jnp.eye(N, dtype=dt)
    E_flat = (onehot[:, None, :, None] * fu_flat[:, :, :, None, :]) \
        .reshape(BM, N, xdim, NU)
    fx_sp = fx  # (B, M, N, x, x)
    E_sp = E_flat.reshape(B, M, N, xdim, NU)

    def scan_rows(fx_, E_, step_mm, nb):
        mv = lambda a: jnp.moveaxis(a, nb, 0)

        def step(row, inp):
            fx_j, E_j = inp
            row = step_mm(fx_j, row) + E_j
            return row, row

        batchsh = fx_.shape[:nb]
        init = jnp.zeros(batchsh + (xdim, NU), dt)
        _, rows = lax.scan(step, init, (mv(fx_), mv(E_)))
        return rows

    mm_dot = lambda a, b: a @ b
    mm_vpu = lambda a, b: jnp.sum(a[..., :, :, None] * b[..., None, :, :],
                                  axis=-2)

    cases = [
        ("flat_dot", fx_flat, E_flat, mm_dot, 1, False),
        ("flat_vpu", fx_flat, E_flat, mm_vpu, 1, False),
        ("split_dot", fx_sp, E_sp, mm_dot, 2, False),
        ("split_vpu", fx_sp, E_sp, mm_vpu, 2, False),
        ("split_vpu_T", fx_sp, E_sp, mm_vpu, 2, True),
        ("split_dot_T", fx_sp, E_sp, mm_dot, 2, True),
    ]
    for tag, fxa, Ea, mm, nb, do_T in cases:
        def mk(K, fxa=fxa, Ea=Ea, mm=mm, nb=nb, do_T=do_T):
            @jax.jit
            def run(fxa, Ea):
                def body(i, carry):
                    fx_, acc = carry
                    rows = scan_rows(fx_, Ea, mm, nb)
                    if do_T:
                        rows = jnp.moveaxis(rows, 0, nb) \
                            .reshape(fxa.shape[:nb] + (N * xdim, NU))
                    d = jnp.sum(rows) * 1e-20
                    return (fx_ + d, acc + d)
                _, acc = lax.fori_loop(0, K, body, (fxa, jnp.float32(0)))
                return acc
            return run

        report(tag, *marginal(mk, fxa, Ea))

    # correctness: vpu == dot
    r1 = jax.jit(lambda a, b: scan_rows(a, b, mm_dot, 1))(fx_flat, E_flat)
    r2 = jax.jit(lambda a, b: scan_rows(a, b, mm_vpu, 1))(fx_flat, E_flat)
    print(json.dumps(dict(piece="vpu_vs_dot_maxerr",
                          err=float(jnp.max(jnp.abs(r1 - r2))))), flush=True)


if __name__ == "__main__":
    main()
