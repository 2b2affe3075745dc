"""Attribute the serial composed cone path's 270-990 ms/solve (round-5 #4).

The round-4 artifact (bench_cvar_extras_out_r4.txt) measured serial CVaR
M=4/N=20 at 3.7/s and extras+SOC M=16 at 1.01/s — tens of times slower than
an ECOS-class CPU IPM on the same instances. Before optimizing, split the
per-solve cost into:

  - SCP iterations x per-subproblem time (t_aff_solve),
  - per-subproblem: cone-IPM iteration count (warm vs cold) and the marginal
    per-IPM-iteration time (iters=K sweep on a FIXED subproblem),
  - the one-off per-call overhead (program dispatch + host prelude),
  - build_cone_program alone (assembly share).

Everything is XLA:CPU f64 (reference-parity path).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn

    f_fx_fu = dubins_f_fx_fu_fn()

    def serial_stats(tag, M, N, reps=3, extra_kw=None, ss=None):
        xdim, udim = 4, 2
        rng = np.random.default_rng(7)
        Q = np.tile(np.eye(xdim), (M, N, 1, 1))
        R = np.tile(1e-2 * np.eye(udim), (M, N, 1, 1))
        x0 = np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))
        kw = dict(max_it=6, res_tol=1e-7, verbose=False,
                  solver_settings=dict(ss or {}), **(extra_kw or {}))
        X, U, data = pmpc_tpu.solve(f_fx_fu, Q, R, x0, **kw)  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            X, U, data = pmpc_tpu.solve(f_fx_fu, Q, R, x0, **kw)
        dt = (time.perf_counter() - t0) / reps
        taff = [round(1e3 * t, 1) for t in data["t_aff_solve"]]
        print(json.dumps(dict(
            piece=tag, ms_per_solve=round(1e3 * dt, 1),
            scp_iters=len(taff), t_aff_ms=taff,
            host_overhead_ms=round(1e3 * dt - sum(taff), 1),
        )), flush=True)
        return data

    # the two bench configs (bench_cvar_extras.py serial rows)
    from bench_cvar_extras import _u_norm_soc_fns

    d_cvar = serial_stats("serial_cvar_M4_N20", 4, 20, ss=dict(k=2))
    d_ext = serial_stats("serial_extras_soc_M16_N20", 16, 20,
                         ss=dict(Nc=5),
                         extra_kw=dict(extra_cstrs_fns=_u_norm_soc_fns(0.9, 5)))

    # ---- isolated cone_qp_solve at the CVaR signature -----------------------
    # Build one REAL subproblem via the composed builder, then sweep iters=K
    # to get the marginal per-IPM-iteration time and the per-call floor.
    from pmpc_tpu.solvers.compose import (build_cone_program, pad_socs,
                                          COST_ANCHOR_EPS)
    from pmpc_tpu.solvers.coneipm import ConeLP, cone_qp_solve

    def isolate(tag, M, N, ss, extra_kw=None):
        import pmpc_tpu.scp as scp_mod
        from pmpc_tpu.solvers import dispatch as disp

        # capture the composed-call inputs by monkeypatching the device fn
        from pmpc_tpu.solvers import compose as comp
        captured = {}
        orig = comp._composed_symmetric_device

        def spy(cqp, dims, sig, ubounds, xbounds, ecs, H_extra, q_extra,
                smooth_method, alpha, beta, usoc, cvar, **kw):
            captured.setdefault("args", (cqp, dims, sig, ubounds, xbounds,
                                         ecs, H_extra, q_extra, smooth_method,
                                         alpha, beta, usoc, cvar))
            return orig(cqp, dims, sig, ubounds, xbounds, ecs, H_extra,
                        q_extra, smooth_method, alpha, beta, usoc, cvar, **kw)

        comp._composed_symmetric_device = spy
        try:
            serial_stats(tag + "_capture", M, N, reps=1, ss=ss,
                         extra_kw=extra_kw)
        finally:
            comp._composed_symmetric_device = orig
        (cqp, dims, sig, ubounds, xbounds, ecs, H_extra, q_extra,
         smooth_method, alpha, beta, usoc, cvar) = captured["args"]

        build = jax.jit(lambda c: build_cone_program(
            c, dims, sig, ecs, ubounds, xbounds, smooth_method=smooth_method,
            smooth_alpha=alpha, smooth_beta=beta, u_soc_r=usoc,
            H_extra=H_extra, q_extra=q_extra, cvar=cvar))
        out = build(cqp)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = build(cqp)
        jax.block_until_ready(out)
        t_build = (time.perf_counter() - t0) / 10
        P, q, Gl, hl, soc_blocks, Ge, he, Xmap, xoff, lay = out
        Gq, hq = pad_socs(soc_blocks, lay.nv, P.dtype)
        prob = ConeLP(P=P, q=q, Gl=Gl, hl=hl, Gq=Gq, hq=hq)
        print(json.dumps(dict(
            piece=tag + "_shapes", nv=int(lay.nv), ml=int(Gl.shape[0]),
            ncones=int(Gq.shape[0]), pmax=int(Gq.shape[1]),
            build_ms=round(1e3 * t_build, 2))), flush=True)

        # iteration count to convergence (cold)
        v, s, z, stats = cone_qp_solve(prob, iters=100, tol_exp=-8,
                                       kappa=1e-10)
        it_conv = int(stats["iters"])
        print(json.dumps(dict(piece=tag + "_cold_iters", iters=it_conv,
                              mu=float(stats["mu"]),
                              converged=bool(stats["converged"]))), flush=True)

        # marginal per-iteration time: fixed iteration budgets (tol tiny so
        # the while_loop never exits early)
        def timed_iters(K):
            f = jax.jit(lambda p: cone_qp_solve(p, iters=K, tol_exp=-14,
                                                kappa=1e-10)[3]["mu"])
            mu = f(prob); _ = float(mu)
            t0 = time.perf_counter()
            for _ in range(10):
                mu = f(prob)
            _ = float(mu)
            return (time.perf_counter() - t0) / 10

        tA, tB = timed_iters(5), timed_iters(25)
        per_it = (tB - tA) / 20
        floor = tA - 5 * per_it
        print(json.dumps(dict(
            piece=tag + "_ipm_marginal", ms_per_ipm_it=round(1e3 * per_it, 3),
            per_call_floor_ms=round(1e3 * floor, 2),
            t5_ms=round(1e3 * tA, 2), t25_ms=round(1e3 * tB, 2))), flush=True)

    isolate("cvar_M4", 4, 20, dict(k=2))
    isolate("extras_M16", 16, 20, dict(Nc=5),
            extra_kw=dict(extra_cstrs_fns=_u_norm_soc_fns(0.9, 5)))


if __name__ == "__main__":
    main()
