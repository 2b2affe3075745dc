"""Roofline statement for the converged-solve headline (VERDICT r3 #10).

Sweeps B over the headline config (bench.HEADLINE_KW), measures converged
solves/s, and computes an analytic FLOP/byte model of one SCP iteration to
say WHICH resource binds: MXU FLOPs, HBM bytes, or (the actual answer at
these shapes) per-op dispatch/VPU latency on small matrices.

Per SCP iteration per problem (M=32 particles, N=30, Nc=5, xdim=4, udim=2,
nf=(N-Nc)*udim=50, nc=Nc*udim=10):
  - linearize: M*N tiny 4x4/4x2 jacobians           (~1e5 flop)
  - condense:  M scans building Ft blocks           (~M*N*nf*xdim*udim)
  - arrow factor: M chol(nf x nf) + consensus nc^3  (~M*nf^3/3 ~ 1.3e6)
  - IPM x8: factor + 2 solves + barrier algebra     (~8 * 2e6)
Total ~ 2e7 flop/problem/iteration; at 16 iterations and B problems the
whole solve is ~3e8 B flop — against a v5e chip that does ~4.9e13 f32
flop/s. The measured rate tells us the fraction of peak and the bytes/flop
ratio tells us whether HBM could be the limit instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import pmpc_tpu  # noqa: F401  compile cache
    from __graft_entry__ import _flagship
    from bench import _stack_varied, _timed, HEADLINE_KW

    out = []
    for B in (32, 64, 96, 128, 256):
        solver, data = _flagship(**HEADLINE_KW)
        batched = jax.jit(jax.vmap(solver))
        stack = _stack_varied(data, B)
        dt, info = _timed(batched, stack, 5)
        conv = np.asarray(info["converged"])
        rate = float(conv.sum() * 5 / dt)
        iters = float(np.median(np.asarray(info["iters"])))
        it_max = int(np.asarray(info["iters"]).max())
        line = dict(B=B, converged_solves_per_s=round(rate, 1),
                    frac=float(conv.mean()), it_med=iters, it_max=it_max,
                    ms_per_batch=round(1e3 * dt / 5, 2))
        print(json.dumps(line), flush=True)
        out.append(line)

    # analytic op model at the measured operating point
    M, N, Nc, xdim, udim = 32, 30, 5, 4, 2
    nf, nc = (N - Nc) * udim, Nc * udim
    ipm_iters = 8
    flop_factor = M * nf**3 / 3 + nc**3 / 3
    flop_ipm = ipm_iters * (flop_factor + 4 * M * nf**2)
    flop_cond = M * N * nf * xdim * (xdim + udim) * 2
    flop_iter = flop_ipm + flop_cond + 2e5
    b64 = next(l for l in out if l["B"] == 64)
    per_solve_s = 1.0 / b64["converged_solves_per_s"]
    flops_total = flop_iter * b64["it_med"]
    achieved = flops_total / per_solve_s
    # bytes: the dominant recurring buffers per iteration (f32)
    bytes_iter = 4 * (M * nf * nf * 3 + M * N * (xdim * xdim + xdim * udim))
    bytes_total = bytes_iter * b64["it_med"]
    ai = flops_total / bytes_total
    print(json.dumps(dict(
        flop_per_solve=float(flops_total),
        achieved_flops=float(achieved),
        f32_peak_flops=4.9e13,
        frac_of_peak=float(achieved / 4.9e13),
        bytes_per_solve=float(bytes_total),
        hbm_bw=8.1e11,
        hbm_time_share=float(bytes_total / 8.1e11 / per_solve_s),
        arithmetic_intensity=float(ai),
    )), flush=True)


if __name__ == "__main__":
    main()
