"""Sweep the converged-headline knobs (AA window/engage, IPM inner budget).

Measures the EXACT bench.py headline path — vmapped B-batch, early-exit
while_loop, res_tol=1e-3 — and prints converged solves/s/chip per config.

Usage: python benchmarks/tune_headline.py [B] [reps]
"""

import sys
import time

import numpy as np


def run(cfg, B, reps):
    import jax

    from __graft_entry__ import _flagship
    from bench import _stack_varied, _timed, RES_TOL, MAX_IT

    solver, data = _flagship(max_it=cfg.pop("max_it", MAX_IT),
                             res_tol=RES_TOL, accel="AA", **cfg)
    batched = jax.jit(jax.vmap(solver))
    stack = _stack_varied(data, B)
    dt, info = _timed(batched, stack, reps)
    conv = np.asarray(info["converged"])
    iters = np.asarray(info["iters"])
    resid = np.asarray(info["resid"], np.float64)
    return dict(
        solves_per_s=float(conv.sum() * reps / dt),
        frac=float(conv.mean()),
        it_med=float(np.median(iters)), it_max=int(iters.max()),
        resid_max=float(resid.max()),
    )


def main():
    sys.path.insert(0, ".")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    configs = [
        ("base w5 it0=2 ipm15", {}),
        ("ipm10", dict(ipm_iters=10)),
        ("ipm12", dict(ipm_iters=12)),
        ("ipm8", dict(ipm_iters=8)),
        ("ipm10 w4", dict(ipm_iters=10, accel_window=4)),
        ("ipm8 w4", dict(ipm_iters=8, accel_window=4)),
        ("ipm10 gondzio1", dict(ipm_iters=10, ipm_gondzio=1)),
    ]
    for name, cfg in configs:
        t0 = time.time()
        try:
            r = run(dict(cfg), B, reps)
            print(f"{name:24s} {r['solves_per_s']:7.1f}/s frac={r['frac']:.3f} "
                  f"it_med={r['it_med']:.0f} it_max={r['it_max']} "
                  f"resid_max={r['resid_max']:.1e} ({time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad cfg
            print(f"{name:24s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
