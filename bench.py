"""Headline benchmark: CONVERGED consensus MPC solves/s on the available chip.

Config (BASELINE.json): N=30 horizon, M=32 particles, xdim=4, udim=2, box
control constraints, Nc=5 consensus horizon, f32. A batch of B scenarios is
solved in one fused vmapped program.

Headline metric (round 4): a "solve" counts ONLY when the SCP residual
reaches <= 1e-3 (the f32 accuracy envelope mapped by
benchmarks/accuracy_probe.py and accuracy_sweep.py; the reference defines a solve by
``max_res < res_tol``, scp_mpc.py:424, not by an iteration budget).  The
solver runs with device-loop Anderson acceleration and an early-exit
while_loop capped at ``max_it`` — an adaptive budget, not a fixed pass
count.  ``converged_frac`` and the exit-residual stats are reported next to
the rate; the round-3 fixed-8-iteration pass rate is dual-reported as
``legacy_8it_passes_per_s`` for cross-round continuity.

Baseline: the north-star target is >=1000 solves/s on a v5e-8 (8 chips) ==
125 solves/s/chip; ``vs_baseline`` is measured-chip-throughput / 125.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

RES_TOL = 1e-3  # the accuracy envelope a counted solve must reach
MAX_IT = 25     # early-exit cap (AA converges the flagship in ~16)
# full headline build config; tests/test_accuracy.py pins its quality.
# ipm_iters=8: measured sweet spot (benchmarks/tune_headline_out2.txt —
# 8 inner iterations with cross-SCP warm starts beat 15 at 297 vs 204
# solves/s with identical converged_frac=1.0)
HEADLINE_KW = dict(max_it=MAX_IT, res_tol=RES_TOL, accel="AA", ipm_iters=8)


def _stack_varied(data, B):
    """Broadcast one flagship instance to a B-batch with varied x0."""
    import jax
    import jax.numpy as jnp

    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(
        np.asarray(stack.x0).dtype
    )
    return stack._replace(x0=jnp.asarray(x0))


def _timed(batched, stack, reps):
    """Warm up, then time reps executions; fence with a host read (a plain
    block_until_ready returns early through the axon remote-device tunnel)."""
    X, U, info = batched(stack)
    _ = float(U.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        X, U, info = batched(stack)
    _ = float(U.sum())
    return time.perf_counter() - t0, info


def main():
    import jax

    import pmpc_tpu  # noqa: F401  (enables the persistent compile cache)
    from __graft_entry__ import _flagship

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    reps = int(os.environ.get("PMPC_BENCH_REPS", "5"))
    n_dev = max(len(jax.devices()), 1)

    # --- headline: adaptive-budget converged solves ---
    solver, data = _flagship(**HEADLINE_KW)
    batched = jax.jit(jax.vmap(solver))
    stack = _stack_varied(data, B)
    dt, info = _timed(batched, stack, reps)
    resid = np.asarray(info["resid"], np.float64)
    conv = np.asarray(info["converged"])
    frac = float(conv.mean())
    converged_per_s = conv.sum() * reps / dt
    per_chip = converged_per_s / n_dev

    # --- legacy continuity metric: fixed 8-iteration passes (round <=3) ---
    solver8, data8 = _flagship(max_it=8)
    dt8, _ = _timed(jax.jit(jax.vmap(solver8)), _stack_varied(data8, B), reps)
    legacy = B * reps / dt8 / n_dev

    print(json.dumps({
        "metric": "converged_consensus_mpc_solves_per_s_per_chip_N30_M32",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip (resid<=1e-3)",
        "vs_baseline": round(per_chip / 125.0, 4),
        "converged_frac": round(frac, 4),
        "resid_median": float(np.median(resid)),
        "resid_max": float(resid.max()),
        "iters_median": float(np.median(np.asarray(info["iters"]))),
        "legacy_8it_passes_per_s": round(legacy, 2),
    }))


if __name__ == "__main__":
    main()
