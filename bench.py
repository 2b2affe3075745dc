"""Headline benchmark: consensus MPC solves/s on the available chip.

Config (BASELINE.json): N=30 horizon, M=32 particles, xdim=4, udim=2, box
control constraints, Nc=5 consensus horizon, 8 SCP iterations per solve, f32.
A batch of B scenarios is solved in one fused vmapped program; throughput =
solved problems per second (each problem = full SCP solve of an M=32-particle
consensus program).

Baseline: the north-star target is >=1000 solves/s on a v5e-8 (8 chips) ==
125 solves/s/chip; ``vs_baseline`` is measured-chip-throughput / 125.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401  (enables the persistent compile cache)
    from pmpc_tpu.jax_scp import build_scp_solver
    from __graft_entry__ import _flagship

    B = int(os.environ.get("PMPC_BENCH_B", "64"))  # measured sweet spot after the
    # batch-folded Pallas factor (64->548, 128->535, 256->506, 512->478 solves/s/chip)
    reps = int(os.environ.get("PMPC_BENCH_REPS", "5"))

    solver, data = _flagship()
    batched = jax.jit(jax.vmap(solver))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    # vary x0 across the batch so nothing folds away
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(
        np.asarray(stack.x0).dtype
    )
    stack = stack._replace(x0=jnp.asarray(x0))

    # warmup / compile; a host read (not block_until_ready, which returns
    # early through the axon remote-device tunnel) is the fence
    X, U, info = batched(stack)
    _ = float(U.sum())

    t0 = time.perf_counter()
    for _ in range(reps):
        X, U, info = batched(stack)
    _ = float(U.sum())
    dt = time.perf_counter() - t0

    solves_per_s = B * reps / dt
    n_dev = len(jax.devices())
    per_chip = solves_per_s / max(n_dev, 1)
    print(json.dumps({
        "metric": "consensus_mpc_solves_per_s_per_chip_N30_M32",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / 125.0, 4),
    }))


if __name__ == "__main__":
    main()
