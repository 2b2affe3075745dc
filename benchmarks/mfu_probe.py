"""FLOPs / MFU estimate for the flagship fused solve (tracing/profiling parity).

Uses XLA's own cost analysis of the compiled program (flop count) divided by
measured wall time. Note the solver runs f32 with matmul precision 'highest'
(6 bf16 MXU passes per f32 matmul), and most ops are small — the point of this
number is to show the program is NOT flop-bound (the roofline headroom), which
matches the trace finding that time goes to many small ops + factorizations.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from __graft_entry__ import _flagship

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    solver, data = _flagship()
    fn = jax.jit(jax.vmap(solver))
    stack = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
    rng = np.random.default_rng(1)
    x0 = np.asarray(stack.x0) + 0.05 * rng.normal(size=stack.x0.shape).astype(np.float32)
    stack = stack._replace(x0=jnp.asarray(x0))

    compiled = fn.lower(stack).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan")))

    X, U, info = fn(stack)
    float(np.asarray(info["resid"]).sum())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        X, U, info = fn(stack)
    float(np.asarray(info["resid"]).sum())
    dt = (time.perf_counter() - t0) / reps

    # v5e peak: ~197 TFLOP/s bf16, ~98 TFLOP/s f32-equivalent at 'highest'
    peak_bf16 = 197e12
    flops_per_s = flops / dt
    print(json.dumps({
        "metric": "flagship_fused_flops_utilization",
        "B": B,
        "xla_flops_per_call": flops,
        "wall_s_per_call": round(dt, 4),
        "achieved_flops_per_s": flops_per_s,
        "mfu_vs_bf16_peak": round(flops_per_s / peak_bf16, 5),
    }))


if __name__ == "__main__":
    main()
