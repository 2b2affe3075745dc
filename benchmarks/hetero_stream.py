"""Heterogeneous-difficulty serving: lane-idle tax + lane-refill A/B (task #5).

The headline batch is homogeneous (x0 noise 0.05): every lane converges in
~16 iterations, so the vmapped while_loop's run-to-batch-max cost is
invisible. Here:

1. measure the batched full-solve rate on a HETEROGENEOUS batch (per-lane
   x0 noise scale in [0.05, 1.2]) and its iteration spread — the idle tax
   is 1 - it_mean/it_max (converged lanes wait for the straggler),
2. run the same problem population as a STREAM through continuous batching
   (`pmpc_tpu.stream.solve_stream`: chunked SCP advance + host-side lane
   refill) and compare problems/s against run-to-max batching.

Every chunk boundary pays one host sync (~27 ms through the axon tunnel —
on a locally attached chip this overhead is ~us, so the refill gain reported
here is a LOWER bound). Real chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pmpc_tpu  # noqa: F401
    from __graft_entry__ import _flagship
    from pmpc_tpu.stream import solve_stream
    from bench import HEADLINE_KW

    B = int(os.environ.get("PMPC_BENCH_B", "64"))
    S = int(os.environ.get("PMPC_STREAM_S", "256"))
    solver, data = _flagship(**HEADLINE_KW)

    rng = np.random.default_rng(3)
    # per-problem difficulty: wide enough that iteration counts spread
    # (it_min << it_max), narrow enough that nearly all problems converge
    # within the headline budget (a first capture at scale<=1.2 drove 71%
    # of problems into the max_it cap — every lane a straggler, no tax)
    scales = 0.05 + 0.5 * rng.random(S)

    def prob(i):
        x0 = np.asarray(data.x0) + scales[i] * rng.normal(
            size=data.x0.shape).astype(np.asarray(data.x0).dtype)
        return data._replace(x0=jnp.asarray(x0))

    stream = [prob(i) for i in range(S)]

    # ---- run-to-max batching over the same population -----------------------
    batched = jax.jit(jax.vmap(solver))
    stacks = [jax.tree.map(lambda *xs: jnp.stack(xs), *stream[k:k + B])
              for k in range(0, S, B)]
    X, U, info = batched(stacks[0])  # compile
    _ = float(U.sum())
    t0 = time.perf_counter()
    iters_all, conv_all = [], []
    for st in stacks:
        X, U, info = batched(st)
        iters_all.append(np.asarray(info["iters"]))
        conv_all.append(np.asarray(info["converged"]))
    _ = float(U.sum())
    dt = time.perf_counter() - t0
    iters_all = np.concatenate(iters_all)
    conv_all = np.concatenate(conv_all)
    tax = 1.0 - iters_all.reshape(-1, B).mean(axis=1) \
        / iters_all.reshape(-1, B).max(axis=1)
    base = dict(
        piece="run_to_max_hetero", problems_per_s=round(conv_all.sum() / dt, 1),
        converged_frac=round(float(conv_all.mean()), 4),
        it_mean=round(float(iters_all.mean()), 1),
        it_med=float(np.median(iters_all)), it_max=int(iters_all.max()),
        lane_idle_tax=round(float(tax.mean()), 3),
    )
    print(json.dumps(base), flush=True)

    # ---- difficulty-sorted batching: reclaim the tax with ZERO machinery ----
    # sort the stream by a difficulty proxy (the x0 perturbation scale the
    # serving layer knows anyway) so each batch is roughly homogeneous and
    # run-to-max wastes only the within-batch spread
    order = np.argsort(scales)
    sorted_stream = [stream[i] for i in order]
    stacks_s = [jax.tree.map(lambda *xs: jnp.stack(xs), *sorted_stream[k:k + B])
                for k in range(0, S, B)]
    t0 = time.perf_counter()
    iters_all, conv_all = [], []
    for st in stacks_s:
        X, U, info = batched(st)
        iters_all.append(np.asarray(info["iters"]))
        conv_all.append(np.asarray(info["converged"]))
    _ = float(U.sum())
    dt = time.perf_counter() - t0
    iters_all = np.concatenate(iters_all)
    conv_all = np.concatenate(conv_all)
    tax_s = 1.0 - iters_all.reshape(-1, B).mean(axis=1) \
        / iters_all.reshape(-1, B).max(axis=1)
    print(json.dumps(dict(
        piece="run_to_max_sorted",
        problems_per_s=round(conv_all.sum() / dt, 1),
        converged_frac=round(float(conv_all.mean()), 4),
        it_mean=round(float(iters_all.mean()), 1),
        lane_idle_tax=round(float(tax_s.mean()), 3),
        vs_unsorted=round((conv_all.sum() / dt) / base["problems_per_s"], 3),
    )), flush=True)

    # ---- continuous batching (lane refill) ----------------------------------
    for chunk_it in (2, 4, 6):
        # warm with the SAME static shapes (S is baked into the jitted
        # while-program; a smaller warmup stream compiles a different
        # program and the measured run pays the full compile)
        out = solve_stream(solver, stream, B=B, chunk_it=chunk_it, max_it=25)
        t0 = time.perf_counter()
        out = solve_stream(solver, stream, B=B, chunk_it=chunk_it, max_it=25)
        dt = time.perf_counter() - t0
        conv = sum(1 for o in out if o[2]["converged"])
        its = np.array([o[2]["iters"] for o in out])
        print(json.dumps(dict(
            piece=f"stream_refill_chunk{chunk_it}",
            problems_per_s=round(conv / dt, 1),
            converged_frac=round(conv / S, 4),
            it_mean=round(float(its.mean()), 1),
            vs_run_to_max=round((conv / dt) / base["problems_per_s"], 3),
        )), flush=True)


if __name__ == "__main__":
    main()
