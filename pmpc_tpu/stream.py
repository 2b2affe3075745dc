"""Continuous batching for heterogeneous solve streams (lane refill).

The fused vmapped solver runs every lane of a batch to the BATCH max
iteration count: with heterogeneous difficulty, converged lanes idle while
stragglers finish (the round-4 roofline's lane-idle tax). This module keeps
a fixed B-lane device batch busy from a STREAM of problems: the SCP loop
advances in chunks (`build_scp_solver(...).run_chunk`), and between chunks
the host swaps finished problems out and fresh ones in, re-initializing
only those lanes' carries. The TPU-idiomatic analog of the reference farm's
greedy dispatch + requeue (``pmpc/remote.py:391-452``) — work stays resident
on device, only done-flags and swapped lanes cross the host boundary.

Cost model: every chunk boundary pays one host sync (ONE bool-vector pull;
~27 ms through a remote-TPU tunnel, ~us on an attached chip), so
``chunk_it`` trades sync overhead against refill granularity.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import numpy as np


def solve_stream(
    solver,
    stream: Sequence[Any],
    B: int,
    chunk_it: int = 4,
    max_it: int = 10_000,
    max_rounds: int = 10_000,
) -> List[Tuple[np.ndarray, np.ndarray, dict]]:
    """Solve a stream of same-shape problems with lane refill.

    Args:
        solver: a `build_scp_solver(...)` result (carries ``init_carry`` /
            ``run_chunk`` / ``extract``).
        stream: sequence of single-problem `SCPData` pytrees (unbatched).
        B: device batch width (lanes).
        chunk_it: SCP iterations per device call between refill points.
        max_it: iteration budget per problem — a lane that reaches it
            without converging is retired (``info["converged"]=False``) and
            refilled, mirroring the solver's own cap.

    Returns:
        list of (X_traj, U, info) in input order; ``info["iters"]`` is the
        lane's own iteration count (not the batch max).
    """
    import jax
    import jax.numpy as jnp

    S = len(stream)
    if S == 0:
        return []
    B = min(B, S)

    chunk = jax.jit(jax.vmap(
        lambda d, c: solver.run_chunk(d, c, chunk_it)))
    init_b = jax.jit(jax.vmap(solver.init_carry))
    extract_b = jax.jit(jax.vmap(solver.extract))

    stack = lambda probs: jax.tree.map(
        lambda *xs: jnp.stack(xs), *probs)

    lane_prob = list(range(B))  # problem index per lane (-1 = parked)
    next_p = B
    data = stack([stream[i] for i in range(B)])
    carry = init_b(data)
    results: List[Any] = [None] * S
    n_done = 0

    for _ in range(max_rounds):
        carry = chunk(data, carry)
        done = np.asarray(carry[3])  # (B,) — the one per-chunk sync
        iters = np.asarray(carry[2])
        fin = done | (iters >= max_it)
        hot = [i for i in range(B) if fin[i] and lane_prob[i] >= 0]
        if not hot:
            continue
        # retire the finished lanes: freeze budget-capped ones (done=False
        # lanes would keep iterating) — refilled lanes get re-initialized
        # carries below anyway
        idx_hot = jnp.asarray(np.array(hot))
        carry = carry[:3] + (carry[3].at[idx_hot].set(True),) + carry[4:]
        X_b, U_b, info_b = extract_b(data, carry)
        X_b, U_b = np.asarray(X_b), np.asarray(U_b)
        iters_b = np.asarray(info_b["iters"])
        resid_b = np.asarray(info_b["resid"])
        conv_b = np.asarray(info_b["converged"]) & done
        refill_rows = []
        for i in hot:
            p = lane_prob[i]
            results[p] = (X_b[i], U_b[i],
                          dict(iters=int(iters_b[i]),
                               resid=float(resid_b[i]),
                               converged=bool(conv_b[i])))
            n_done += 1
            if next_p < S:
                lane_prob[i] = next_p
                refill_rows.append((i, stream[next_p]))
                next_p += 1
            else:
                lane_prob[i] = -1  # parked: carry stays done -> frozen
        if n_done == S:
            break
        if refill_rows:
            # FIXED-shape refill: rebuild the full B-lane stack on the host
            # and blend carries with a boolean mask. Shape-varying updates
            # (at[idx].set with per-round index widths) would recompile the
            # init/scatter programs once per distinct refill count — ~64
            # compiles at tens of seconds each through a remote toolchain
            # (measured: the variable-width version ran 27x SLOWER than
            # run-to-max batching; this version is the fix).
            mask = np.zeros(B, bool)
            for i, _ in refill_rows:
                mask[i] = True
            data = stack([stream[lane_prob[i]] if lane_prob[i] >= 0
                          else stream[0] for i in range(B)])
            fresh = init_b(data)
            mask_d = jnp.asarray(mask)

            def blend(old, new):
                m = mask_d.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            carry = jax.tree.map(blend, carry, fresh)
    else:
        raise RuntimeError("solve_stream: max_rounds exhausted")
    return results
