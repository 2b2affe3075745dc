"""Host-BLAS factor callback (`ops/linalg._use_host_inverse_factor` path).

On the CPU backend, n>160 SPD factors go to numpy/OpenBLAS through
`pure_callback` (jaxlib's `lapack_potrf_ffi` runs unblocked reference code,
~40x slower), returning the INVERSE factor. These tests pin the contract:
correct solves in f32 and in scope-enabled f64 (the bitcast transport must
survive the thread-local x64 config), and NaN on non-SPD input (breakdown
detection downstream relies on it).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmpc_tpu.ops.linalg import spd_apply, spd_factor, _use_host_inverse_factor

N_BIG = 260  # > the 160 threshold


def _spd(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return np.asarray(A @ A.T + n * np.eye(n), dtype)


@pytest.mark.skipif(not _use_host_inverse_factor(N_BIG),
                    reason="host factor path disabled or not on CPU")
def test_host_factor_f32_solve():
    A = _spd(N_BIG, np.float32)
    b = np.linspace(-1, 1, N_BIG).astype(np.float32)

    @jax.jit
    def solve(A, b):
        return spd_apply(spd_factor(A, jitter=0.0), b)

    x = np.asarray(solve(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    assert np.max(np.abs(x - ref)) < 1e-3


@pytest.mark.skipif(not _use_host_inverse_factor(N_BIG),
                    reason="host factor path disabled or not on CPU")
def test_host_factor_f64_under_scoped_x64():
    """float64 operands must survive the callback boundary even though the
    XLA runtime thread sees the global (x64-off) config — the uint8 bitcast
    transport is what this pins."""
    A = _spd(N_BIG, np.float64, seed=1)
    b = np.linspace(-2, 2, N_BIG)
    with jax.enable_x64(True):
        @jax.jit
        def solve(A, b):
            return spd_apply(spd_factor(A, jitter=0.0), b)

        x = np.asarray(solve(jnp.asarray(A, jnp.float64),
                             jnp.asarray(b, jnp.float64)))
    ref = np.linalg.solve(A, b)
    assert x.dtype == np.float64
    assert np.max(np.abs(x - ref)) < 1e-8


@pytest.mark.skipif(not _use_host_inverse_factor(N_BIG),
                    reason="host factor path disabled or not on CPU")
def test_host_factor_nan_on_indefinite():
    A = -np.eye(N_BIG, dtype=np.float32)  # negative definite
    F = np.asarray(jax.jit(lambda A: spd_factor(A, jitter=0.0))(jnp.asarray(A)))
    assert np.isnan(F).any()


@pytest.mark.skipif(not _use_host_inverse_factor(N_BIG),
                    reason="host factor path disabled or not on CPU")
def test_host_factor_batched_vmap():
    As = np.stack([_spd(N_BIG, np.float32, seed=s) for s in range(3)])
    bs = np.stack([np.linspace(-1, 1, N_BIG)] * 3).astype(np.float32)

    @jax.jit
    def solve(A, b):
        return spd_apply(spd_factor(A, jitter=0.0), b)

    xs = np.asarray(jax.vmap(solve)(jnp.asarray(As), jnp.asarray(bs)))
    for i in range(3):
        ref = np.linalg.solve(As[i].astype(np.float64), bs[i].astype(np.float64))
        assert np.max(np.abs(xs[i] - ref)) < 1e-3
