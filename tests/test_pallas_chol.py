"""Pallas factor kernels, run through the interpreter on CPU.

The rest of the suite never exercises `ops/pallas_chol.py` (the dispatch in
`ops/linalg.py` only selects Pallas on a real TPU backend), so both kernel
variants and the custom_vmap batch-fold are validated here in interpret mode
against dense numpy references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmpc_tpu.ops import pallas_chol


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_chol, "INTERPRET", True)
    # the custom_vmap wrappers close over the interpret flag at trace time;
    # drop any cached instances built with the real-TPU setting
    monkeypatch.setattr(pallas_chol, "_FACTOR_CACHE", {})
    monkeypatch.setattr(pallas_chol, "_FACTOR_DIAG_CACHE", {})
    yield
    jax.clear_caches()  # cached executables traced with INTERPRET=True


def _spd(rng, B, n, dtype=np.float32):
    G = rng.normal(size=(B, n, n)).astype(dtype) / np.sqrt(n)
    return G @ np.swapaxes(G, -1, -2) + np.eye(n, dtype=dtype)


def _ref_inv_chol(A):
    L = np.linalg.cholesky(np.asarray(A, np.float64))
    return np.linalg.inv(L)


def test_small_variant_matches_numpy():
    rng = np.random.default_rng(0)
    A = _spd(rng, 3, 12)
    assert pallas_chol._fits_small(12)
    M = np.asarray(pallas_chol.pallas_inv_cholesky(jnp.asarray(A)))
    ref = _ref_inv_chol(A)
    assert np.max(np.abs(M - ref)) < 5e-5


def test_big_variant_matches_numpy(monkeypatch):
    # force the single-buffer in-place kernel at a small, fast size; n=12 is
    # not a multiple of 8, so this also covers the identity-padding path
    monkeypatch.setattr(pallas_chol, "_fits_small", lambda n: False)
    rng = np.random.default_rng(1)
    A = _spd(rng, 3, 12)
    M = np.asarray(pallas_chol.pallas_inv_cholesky(jnp.asarray(A)))
    ref = _ref_inv_chol(A)
    assert np.max(np.abs(M - ref)) < 5e-5


def test_variants_agree(monkeypatch):
    rng = np.random.default_rng(2)
    A = jnp.asarray(_spd(rng, 2, 16))
    Ms = np.asarray(pallas_chol.pallas_inv_cholesky(A))
    monkeypatch.setattr(pallas_chol, "_fits_small", lambda n: False)
    monkeypatch.setattr(pallas_chol, "_FACTOR_CACHE", {})
    Mb = np.asarray(pallas_chol.pallas_inv_cholesky(A))
    assert np.max(np.abs(Ms - Mb)) < 1e-5


def test_jitter_applied():
    rng = np.random.default_rng(3)
    A = _spd(rng, 2, 8)
    jit_val = 0.5
    M = np.asarray(pallas_chol.pallas_inv_cholesky(jnp.asarray(A), jitter=jit_val))
    ref = _ref_inv_chol(A + jit_val * np.eye(8, dtype=np.float32))
    assert np.max(np.abs(M - ref)) < 5e-5


def test_non_spd_produces_nan():
    A = -np.eye(8, dtype=np.float32)[None]
    M = np.asarray(pallas_chol.pallas_inv_cholesky(jnp.asarray(A)))
    assert np.isnan(M).any()


def test_custom_vmap_folds_batch_axis():
    """jax.vmap over a leading axis must equal the per-slice factorization
    (the rule folds (B0, B, n, n) into one (B0*B, n, n) kernel call)."""
    rng = np.random.default_rng(4)
    A = _spd(rng, 6, 10).reshape(2, 3, 10, 10)
    Aj = jnp.asarray(A)
    out = np.asarray(jax.vmap(pallas_chol.pallas_inv_cholesky)(Aj))
    for i in range(2):
        ref = np.asarray(pallas_chol.pallas_inv_cholesky(Aj[i]))
        assert np.max(np.abs(out[i] - ref)) < 1e-6


def test_custom_vmap_under_jit():
    rng = np.random.default_rng(5)
    A = jnp.asarray(_spd(rng, 4, 10).reshape(2, 2, 10, 10))
    f = jax.jit(jax.vmap(pallas_chol.pallas_inv_cholesky))
    out = np.asarray(f(A))
    ref = _ref_inv_chol(np.asarray(A).reshape(4, 10, 10)).reshape(2, 2, 10, 10)
    assert np.max(np.abs(out - ref)) < 5e-5


def test_batch_padding_to_tile():
    """B not a multiple of the 128-lane tile: padded entries must not leak."""
    rng = np.random.default_rng(6)
    A = _spd(rng, 5, 9)
    M = np.asarray(pallas_chol.pallas_inv_cholesky(jnp.asarray(A)))
    ref = _ref_inv_chol(A)
    assert M.shape == (5, 9, 9)
    assert np.max(np.abs(M - ref)) < 5e-5


def test_diag_variant_small_matches_numpy():
    rng = np.random.default_rng(7)
    A = _spd(rng, 3, 12)
    w = rng.uniform(0.1, 2.0, size=(3, 12)).astype(np.float32)
    assert pallas_chol._fits_small(12)
    M = np.asarray(pallas_chol.pallas_inv_cholesky_diag(
        jnp.asarray(A), jnp.asarray(w)))
    ref = _ref_inv_chol(A + np.stack([np.diag(wi) for wi in w]))
    assert np.max(np.abs(M - ref)) < 5e-5


def test_diag_variant_big_matches_numpy(monkeypatch):
    monkeypatch.setattr(pallas_chol, "_fits_small", lambda n: False)
    monkeypatch.setattr(pallas_chol, "_FACTOR_DIAG_CACHE", {})
    rng = np.random.default_rng(8)
    A = _spd(rng, 3, 12)  # n=12: covers the identity-padded rows + w zero-pad
    w = rng.uniform(0.1, 2.0, size=(3, 12)).astype(np.float32)
    M = np.asarray(pallas_chol.pallas_inv_cholesky_diag(
        jnp.asarray(A), jnp.asarray(w), jitter=0.25))
    ref = _ref_inv_chol(A + np.stack([np.diag(wi + 0.25) for wi in w]))
    assert np.max(np.abs(M - ref)) < 5e-5


def test_diag_variant_custom_vmap():
    """vmap folding with BOTH operands batched, and an unbatched A
    broadcast against a batched w (the IPM shape: invariant H, varying w)."""
    rng = np.random.default_rng(9)
    A = _spd(rng, 6, 10).reshape(2, 3, 10, 10)
    w = rng.uniform(0.1, 2.0, size=(2, 3, 10)).astype(np.float32)
    Aj, wj = jnp.asarray(A), jnp.asarray(w)
    out = np.asarray(jax.vmap(pallas_chol.pallas_inv_cholesky_diag)(Aj, wj))
    for i in range(2):
        ref = np.asarray(pallas_chol.pallas_inv_cholesky_diag(Aj[i], wj[i]))
        assert np.max(np.abs(out[i] - ref)) < 1e-6
    out2 = np.asarray(jax.vmap(
        lambda wv: pallas_chol.pallas_inv_cholesky_diag(Aj[0], wv))(wj))
    ref2 = _ref_inv_chol(
        A[0][None] + np.stack([[np.diag(wi) for wi in wrow] for wrow in w]))
    assert np.max(np.abs(out2 - ref2)) < 5e-5
