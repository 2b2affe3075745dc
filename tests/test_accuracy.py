"""float32 accuracy parity: the fused solver must track its own float64 run
within the BASELINE tolerance (||U - U_ref||_inf <= 1e-3) on the flagship
consensus configuration."""

import numpy as np
import jax
import jax.numpy as jnp

from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data
from fixtures import unicycle_step


def _data(dtype):
    M, N, xdim, udim = 8, 30, 4, 2
    rng = np.random.default_rng(0)
    x0 = (np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))).astype(dtype)
    Q = np.tile(np.eye(xdim, dtype=dtype), (M, N, 1, 1))
    R = np.tile((1e-2 * np.eye(udim)).astype(dtype), (M, N, 1, 1))
    return make_scp_data(x0, Q, R, reg_x=1.0, reg_u=0.1,
                         u_l=-np.ones((M, N, udim), dtype),
                         u_u=np.ones((M, N, udim), dtype))


def test_f32_tracks_f64_within_1e3():
    M, N, xdim, udim, Nc = 8, 30, 4, 2, 5
    mk = lambda tol: build_scp_solver(
        unicycle_step, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=60, res_tol=1e-5, has_u_bounds=True, ipm_iters=25,
        ipm_tol_exp=tol)
    X64, U64, i64 = mk(-9)(_data(np.float64))
    X32, U32, i32 = mk(-6)(_data(np.float32))
    err = np.abs(np.asarray(U32, np.float64) - np.asarray(U64)).max()
    assert err <= 1e-3, f"f32/f64 divergence {err:.2e} (f32 resid {float(i32['resid']):.1e})"
