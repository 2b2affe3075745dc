"""Riccati-sweep LQR solver: O(N) stage-structured alternative to condensation.

The condensed path (`reduced.py`) materializes the O(N^2) dense sensitivity
``Ft`` — ideal for short horizons and huge batches. For long horizons the
classic backward/forward Riccati recursion solves the same equality-
constrained problem in O(N) with tiny per-stage matmuls under ``lax.scan``
(the "sparse, stage-structured" design the reference gets from its sparse
CPU solvers, re-expressed as scans; SURVEY §5 long-context note).

Cost semantics match the condensed assembly (`lqp_repr_Pq` without slew):
    sum_j 0.5 x_j'Qt_j x_j - xt_j'x_j + 0.5 u_j'Rt_j u_j - ut_j'u_j
    s.t.  x_j = c_j + A_j x_{j-1} + B_j u_j,   x_0 given,
with Qt = Q + reg_x I, xt = Q X_ref + reg_x X_prev (etc.).

Single-particle; vmap over particles/batches. Consensus (shared controls) and
slew coupling need the condensed path or state augmentation — asserted out.
Also returns the affine feedback gains (K_j, k_j), the control law the
reference exposes through rollouts (``types.jl:181-201``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import psd_solve
from ..utils import with_matmul_precision


class LQRSolution(NamedTuple):
    X: jax.Array  # (N, xdim)
    U: jax.Array  # (N, udim)
    K: jax.Array  # (N, udim, xdim) feedback gains (u_j = K_j x_{j-1} + k_j)
    k: jax.Array  # (N, udim)


@partial(jax.jit, static_argnames=())
@with_matmul_precision("highest")
def riccati_solve(x0, c, A, B, Qt, xt, Rt, ut) -> LQRSolution:
    """Solve the affine-dynamics tracking LQR via backward/forward scans.

    Args:
        x0: (xdim,) initial state.
        c: (N, xdim) affine dynamics offsets.
        A: (N, xdim, xdim), B: (N, xdim, udim).
        Qt: (N, xdim, xdim) state Hessians; xt: (N, xdim) state linear targets
            (cost 0.5 x'Qt x - xt'x).
        Rt: (N, udim, udim); ut: (N, udim) (cost 0.5 u'Rt u - ut'u).
    """
    N, xdim = c.shape
    udim = B.shape[-1]
    dtype = c.dtype

    def backward(carry, inp):
        P, p = carry  # value of stages j+1.. as 0.5 x'Px + p'x
        c_j, A_j, B_j, Qt_j, xt_j, Rt_j, ut_j = inp
        M = Qt_j + P
        m = p - xt_j
        Mc_m = M @ c_j + m
        Hu = Rt_j + B_j.T @ M @ B_j
        BtMA = B_j.T @ M @ A_j
        rhs = jnp.concatenate([BtMA, (B_j.T @ Mc_m - ut_j)[:, None]], axis=1)
        sol = psd_solve(Hu, rhs)  # (udim, xdim+1)
        K_j = -sol[:, :xdim]
        k_j = -sol[:, xdim]
        AtM = A_j.T @ M
        P_new = AtM @ A_j + BtMA.T @ K_j
        P_new = 0.5 * (P_new + P_new.T)
        p_new = A_j.T @ Mc_m + BtMA.T @ k_j
        return (P_new, p_new), (K_j, k_j)

    init = (jnp.zeros((xdim, xdim), dtype), jnp.zeros((xdim,), dtype))
    _, (K, k) = lax.scan(backward, init, (c, A, B, Qt, xt, Rt, ut), reverse=True)

    def forward(x, inp):
        c_j, A_j, B_j, K_j, k_j = inp
        u = K_j @ x + k_j
        x_next = c_j + A_j @ x + B_j @ u
        return x_next, (x_next, u)

    _, (X, U) = lax.scan(forward, x0, (c, A, B, K, k))
    return LQRSolution(X=X, U=U, K=K, k=k)


def riccati_solve_scp(x0, f, fx, fu, X_prev, U_prev, Q, R, X_ref, U_ref,
                      reg_x, reg_u) -> LQRSolution:
    """Riccati solve of one SCP subproblem (single particle, reference cost
    semantics; affine dynamics from the linearization convention
    x_j = f_j + fx_j (x_{j-1} - xlin_{j-1}) + fu_j (u_j - U_prev_j))."""
    xlin = jnp.concatenate([x0[None, :], X_prev[:-1]], axis=0)
    c = f - jnp.einsum("nij,nj->ni", fx, xlin) - jnp.einsum("nij,nj->ni", fu, U_prev)
    xdim = x0.shape[0]
    udim = U_prev.shape[-1]
    eye_x = jnp.eye(xdim, dtype=f.dtype)
    eye_u = jnp.eye(udim, dtype=f.dtype)
    Qt = Q + reg_x * eye_x
    Rt = R + reg_u * eye_u
    xt = jnp.einsum("nij,nj->ni", Q, X_ref) + reg_x * X_prev
    ut = jnp.einsum("nij,nj->ni", R, U_ref) + reg_u * U_prev
    return riccati_solve(x0, c, fx, fu, Qt, xt, Rt, ut)
