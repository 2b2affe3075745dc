"""Batched primal-dual interior-point method for the condensed consensus QP.

This is the TPU-native replacement for the reference's CPU cone/QP solvers
(ECOS interior-point, ``PMPC.jl/src/cone_solver.jl``; OSQP ADMM,
``PMPC.jl/src/osqp_solver.jl``): a Mehrotra predictor-corrector primal-dual
IPM over the condensed variable z = [u_cons; u_free_1..M] with box constraints
on controls and (condensed) states,

    min 0.5 z'Hz + q'z   s.t.  lo_u <= u <= hi_u,  lo_x <= Ft z + g <= hi_x.

Key structural facts exploited:
- every IPM Newton matrix is H plus diagonal updates (control boxes) plus
  per-particle ``Ft' D Ft`` terms (state boxes) — it keeps the ARROW structure,
  so each iteration costs one batched per-particle Cholesky + consensus Schur
  solve, reused for both the predictor and corrector steps,
- infinite/absent bounds are handled by static flags (groups compiled out) and
  per-row masks (rows frozen at s=1, lam=0), keeping all shapes static,
- everything vmaps over a leading scenario-batch axis; per-particle work is
  already batched internally.

The iteration count is a static bound; converged problems freeze in place
(`jnp.where`), so one compiled program serves the whole batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils import with_matmul_precision
from .reduced import (
    CondensedQP,
    H_apply_factored,
    arrow_apply,
    arrow_factor,
    assemble_condensed,
    recover_XU,
)


class BoxBounds(NamedTuple):
    """Two-sided bounds in the consensus layout (entries +-inf when absent)."""

    lo_c: jax.Array  # (nc,)     consensus control lower bounds
    hi_c: jax.Array  # (nc,)
    lo_f: jax.Array  # (M, nf)   free control bounds
    hi_f: jax.Array  # (M, nf)
    lo_x: jax.Array  # (M, NX)   state bounds
    hi_x: jax.Array  # (M, NX)


class IPMState(NamedTuple):
    uc: jax.Array
    uf: jax.Array
    s: jax.Array  # flat slacks [c_lo; c_hi; f_lo; f_hi; x_lo; x_hi]
    lam: jax.Array  # flat multipliers, same order
    mu: jax.Array  # scalar duality measure
    done: jax.Array  # scalar bool (converged OR diverged: stop updating)
    ok: jax.Array  # scalar bool (converged)
    iters: jax.Array  # iterations actually taken


def box_weighted_K(cqp: CondensedQP, wc, wf, wx, Ftc, Ftf, has_u: bool, has_x: bool):
    """Arrow blocks of ``H + G' diag(w) G`` for the box-constraint Jacobians:
    diagonal updates from control boxes, per-particle ``Ft' D Ft`` from state
    boxes. Shared by the IPM and the smooth-barrier Newton solver."""
    dtype = cqp.qf.dtype
    nc, nf = cqp.nc, cqp.nf
    Kcc, Kcf, Kff = cqp.Hcc, cqp.Hcf, cqp.Hff
    if has_u:
        Kcc = Kcc + jnp.diag(wc)
        eye_f = jnp.eye(nf, dtype=dtype)
        Kff = Kff + wf[:, :, None] * eye_f
    if has_x:
        DFtf = wx[:, :, None] * Ftf
        Kff = Kff + jnp.einsum("mji,mjk->mik", Ftf, DFtf)
        if nc > 0:
            DFtc = wx[:, :, None] * Ftc
            Kcc = Kcc + jnp.einsum("mji,mjk->ik", Ftc, DFtc)
            Kcf = Kcf + jnp.einsum("mji,mjk->mik", Ftc, DFtf)
    return Kcc, Kcf, Kff


@partial(jax.jit, static_argnames=("has_u", "has_x", "iters", "tol_exp", "kappa", "mu_target"))
@with_matmul_precision("highest")
def ipm_core(
    cqp: CondensedQP,
    bounds: BoxBounds,
    has_u: bool,
    has_x: bool,
    iters: int = 30,
    tol_exp: int = -8,
    kappa: float = 0.0,
    mu_target: float = 0.0,
    warm: Optional[Tuple] = None,
):
    """Run the predictor-corrector IPM. Returns (uc, uf, stats dict of arrays).

    ``mu_target > 0`` stops on the CENTRAL PATH at duality measure mu_target
    instead of at the exact solution: the central-path point at mu = 1/alpha is
    precisely the solution of the reference's logbarrier-smoothed problem
    (``cone_utils.jl:173-202``), so the ``smooth_cstr="logbarrier"`` path reuses
    this solver with ``mu_target = 1/smooth_alpha``.

    Internally all 2x(consensus + free + state) constraint groups live in ONE
    flat vector (order [c_lo; c_hi; f_lo; f_hi; x_lo; x_hi]) so the per-
    iteration bookkeeping is a handful of fused vector ops instead of dozens
    of small per-group kernels. ``warm`` is (uc, uf, s_flat, lam_flat).
    """
    dtype = cqp.qf.dtype
    tol = jnp.asarray(10.0 ** tol_exp, dtype=dtype)
    mu_target_pos = float(mu_target) > 0.0  # static: selects the centering phase
    mu_target = jnp.asarray(mu_target, dtype=dtype)
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    Ftc, Ftf = cqp.Ft[:, :, :nc], cqp.Ft[:, :, nc:]  # (M, NX, nc/nf)
    tau = jnp.asarray(0.99 if dtype == jnp.float64 else 0.95, dtype=dtype)
    mnf, mnx = M * nf, M * NX
    o_chi, o_flo, o_fhi, o_xlo, o_xhi, mtot = (
        nc, 2 * nc, 2 * nc + mnf, 2 * nc + 2 * mnf, 2 * nc + 2 * mnf + mnx,
        2 * nc + 2 * mnf + 2 * mnx,
    )

    lo_flat = jnp.concatenate([
        bounds.lo_c, bounds.hi_c, bounds.lo_f.reshape(-1), bounds.hi_f.reshape(-1),
        bounds.lo_x.reshape(-1), bounds.hi_x.reshape(-1),
    ])
    mask = jnp.isfinite(lo_flat)
    n_act = jnp.maximum(jnp.sum(mask), 1).astype(dtype)

    def slack_vals(uc, uf):
        """s = h - Gz as one flat vector (garbage on masked rows)."""
        if has_x:
            x = jnp.einsum("mij,mj->mi", cqp.Ft, jnp.concatenate(
                [jnp.broadcast_to(uc, (M, nc)), uf], axis=-1)) + cqp.g
        else:  # state rows fully masked: skip the (M, NX, NU) matmul
            x = jnp.zeros((M, NX), dtype=dtype)
        return jnp.concatenate([
            uc - bounds.lo_c, bounds.hi_c - uc,
            (uf - bounds.lo_f).reshape(-1), (bounds.hi_f - uf).reshape(-1),
            (x - bounds.lo_x).reshape(-1), (bounds.hi_x - x).reshape(-1),
        ])

    def g_dot_z(duc, duf):
        """G dz as a flat vector (state part only when needed)."""
        if has_x:
            dx = jnp.einsum("mij,mj->mi", cqp.Ft, jnp.concatenate(
                [jnp.broadcast_to(duc, (M, nc)), duf], axis=-1)).reshape(-1)
        else:
            dx = jnp.zeros((mnx,), dtype=dtype)
        duf_f = duf.reshape(-1)
        return jnp.concatenate([-duc, duc, -duf_f, duf_f, -dx, dx])

    def gT_dot(v):
        """(G' v) split into consensus/free contributions."""
        bc = v[o_chi:o_flo] - v[:nc]
        bf = (v[o_fhi:o_xlo] - v[o_flo:o_fhi]).reshape(M, nf)
        if has_x:
            dv = (v[o_xhi:] - v[o_xlo:o_xhi]).reshape(M, NX)
            bc = bc + jnp.einsum("mji,mj->i", Ftc, dv)
            bf = bf + jnp.einsum("mji,mj->mi", Ftf, dv)
        return bc, bf

    # -- initialization ----------------------------------------------------------
    if warm is not None:
        # warm start from a previous (slightly perturbed) solve: reuse the
        # primal/dual point with a Yildirim-Wright style interior shift —
        # skips the eq-solve factorization and typically cuts the iteration
        # count when the active set is stable (the jitted-loop analog of the
        # reference's threaded solver_state, pmpc/scp_mpc.py:366-373)
        uc0, uf0, warm_s, warm_lam = warm
        delta = jnp.asarray(1e-2, dtype)
        s0 = jnp.where(mask, jnp.maximum(warm_s, delta), 1.0)
        lam0 = jnp.where(mask, jnp.maximum(warm_lam, delta), 0.0)
    else:
        F0 = arrow_factor(cqp.Hcc, cqp.Hcf, cqp.Hff, jitter=kappa)
        uc0, uf0 = arrow_apply(F0, -cqp.qc, -cqp.qf)
        sv = slack_vals(uc0, uf0)
        s0 = jnp.where(mask, jnp.maximum(sv, 1.0), 1.0)
        lam0 = jnp.where(mask, 1.0 / s0, 0.0)
    mu0 = jnp.sum(jnp.where(mask, s0 * lam0, 0.0)) / n_act
    state0 = IPMState(uc0, uf0, s0, lam0, mu0,
                      jnp.asarray(False), jnp.asarray(False),
                      jnp.asarray(0, dtype=jnp.int32))

    def grad_lagrangian(uc, uf, lam):
        """(gc, gf) = Hz + q + G'lam; Hz in FACTORED form when available
        (condensation squares the conditioning — factored residuals keep f32
        gradients accurate, and inexact Newton with accurate residuals
        converges to the accurate KKT point)."""
        if cqp.Qt is not None:
            Hc, Hf = H_apply_factored(cqp, uc, uf)
            gc, gf = Hc + cqp.qc, Hf + cqp.qf
        else:
            gc = cqp.Hcc @ uc + jnp.einsum("mij,mj->i", cqp.Hcf, uf) + cqp.qc
            gf = jnp.einsum("mji,mj->mi", cqp.Hcf, jnp.broadcast_to(uc, (M, nc))) \
                + jnp.einsum("mij,mj->mi", cqp.Hff, uf) + cqp.qf
        dc, df = gT_dot(lam)
        return gc + dc, gf + df

    def make_body(mehrotra: bool):
        return partial(body, mehrotra)

    def body(mehrotra, k, state):
        uc, uf, s, lam, mu, done, ok, it_count = state
        sv = slack_vals(uc, uf)
        r_p = jnp.where(mask, s - sv, 0.0)
        gc, gf = grad_lagrangian(uc, uf, lam)

        # capped scaling ratios: uncapped lam/s overflows f32 Cholesky late
        w_max = jnp.asarray(1e14 if dtype == jnp.float64 else 1e7, dtype)
        w = jnp.where(mask, jnp.minimum(lam / s, w_max), 0.0)

        Kcc, Kcf, Kff = box_weighted_K(
            cqp,
            w[:nc] + w[o_chi:o_flo],
            (w[o_flo:o_fhi] + w[o_fhi:o_xlo]).reshape(M, nf),
            (w[o_xlo:o_xhi] + w[o_xhi:]).reshape(M, NX),
            Ftc, Ftf, has_u=has_u, has_x=has_x,
        )
        F = arrow_factor(Kcc, Kcf, Kff, jitter=kappa)

        def newton_rhs(r_c):
            v = jnp.where(mask, (lam * r_p - r_c) / s, 0.0)
            dc, df = gT_dot(v)
            return (-(gc + dc), -(gf + df)), v

        def recover_steps(duc, duf, v):
            gdz = g_dot_z(duc, duf)
            ds = jnp.where(mask, -r_p - gdz, 0.0)
            dlam = jnp.where(mask, w * gdz + v, 0.0)
            return ds, dlam

        def step_len(s_, ds, lam_, dlam):
            rp_ = jnp.where(mask & (ds < 0), -s_ / jnp.where(ds < 0, ds, -1.0), jnp.inf)
            rd_ = jnp.where(mask & (dlam < 0), -lam_ / jnp.where(dlam < 0, dlam, -1.0),
                            jnp.inf)
            ap = jnp.minimum(1.0, tau * jnp.min(rp_)) if mtot else jnp.asarray(1.0, dtype)
            ad = jnp.minimum(1.0, tau * jnp.min(rd_)) if mtot else jnp.asarray(1.0, dtype)
            return ap, ad

        if mehrotra:
            # predictor (affine) step
            r_c_aff = jnp.where(mask, s * lam, 0.0)
            (bc, bf), v_aff = newton_rhs(r_c_aff)
            duc_a, duf_a = arrow_apply(F, bc, bf)
            ds_a, dlam_a = recover_steps(duc_a, duf_a, v_aff)
            ap_a, ad_a = step_len(s, ds_a, lam, dlam_a)
            mu_aff = jnp.sum(jnp.where(
                mask, (s + ap_a * ds_a) * (lam + ad_a * dlam_a), 0.0)) / n_act
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
            sig_mu = jnp.maximum(sigma * mu, mu_target)  # central-path floor
            # corrector (reuses the factorization)
            r_c = jnp.where(mask, s * lam + ds_a * dlam_a - sig_mu, 0.0)
        else:
            # pure centering Newton on the perturbed KKT at mu_target
            r_c = jnp.where(mask, s * lam - mu_target, 0.0)
        (bc, bf), v = newton_rhs(r_c)
        duc, duf = arrow_apply(F, bc, bf)
        ds, dlam = recover_steps(duc, duf, v)
        ap, ad = step_len(s, ds, lam, dlam)

        uc_n = uc + ap * duc
        uf_n = uf + ap * duf
        s_n = jnp.where(mask, s + ap * ds, 1.0)
        lam_n = jnp.where(mask, lam + ad * dlam, 0.0)
        mu_n = jnp.sum(jnp.where(mask, s_n * lam_n, 0.0)) / n_act

        # convergence / divergence tests
        rp_inf = jnp.max(jnp.abs(r_p)) if mtot else jnp.asarray(0.0, dtype)
        gd_inf = jnp.maximum(
            jnp.max(jnp.abs(gc)) if gc.size else jnp.asarray(0.0, dtype),
            jnp.max(jnp.abs(gf)) if gf.size else jnp.asarray(0.0, dtype),
        )
        # non-finite steps freeze to the PREVIOUS iterate (before any write)
        step_bad = ~(jnp.isfinite(mu_n)
                     & jnp.isfinite(jnp.sum(uc_n) if uc_n.size else jnp.asarray(0.0, dtype))
                     & jnp.isfinite(jnp.sum(uf_n)))
        mu_ok = mu_n < jnp.maximum(tol, mu_target * 1.05)
        # with a central-path target, the products must also be CENTERED at
        # mu_target (that is what makes the point the logbarrier solution)
        center_err = jnp.max(jnp.where(mask, jnp.abs(s_n * lam_n - mu_target), 0.0)) \
            if mtot else jnp.asarray(0.0, dtype)
        centered = (mu_target <= 0) | (center_err < 0.02 * mu_target + tol)
        now_done = mu_ok & centered & (rp_inf < jnp.sqrt(tol)) & (gd_inf < 1e3 * tol)
        now_bad = step_bad | (mu_n > 1e12)

        frozen = done | now_bad
        keep = lambda new, old: jax.tree.map(lambda a, b: jnp.where(frozen, b, a), new, old)
        new_state = IPMState(uc_n, uf_n, s_n, lam_n, mu_n,
                             jnp.asarray(False), ok | now_done, it_count + 1)
        old_state = IPMState(uc, uf, s, lam, mu, jnp.asarray(False), ok, it_count)
        merged = keep(new_state, old_state)
        return merged._replace(done=done | now_done | now_bad, ok=ok | now_done)

    # while_loop: under vmap the loop stops when EVERY lane is done
    main_body = make_body(True)

    def while_cond(state):
        return (~state.done) & (state.iters < iters)

    state = lax.while_loop(while_cond, lambda st: main_body(0, st), state0)
    if mu_target_pos:
        # finish with pure centering steps: Mehrotra's second-order correction
        # hunts mu -> 0 and wobbles around the mu_target point
        state = state._replace(done=state.done & ~state.ok, ok=jnp.asarray(False))
        state = lax.fori_loop(0, 10, make_body(False), state)
    stats = dict(mu=state.mu, iters=state.iters, converged=state.ok,
                 s=state.s, lam=state.lam)
    return state.uc, state.uf, stats


def _layout_bounds(u_l, u_u, x_l, x_u, M, N, NX, nc, nf, udim, dtype):
    """Map (M,N,udim)/(M,N,xdim) bound arrays to the consensus layout, filling
    +-inf where absent. Consensus control bounds come from particle 0
    (parity with ``lqp_utils.jl:323-331``)."""
    inf = np.inf

    def flat_u(b, fill):
        if b is None:
            return np.full((M, N * udim), fill, dtype=dtype)
        return np.asarray(b, dtype=dtype).reshape(M, N * udim)

    def flat_x(b, fill):
        if b is None:
            return np.full((M, NX), fill, dtype=dtype)
        return np.asarray(b, dtype=dtype).reshape(M, NX)

    ul, uu = flat_u(u_l, -inf), flat_u(u_u, inf)
    return BoxBounds(
        lo_c=jnp.asarray(ul[0, :nc]), hi_c=jnp.asarray(uu[0, :nc]),
        lo_f=jnp.asarray(ul[:, nc:]), hi_f=jnp.asarray(uu[:, nc:]),
        lo_x=jnp.asarray(flat_x(x_l, -inf)), hi_x=jnp.asarray(flat_x(x_u, inf)),
    )


def ipm_solve_np(
    base_args, reg_args, u_l, u_u, x_l, x_u,
    Nc: int,
    weights: Optional[jax.Array] = None,
    settings: Optional[Dict[str, Any]] = None,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, Any]]:
    """numpy frontend: assemble the condensed QP and run the IPM."""
    settings = settings or {}
    if settings.get("extra_cstrs"):
        raise NotImplementedError(
            "extra_cstrs on the exact IPM path land with the cone support; "
            "use smooth_cstr for now"
        )
    f = base_args[1]
    M, N = f.shape[0], f.shape[1]
    udim = base_args[3].shape[-1]
    xdim = f.shape[-1]
    dtype = np.dtype(np.asarray(f).dtype)

    cqp = assemble_condensed(*base_args, *reg_args, Nc=Nc, weights=weights)
    nc, nf = Nc * udim, (N - Nc) * udim
    bounds = _layout_bounds(u_l, u_u, x_l, x_u, M, N, N * xdim, nc, nf, udim, dtype)

    has_u = u_l is not None or u_u is not None
    has_x = x_l is not None or x_u is not None
    iters = int(settings.get("ipm_iters", 30))
    tol_exp = int(settings.get("ipm_tol_exp", -8 if dtype == np.float64 else -5))
    kappa = float(settings.get("ipm_kappa", 0.0 if dtype == np.float64 else 1e-7))
    mu_target = float(settings.get("mu_target", 0.0))

    uc, uf, stats = ipm_core(
        cqp, bounds, has_u=has_u, has_x=has_x, iters=iters, tol_exp=tol_exp,
        kappa=kappa, mu_target=mu_target,
    )
    X, U = recover_XU(cqp, uc, uf, N=N)
    data = dict(
        solver_state=settings.get("solver_state"),
        ipm_mu=float(stats["mu"]),
        ipm_iters=int(stats["iters"]),
        ipm_converged=bool(stats["converged"]),
    )
    return np.asarray(X), np.asarray(U), data
