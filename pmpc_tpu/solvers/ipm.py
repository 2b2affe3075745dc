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
    s: Tuple  # slacks per group (clo, chi, flo, fhi, xlo, xhi)
    lam: Tuple  # multipliers per group
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


def _group(mask, s_val):
    """Initialize (s, lam) for a constraint group given initial slack values."""
    s0 = jnp.where(mask, jnp.maximum(s_val, 1.0), 1.0)
    lam0 = jnp.where(mask, 1.0 / s0, 0.0)
    return s0, lam0


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
    """
    dtype = cqp.qf.dtype
    tol = jnp.asarray(10.0 ** tol_exp, dtype=dtype)
    mu_target_pos = float(mu_target) > 0.0  # static: selects the centering phase
    mu_target = jnp.asarray(mu_target, dtype=dtype)
    M, nc, nf = cqp.M, cqp.nc, cqp.nf
    NX = cqp.g.shape[-1]
    Ftc, Ftf = cqp.Ft[:, :, :nc], cqp.Ft[:, :, nc:]  # (M, NX, nc/nf)
    tau = jnp.asarray(0.99 if dtype == jnp.float64 else 0.95, dtype=dtype)

    masks = (
        jnp.isfinite(bounds.lo_c), jnp.isfinite(bounds.hi_c),
        jnp.isfinite(bounds.lo_f), jnp.isfinite(bounds.hi_f),
        jnp.isfinite(bounds.lo_x), jnp.isfinite(bounds.hi_x),
    )
    n_act = sum(jnp.sum(m) for m in masks)
    n_act = jnp.maximum(n_act, 1).astype(dtype)

    def slacks(uc, uf):
        """Slack values s = h - Gz per group (garbage on masked rows)."""
        if has_x:
            x = jnp.einsum("mij,mj->mi", cqp.Ft, jnp.concatenate(
                [jnp.broadcast_to(uc, (M, nc)), uf], axis=-1)) + cqp.g
        else:  # state rows are fully masked: skip the (M, NX, NU) matmul
            x = jnp.zeros((M, NX), dtype=dtype)
        return (
            uc - bounds.lo_c, bounds.hi_c - uc,
            uf - bounds.lo_f, bounds.hi_f - uf,
            x - bounds.lo_x, bounds.hi_x - x,
        )

    # -- initialization ----------------------------------------------------------
    if warm is not None:
        # warm start from a previous (slightly perturbed) solve: reuse the
        # primal/dual point with a Yildirim-Wright style shift into the
        # interior — skips the eq-solve factorization and typically cuts the
        # iteration count when the active set is stable (this doubles as the
        # jitted-loop analog of the reference's threaded solver_state,
        # pmpc/scp_mpc.py:366-373)
        uc0, uf0, warm_s, warm_lam = warm
        delta = jnp.asarray(1e-2, dtype)
        s0 = tuple(jnp.where(m, jnp.maximum(si, delta), 1.0)
                   for m, si in zip(masks, warm_s))
        lam0 = tuple(jnp.where(m, jnp.maximum(li, delta), 0.0)
                     for m, li in zip(masks, warm_lam))
    else:
        # cold start: eq solution, slacks pushed interior
        F0 = arrow_factor(cqp.Hcc, cqp.Hcf, cqp.Hff, jitter=kappa)
        uc0, uf0 = arrow_apply(F0, -cqp.qc, -cqp.qf)
        s_vals = slacks(uc0, uf0)
        s0, lam0 = zip(*(_group(m, sv) for m, sv in zip(masks, s_vals)))
    mu0 = sum(jnp.sum(jnp.where(m, s * l, 0.0)) for m, s, l in zip(masks, s0, lam0)) / n_act
    state0 = IPMState(uc0, uf0, tuple(s0), tuple(lam0),
                      mu0, jnp.asarray(False), jnp.asarray(False),
                      jnp.asarray(0, dtype=jnp.int32))

    def grad_lagrangian(uc, uf, lam):
        """(gc, gf) = Hz + q + G'lam.

        Hz uses the FACTORED form when available (condensation squares the
        conditioning; factored residuals keep f32 gradients accurate, and
        inexact-Newton with accurate residuals converges to the accurate
        KKT point)."""
        clo, chi, flo, fhi, xlo, xhi = lam
        if cqp.Qt is not None:
            Hc, Hf = H_apply_factored(cqp, uc, uf)
            gc = Hc + cqp.qc
            gf = Hf + cqp.qf
        else:
            gc = cqp.Hcc @ uc + jnp.einsum("mij,mj->i", cqp.Hcf, uf) + cqp.qc
            gf = jnp.einsum("mji,mj->mi", cqp.Hcf, jnp.broadcast_to(uc, (M, nc))) \
                + jnp.einsum("mij,mj->mi", cqp.Hff, uf) + cqp.qf
        if has_u:
            gc = gc + (chi - clo)
            gf = gf + (fhi - flo)
        if has_x:
            dl = xhi - xlo  # (M, NX)
            gc = gc + jnp.einsum("mji,mj->i", Ftc, dl)
            gf = gf + jnp.einsum("mji,mj->mi", Ftf, dl)
        return gc, gf

    def make_body(mehrotra: bool):
        return partial(body, mehrotra)

    def body(mehrotra, k, state):
        uc, uf, s, lam, mu, done, ok, it_count = state
        s_vals = slacks(uc, uf)
        # primal residuals r_p = Gz + s - h  == s - s_vals on active rows
        r_p = tuple(jnp.where(m, si - sv, 0.0) for m, si, sv in zip(masks, s, s_vals))
        gc, gf = grad_lagrangian(uc, uf, lam)

        # cap the scaling ratios: uncapped lam/s overflows f32 Cholesky late in
        # the solve (equivalent to a tiny regularization of active constraints)
        w_max = jnp.asarray(1e14 if dtype == jnp.float64 else 1e7, dtype)
        w = tuple(jnp.where(m, jnp.minimum(l / si, w_max), 0.0)
                  for m, l, si in zip(masks, lam, s))
        clo_w, chi_w, flo_w, fhi_w, xlo_w, xhi_w = w

        # -- Newton matrix (keeps arrow structure) -------------------------------
        Kcc, Kcf, Kff = box_weighted_K(
            cqp, clo_w + chi_w, flo_w + fhi_w, xlo_w + xhi_w,
            Ftc, Ftf, has_u=has_u, has_x=has_x,
        )
        F = arrow_factor(Kcc, Kcf, Kff, jitter=kappa)

        def newton_rhs(r_c):
            """rhs = -(g + G'v), v = (lam*r_p - r_c)/s per group."""
            v = tuple(
                jnp.where(m, (l * rp - rc) / si, 0.0)
                for m, l, si, rp, rc in zip(masks, lam, s, r_p, r_c)
            )
            vclo, vchi, vflo, vfhi, vxlo, vxhi = v
            bc, bf = -gc, -gf
            if has_u:
                bc = bc - (vchi - vclo)
                bf = bf - (vfhi - vflo)
            if has_x:
                dv = vxhi - vxlo
                bc = bc - jnp.einsum("mji,mj->i", Ftc, dv)
                bf = bf - jnp.einsum("mji,mj->mi", Ftf, dv)
            return (bc, bf), v

        def recover_steps(duc, duf, v):
            """ds = -r_p - G dz; dlam = w * G dz + v."""
            if has_x:
                dx = jnp.einsum("mij,mj->mi", cqp.Ft, jnp.concatenate(
                    [jnp.broadcast_to(duc, (M, nc)), duf], axis=-1))
            else:
                dx = jnp.zeros((M, NX), dtype=dtype)
            Gdz = (-duc, duc, -duf, duf, -dx, dx)
            ds = tuple(jnp.where(m, -rp - g, 0.0)
                       for m, rp, g in zip(masks, r_p, Gdz))
            dlam = tuple(jnp.where(m, wi * g + vi, 0.0)
                         for m, wi, g, vi in zip(masks, w, Gdz, v))
            return ds, dlam

        def step_len(s_, ds, lam_, dlam):
            def ratio(m, val, dval):
                r = jnp.where(m & (dval < 0), -val / jnp.where(dval < 0, dval, -1.0),
                              jnp.inf)
                return jnp.min(r) if r.size else jnp.asarray(jnp.inf, dtype)
            ap = jnp.minimum(1.0, tau * jnp.minimum(
                jnp.asarray(jnp.inf, dtype),
                jnp.min(jnp.stack([ratio(m, si, di) for m, si, di in zip(masks, s_, ds)]))))
            ad = jnp.minimum(1.0, tau * jnp.min(
                jnp.stack([ratio(m, li, di) for m, li, di in zip(masks, lam_, dlam)])))
            return ap, ad

        if mehrotra:
            # -- predictor (affine) step -----------------------------------------
            r_c_aff = tuple(jnp.where(m, si * l, 0.0) for m, si, l in zip(masks, s, lam))
            (bc, bf), v_aff = newton_rhs(r_c_aff)
            duc_a, duf_a = arrow_apply(F, bc, bf)
            ds_a, dlam_a = recover_steps(duc_a, duf_a, v_aff)
            ap_a, ad_a = step_len(s, ds_a, lam, dlam_a)
            mu_aff = sum(
                jnp.sum(jnp.where(m, (si + ap_a * dsi) * (l + ad_a * dli), 0.0))
                for m, si, dsi, l, dli in zip(masks, s, ds_a, lam, dlam_a)
            ) / n_act
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
            sig_mu = jnp.maximum(sigma * mu, mu_target)  # hold the central path floor

            # -- corrector step (reuses factorization) ---------------------------
            r_c = tuple(
                jnp.where(m, si * l + dsi * dli - sig_mu, 0.0)
                for m, si, l, dsi, dli in zip(masks, s, lam, ds_a, dlam_a)
            )
        else:
            # pure centering Newton on the perturbed KKT at mu_target
            r_c = tuple(
                jnp.where(m, si * l - mu_target, 0.0)
                for m, si, l in zip(masks, s, lam)
            )
        (bc, bf), v = newton_rhs(r_c)
        duc, duf = arrow_apply(F, bc, bf)
        ds, dlam = recover_steps(duc, duf, v)
        ap, ad = step_len(s, ds, lam, dlam)

        uc_n = uc + ap * duc
        uf_n = uf + ap * duf
        s_n = tuple(jnp.where(m, si + ap * dsi, 1.0) for m, si, dsi in zip(masks, s, ds))
        lam_n = tuple(jnp.where(m, l + ad * dl, 0.0) for m, l, dl in zip(masks, lam, dlam))
        mu_n = sum(jnp.sum(jnp.where(m, si * l, 0.0))
                   for m, si, l in zip(masks, s_n, lam_n)) / n_act

        # -- convergence test ----------------------------------------------------
        rp_inf = jnp.max(jnp.stack([jnp.max(jnp.abs(rp)) if rp.size else jnp.asarray(0.0, dtype)
                                    for rp in r_p]))
        gd_inf = jnp.maximum(
            jnp.max(jnp.abs(gc)) if gc.size else jnp.asarray(0.0, dtype),
            jnp.max(jnp.abs(gf)) if gf.size else jnp.asarray(0.0, dtype),
        )
        # any non-finite value in the step: freeze to the PREVIOUS iterate
        # (checked before the state write so NaN never escapes the loop)
        step_bad = ~(jnp.isfinite(mu_n)
                     & jnp.isfinite(jnp.sum(uc_n) if uc_n.size else jnp.asarray(0.0, dtype))
                     & jnp.isfinite(jnp.sum(uf_n)))

        mu_ok = mu_n < jnp.maximum(tol, mu_target * 1.05)
        # with a central-path target, also require the products s*lam to be
        # CENTERED at mu_target (that is what makes the point the solution of
        # the logbarrier-smoothed problem, not just any mu-level iterate)
        center_err = jnp.max(jnp.stack([
            jnp.max(jnp.where(m, jnp.abs(si * l - mu_target), 0.0))
            if si.size else jnp.asarray(0.0, dtype)
            for m, si, l in zip(masks, s_n, lam_n)
        ]))
        centered = (mu_target <= 0) | (center_err < 0.02 * mu_target + tol)
        now_done = mu_ok & centered & (rp_inf < jnp.sqrt(tol)) & (gd_inf < 1e3 * tol)
        # divergence (e.g. infeasible problem): freeze before inf/nan poison
        now_bad = step_bad | (mu_n > 1e12)

        # frozen when already done OR when this very step went bad — the bad
        # step's values must never be written
        frozen = done | now_bad
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(frozen, b, a), new, old)
        new_state = IPMState(
            uc_n, uf_n, s_n, lam_n, mu_n, jnp.asarray(False),
            ok | now_done,
            it_count + 1,
        )
        old_state = IPMState(uc, uf, s, lam, mu, jnp.asarray(False), ok, it_count)
        merged = keep(new_state, old_state)
        return merged._replace(done=done | now_done | now_bad,
                               ok=ok | now_done)

    # while_loop instead of a fixed fori: under vmap the loop stops as soon as
    # EVERY problem in the batch has converged (or diverged) — converged lanes
    # freeze, so typical batches finish in ~8-12 iterations instead of `iters`.
    main_body = make_body(True)

    def while_cond(state):
        return (~state.done) & (state.iters < iters)

    state = lax.while_loop(while_cond, lambda s: main_body(0, s), state0)
    if mu_target_pos:
        # finish with pure centering Newton steps: Mehrotra's second-order
        # correction hunts mu -> 0 and wobbles around the mu_target point
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
