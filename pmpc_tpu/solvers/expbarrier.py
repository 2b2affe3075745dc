"""Device central-path solver for cone QPs containing EXPONENTIAL cones.

Covers the role of the reference's exp-cone handling (user ``extra_cstrs``
with ``e`` > 0 triples, the encoding ``PMPC.jl/src/cone_utils.jl:173-202``
generates for logbarrier smoothing): the NT-scaled IPM in `coneipm` is for
symmetric cones only, and exponential cones are non-symmetric. Instead of a
Skajaa-Ye non-symmetric IPM this runs the textbook barrier (path-following)
method — entirely on device, jitted, f64 — which is exactly the accuracy
class the reference gets from ECOS on these programs:

  phase-I   relax every cone by ``t * shift`` (shift = 1 / e_soc / (-1,1,1),
            each a recession direction of its cone), damped-Newton central
            path on objective ``t`` until the unrelaxed margins are positive.
  phase-II  damped Newton on  F_mu(v) = (0.5 v'Pv + q'v)/mu + sum barriers,
            with feasibility-preserving backtracking, mu shrinking to the
            target tolerance. Barrier gradients/Hessians come from autodiff
            of the tiny per-cone barrier functions (3x3 for exp cones),
            assembled as G' H G — the Newton matrix stays (nv, nv) dense and
            factors through `ops.linalg.spd_factor` (host BLAS on CPU).

Barriers: -log(s) per nonneg row; -log(s0^2 - |s_|^2) per SOC (zero padding
is exactly neutral); -log(z log(y/z) - x) - log y - log z per exp cone in
the ECOS convention s = (x, y, z), z log(y/z) >= x, y, z > 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.linalg import spd_apply, spd_factor
from ..utils import with_matmul_precision

_BIG = 1e30


def _soc_barrier(s):
    det = s[0] ** 2 - jnp.sum(s[1:] ** 2)
    return -jnp.log(jnp.maximum(det, 1e-300))


def _soc_margin(s):
    return s[0] - jnp.linalg.norm(s[1:])


def _exp_barrier(s):
    x, y, z = s[0], s[1], s[2]
    u = z * jnp.log(jnp.maximum(y, 1e-300) / jnp.maximum(z, 1e-300)) - x
    return (-jnp.log(jnp.maximum(u, 1e-300))
            - jnp.log(jnp.maximum(y, 1e-300))
            - jnp.log(jnp.maximum(z, 1e-300)))


def _exp_margin(s):
    x, y, z = s[0], s[1], s[2]
    ok = (y > 0) & (z > 0)
    u = jnp.where(ok, z * jnp.log(jnp.maximum(y, 1e-300)
                                  / jnp.maximum(z, 1e-300)) - x, -1.0)
    return jnp.minimum(jnp.minimum(y, z), u)


def _slacks(v, Gl, hl, Gq, hq, Ge, he, t, shift_on):
    """Cone slacks of v with the phase-I relaxation t * shift (shift_on=1)."""
    sl = hl - Gl @ v + shift_on * t
    sq = hq - jnp.einsum("cpv,v->cp", Gq, v)
    sq = sq.at[:, 0].add(shift_on * t)
    se = he - jnp.einsum("cpv,v->cp", Ge, v)
    se = se + shift_on * t * jnp.asarray([-1.0, 1.0, 1.0], v.dtype)
    return sl, sq, se


def _min_margin(sl, sq, se):
    ml = jnp.min(sl) if sl.shape[0] else jnp.asarray(jnp.inf, sl.dtype)
    mq = jnp.min(jax.vmap(_soc_margin)(sq)) if sq.shape[0] \
        else jnp.asarray(jnp.inf, sl.dtype)
    me = jnp.min(jax.vmap(_exp_margin)(se)) if se.shape[0] \
        else jnp.asarray(jnp.inf, sl.dtype)
    return jnp.minimum(ml, jnp.minimum(mq, me))


def _barrier_value(sl, sq, se):
    bl = -jnp.sum(jnp.log(jnp.maximum(sl, 1e-300)))
    bq = jnp.sum(jax.vmap(_soc_barrier)(sq)) if sq.shape[0] else 0.0
    be = jnp.sum(jax.vmap(_exp_barrier)(se)) if se.shape[0] else 0.0
    return bl + bq + be


def _barrier_grad_hess(sl, sq, se):
    """Per-family barrier gradients and (small dense) Hessians wrt slacks."""
    gl = -1.0 / sl
    hll = 1.0 / (sl * sl)  # diagonal
    if sq.shape[0]:
        gq = jax.vmap(jax.grad(_soc_barrier))(sq)
        hq = jax.vmap(jax.hessian(_soc_barrier))(sq)
    else:
        gq = jnp.zeros_like(sq)
        hq = jnp.zeros(sq.shape + sq.shape[-1:], sq.dtype)
    if se.shape[0]:
        ge = jax.vmap(jax.grad(_exp_barrier))(se)
        hes = jax.vmap(jax.hessian(_exp_barrier))(se)
    else:
        ge = jnp.zeros_like(se)
        hes = jnp.zeros(se.shape + (3,), se.dtype)
    return (gl, hll), (gq, hq), (ge, hes)


@partial(jax.jit, static_argnames=("tol_exp", "max_newton", "kappa"))
@with_matmul_precision("highest")
def exp_barrier_solve(P, q, Gl, hl, Gq, hq, Ge, he,
                      tol_exp: int = -8, max_newton: int = 30,
                      kappa: float = 1e-10):
    """Solve min 0.5 v'Pv + q'v s.t. slacks in (R+^ml x SOCs x EXPs).

    Returns (v, stats) with stats = {mu, iters, converged}. Dense, f64-class
    accuracy at mu_min = 10^tol_exp per cone degree."""
    dtype = q.dtype
    nv = q.shape[0]
    ml = hl.shape[0]
    ncones = hq.shape[0]
    ne = he.shape[0]
    nbar = ml + 2 * ncones + 3 * ne  # total barrier degree
    mu_min = jnp.asarray(10.0 ** tol_exp, dtype)

    def obj(v):
        return 0.5 * v @ P @ v + q @ v

    def F_and_slacks(v, t, shift_on, inv_mu):
        sl, sq, se = _slacks(v, Gl, hl, Gq, hq, Ge, he, t, shift_on)
        m = _min_margin(sl, sq, se)
        # phase objective: t (shift_on=1) or the QP objective (shift_on=0)
        f0 = jnp.where(shift_on > 0, t, obj(v))
        val = jnp.where(m > 0, f0 * inv_mu + _barrier_value(sl, sq, se), _BIG)
        return val, (sl, sq, se, m)

    def newton_step(vt, shift_on, inv_mu):
        """One damped-Newton step on the joint variable vt = [v; t]."""
        v, t = vt[:nv], vt[nv]
        sl, sq, se = _slacks(v, Gl, hl, Gq, hq, Ge, he, t, shift_on)
        (gl, hll), (gq, hqq), (ge, hee) = _barrier_grad_hess(sl, sq, se)

        # gradient wrt v: d s / d v = -G  (every family)
        g_v = inv_mu * jnp.where(shift_on > 0, 0.0, 1.0) * (P @ v + q) \
            - Gl.T @ gl \
            - jnp.einsum("cpv,cp->v", Gq, gq) \
            - jnp.einsum("cpv,cp->v", Ge, ge)
        # gradient wrt t: d s / d t = shift per family
        g_t = inv_mu * jnp.where(shift_on > 0, 1.0, 0.0) \
            + shift_on * (jnp.sum(gl) + jnp.sum(gq[:, 0])
                          + jnp.sum(ge @ jnp.asarray([-1.0, 1.0, 1.0], dtype)))

        # Hessian blocks: Hvv = P/mu + sum G' Hb G; cross terms via shifts
        HG_q = jnp.einsum("cpr,crw->cpw", hqq, Gq)
        HG_e = jnp.einsum("cpr,crw->cpw", hee, Ge)
        Hvv = inv_mu * jnp.where(shift_on > 0, 0.0, 1.0) * P \
            + (Gl.T * hll) @ Gl \
            + Gq.reshape(ncones * Gq.shape[1], nv).T \
            @ HG_q.reshape(ncones * Gq.shape[1], nv) \
            + Ge.reshape(ne * 3, nv).T @ HG_e.reshape(ne * 3, nv)
        de = jnp.asarray([-1.0, 1.0, 1.0], dtype)
        Hvt = shift_on * (-(Gl.T @ hll)
                          - jnp.einsum("cpv,cp->v", Gq, hqq[:, :, 0])
                          - jnp.einsum("cpv,cp->v", Ge, hee @ de))
        Htt = shift_on * (jnp.sum(hll) + jnp.sum(hqq[:, 0, 0])
                          + jnp.sum(de @ hee @ de)) \
            + jnp.asarray(1e-12, dtype)

        # Schur solve of the (nv+1) system via the nv block
        L = spd_factor(Hvv, jitter=kappa)
        w = spd_apply(L, Hvt)
        schur = Htt - Hvt @ w
        rhs_t = g_t - Hvt @ spd_apply(L, g_v)
        dt = jnp.where(shift_on > 0, rhs_t / jnp.maximum(schur, 1e-30), 0.0)
        dv = spd_apply(L, g_v - shift_on * Hvt * dt)
        step = -jnp.concatenate([dv, dt[None]])
        dec2 = -(step @ jnp.concatenate([g_v, g_t[None]]))  # lambda^2
        return step, dec2

    def backtrack(vt, step, shift_on, inv_mu):
        F0, _ = F_and_slacks(vt[:nv], vt[nv], shift_on, inv_mu)

        def cond(c):
            alpha, done, _ = c
            return (~done) & (alpha > 1e-12)

        def body(c):
            alpha, _, _ = c
            vt_n = vt + alpha * step
            Fn, aux = F_and_slacks(vt_n[:nv], vt_n[nv], shift_on, inv_mu)
            ok = Fn < F0  # sufficient: barrier is self-concordant, damped
            return (jnp.where(ok, alpha, 0.5 * alpha), ok, vt_n)

        alpha, ok, vt_n = lax.while_loop(
            cond, body, (jnp.asarray(1.0, dtype), jnp.asarray(False), vt))
        return jnp.where(ok, 1.0, 0.0)[..., None] * (vt_n - vt) + vt, ok

    def center(vt, shift_on, inv_mu, stop_t_neg):
        """Damped Newton until decrement small (or t < 0 in phase-I)."""

        def cond(c):
            vt_, k, dec2 = c
            not_done = (dec2 > 1e-10) & (k < max_newton)
            if_t = ~(stop_t_neg & (vt_[nv] < -1e-3))
            return not_done & if_t

        def body(c):
            vt_, k, _ = c
            step, dec2 = newton_step(vt_, shift_on, inv_mu)
            vt_n, ok = backtrack(vt_, step, shift_on, inv_mu)
            return (vt_n, k + 1, jnp.where(ok, dec2, 0.0))

        vt, _, _ = lax.while_loop(
            cond, body, (vt, jnp.asarray(0, jnp.int32),
                         jnp.asarray(1.0, dtype)))
        return vt

    # --- phase-I: strictly feasible point -------------------------------
    GtG = Gl.T @ Gl + jnp.einsum("cpv,cpw->vw", Gq, Gq) \
        + jnp.einsum("cpv,cpw->vw", Ge, Ge)
    Gth = Gl.T @ hl + jnp.einsum("cpv,cp->v", Gq, hq) \
        + jnp.einsum("cpv,cp->v", Ge, he)
    v0 = spd_apply(spd_factor(P + GtG, jitter=1e-8), -q + Gth)

    def t_cond(t):
        sl, sq, se = _slacks(v0, Gl, hl, Gq, hq, Ge, he, t, 1.0)
        return _min_margin(sl, sq, se) < 1.0

    t0 = lax.while_loop(t_cond, lambda t: 2.0 * t + 1.0,
                        jnp.asarray(1.0, dtype))
    vt = jnp.concatenate([v0, t0[None]])
    # a few outer reductions on the phase-I path (objective = t)
    for inv_mu1 in (1.0, 10.0, 100.0, 1000.0):
        vt = center(vt, jnp.asarray(1.0, dtype),
                    jnp.asarray(inv_mu1, dtype), jnp.asarray(True))
    sl, sq, se = _slacks(vt[:nv], Gl, hl, Gq, hq, Ge, he,
                         jnp.asarray(0.0, dtype), 0.0)
    feasible = _min_margin(sl, sq, se) > 0

    # --- phase-II: path following on the true objective ------------------
    vt = jnp.concatenate([vt[:nv], jnp.zeros((1,), dtype)])
    mu0 = jnp.asarray(1.0, dtype)
    n_outer = int(np.ceil(np.log(1.0 / 10.0 ** tol_exp) / np.log(5.0))) + 1

    def outer(c, _):
        vt_, mu = c
        vt_n = center(vt_, jnp.asarray(0.0, dtype), 1.0 / mu,
                      jnp.asarray(False))
        # keep the old point if centering ever went non-finite
        good = jnp.isfinite(vt_n).all()
        vt_n = jnp.where(good, vt_n, vt_)
        return (vt_n, jnp.maximum(mu / 5.0, mu_min)), mu

    (vt, _), mus = lax.scan(outer, (vt, mu0), None, length=n_outer)
    mu_used = mus[-1]  # the mu the returned point was actually centered at
    v = vt[:nv]
    sl, sq, se = _slacks(v, Gl, hl, Gq, hq, Ge, he,
                         jnp.asarray(0.0, dtype), 0.0)
    # convergence needs actual centering progress, not just feasibility: a
    # stalled phase-II (every backtrack failing) leaves a large Newton
    # decrement at the final mu — reject it so callers take the fallback
    _, dec2 = newton_step(vt, jnp.asarray(0.0, dtype), 1.0 / mu_used)
    centered = dec2 < jnp.asarray(1e-2, dtype)
    ok = feasible & jnp.isfinite(v).all() & (_min_margin(sl, sq, se) > 0) \
        & centered
    # duality-gap proxy: nbar * mu of the final centering
    gap = jnp.asarray(float(max(nbar, 1)), dtype) * mu_used
    stats = dict(mu=gap, iters=jnp.asarray(n_outer, jnp.int32), converged=ok)
    return v, stats
