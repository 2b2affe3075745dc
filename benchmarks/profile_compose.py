"""Per-stage profile of the batched composed cone path (VERDICT r3 #4).

Breaks one `conebatch` SCP iteration into its device stages and times each
on the backend the path actually uses (host CPU XLA for the f64 default):

  linearize   vmapped dynamics jacobians
  build       condensed assembly + cone-program build (no solve)
  solve       the full composed_solve_batch_device call
  ipm         solve - build (the NT cone IPM / barrier driver share)

plus an iters sweep estimating the per-IPM-iteration cost. Run me with the
bench_cvar_extras batched configs (B=64, M=4, N=20, Nc=5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def build_inputs(kind, B=64, Mb=4, N=20, xdim=4, udim=2, Nc=5):
    """Replicate conebatch's stacked device inputs for one bench config."""
    rngs = [np.random.default_rng(i) for i in range(B)]
    x0 = np.stack([np.ones((Mb, xdim)) + 0.05 * r.normal(size=(Mb, xdim))
                   for r in rngs])
    probs = dict(
        x0=x0,
        Q=np.broadcast_to(np.eye(xdim), (B, Mb, N, xdim, xdim)).copy(),
        R=np.broadcast_to(1e-2 * np.eye(udim), (B, Mb, N, udim, udim)).copy(),
        X_ref=np.zeros((B, Mb, N, xdim)), U_ref=np.zeros((B, Mb, N, udim)),
        X_prev=np.broadcast_to(x0[:, :, None, :], (B, Mb, N, xdim)).copy(),
        U_prev=np.zeros((B, Mb, N, udim)),
        reg_x=np.ones((B, Mb)), reg_u=0.1 * np.ones((B, Mb)),
        slew_reg=np.zeros((B, Mb)), slew_reg0=np.zeros((B, Mb)),
        slew_um1=np.zeros((B, Mb, udim)),
    )
    bounds = {}
    ecs = ()
    sig = ()
    kv = eps = None
    has_cvar = False
    if kind == "cvar":
        has_cvar = True
        kv, eps = 2.0, 1e-3
    elif kind == "extras_usoc":
        nu_total = Nc * udim + Mb * (N - Nc) * udim
        n_full = nu_total + Mb * N * xdim
        g = np.zeros((B, 1, n_full))
        g[:, 0, :udim] = 1.0
        h = np.stack([np.array([0.2 + 0.01 * i]) for i in range(B)])
        # stacked (G_left, G_right, h, c_left, c_right) per _canon_extras
        ecs = ((g, np.zeros((B, 1, 0)), h, np.zeros((B, n_full)),
                np.zeros((B, 0))),)
        # signature tuple matching extras._canon_extras output: (l, q, e, n_aux)
        sig = ((1, (), 0, 0),)
        bounds["u_soc_r"] = np.full((B, Mb, N), 0.9)
    return probs, bounds, ecs, sig, (N, udim, xdim), Nc, kv, eps, has_cvar


def profile(kind):
    import jax
    import jax.numpy as jnp

    from pmpc_tpu.solvers.compose import (
        composed_solve_batch_device, build_cone_program, CvarParts,
        particle_constants_jnp)
    from pmpc_tpu.solvers.reduced import assemble_condensed, CondensedQP, \
        particle_H_q
    from pmpc_tpu.solvers.dispatch import _cone_precision_scope
    from pmpc_tpu.dynamics import linearize
    from fixtures import unicycle_step
    import pmpc_tpu

    probs_np, bounds_np, ecs_np, sig, dims, Nc, kv, eps, has_cvar = \
        build_inputs(kind)
    N, udim, xdim = dims
    dyn = getattr(pmpc_tpu.make_f_fx_fu_fn(unicycle_step),
                  "__wrapped_dynamics__")

    res = {"config": kind}
    with _cone_precision_scope(np.float64, "auto"):
        cast = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
        probs = {k: cast(v) for k, v in probs_np.items()}
        bounds = {k: cast(v) for k, v in bounds_np.items()}
        ecs = tuple(tuple(cast(a) for a in ec) for ec in ecs_np)
        kvj = cast(kv) if kv is not None else None
        epsj = cast(eps) if eps is not None else None

        def tmo(f, *a, reps=3, **kw):
            out = f(*a, **kw)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*a, **kw)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / reps, out

        # 1) linearize
        x_at = jnp.concatenate(
            [probs["x0"][:, :, None, :], probs["X_prev"][:, :, :-1, :]],
            axis=2)
        lin = jax.jit(lambda xa, u: linearize(dyn, xa, u))
        t_lin, (f, fx, fu) = tmo(lin, x_at, probs["U_prev"])
        probs_it = dict(probs, f=f, fx=fx, fu=fu)
        res["linearize_ms"] = round(1e3 * t_lin, 2)

        # 2) assembly + program build only
        def build_only(p, bd, ec):
            x0, f, fx, fu = p["x0"], p["f"], p["fx"], p["fu"]
            M = f.shape[0]
            nc = Nc * udim
            args15 = (x0, f, fx, fu, p["X_prev"], p["U_prev"], p["Q"],
                      p["R"], p["X_ref"], p["U_ref"], p["reg_x"], p["reg_u"],
                      p["slew_reg"], p["slew_reg0"], p["slew_um1"])
            cvar = None
            if has_cvar:
                H_per, q_per, Ft, g = jax.vmap(particle_H_q)(*args15)
                cqp = CondensedQP(
                    Hcc=jnp.sum(H_per[:, :nc, :nc], axis=0),
                    Hcf=H_per[:, :nc, nc:], Hff=H_per[:, nc:, nc:],
                    qc=jnp.sum(q_per[:, :nc], axis=0), qf=q_per[:, nc:],
                    Ft=Ft, g=g, w_prev=p["U_prev"].reshape(M, -1))
                c_per = particle_constants_jnp(
                    g, p["X_prev"], p["U_prev"], p["Q"], p["R"],
                    p["X_ref"], p["U_ref"], p["reg_x"], p["reg_u"],
                    p["slew_reg0"], p["slew_um1"])
                cvar = CvarParts(H_per=H_per, q_per=q_per, c_per=c_per,
                                 k=kvj, eps=epsj)
            else:
                cqp = assemble_condensed(*args15, Nc=Nc)
            return build_cone_program(
                cqp, dims, sig, ec, (bd.get("u_l"), bd.get("u_u")),
                (bd.get("x_l"), bd.get("x_u")), smooth_method="",
                smooth_alpha=None, smooth_beta=None,
                u_soc_r=bd.get("u_soc_r"), H_extra=None, q_extra=None,
                cvar=cvar)[:2]

        build_j = jax.jit(jax.vmap(build_only, in_axes=(0, 0, 0)))
        t_build, _ = tmo(build_j, probs_it, bounds, ecs)
        res["build_ms"] = round(1e3 * t_build, 2)

        # 3) full solve at several iters caps -> per-iteration cost
        for iters in (10, 35, 50):
            def full(p, bd, ec):
                return composed_solve_batch_device(
                    p, bd, ec, {}, dims, sig, "", None, None, Nc=Nc,
                    k=kvj, eps=epsj, has_cvar=has_cvar,
                    iters=iters, tol_exp=-8, kappa=1e-10)[:2]

            t_full, _ = tmo(jax.jit(full), probs_it, bounds, ecs)
            res[f"solve_ms_iters{iters}"] = round(1e3 * t_full, 2)

    res["ipm_ms_at50"] = round(res["solve_ms_iters50"] - res["build_ms"], 2)
    res["per_ipm_iter_ms"] = round(
        (res["solve_ms_iters50"] - res["solve_ms_iters10"]) / 40.0, 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    for kind in (sys.argv[1:] or ["cvar", "extras_usoc"]):
        profile(kind)
