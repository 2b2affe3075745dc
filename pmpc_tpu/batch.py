"""Batched multi-problem solving: stack a list of problems into one device solve.

Parity with the reference's batched GPU interface
(``pmpc/experimental/remote_like_interface.py:18-106``): numeric fields of all
problems are stacked along a new leading axis and the whole batch is solved in
ONE on-device call (the stacked single-particle problems become the particle
axis with ``Nc=0``, i.e. block-diagonal — no cross-problem coupling), then
split back per problem. Heterogeneous batches fall back to a serial loop
(parity with ``pmpc/scp_mpc.py:504-511``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from .scp import scp_solve, solve

_STACK_KEYS = [
    "Q", "R", "x0", "X_ref", "U_ref", "X_prev", "U_prev",
    "x_l", "x_u", "u_l", "u_u",
]


def _is_numeric(v) -> bool:
    return isinstance(v, (int, float, np.ndarray, np.generic)) or (
        hasattr(v, "shape") and hasattr(v, "dtype")
    )


def stack_problems(problems: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Tree-stack numeric array fields of homogeneous problems along axis 0."""
    out = dict(problems[0])
    for k in _STACK_KEYS:
        vals = [p.get(k, None) for p in problems]
        if all(v is None for v in vals):
            out[k] = None
            continue
        if any(v is None for v in vals):
            raise ValueError(f"field {k} present in some problems but not others")
        out[k] = np.stack([np.asarray(v) for v in vals], axis=0)
    return out


def _values_equal(a, b) -> bool:
    """Equality that tolerates array-valued entries (e.g. weights, Hf) in
    solver_settings — plain ``!=`` on dicts with arrays raises."""
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_values_equal(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if _is_numeric(a) or _is_numeric(b):
        try:
            return bool(np.array_equal(np.asarray(a), np.asarray(b)))
        except Exception:
            return a is b
    if type(a) is not type(b):
        return False
    try:
        return bool(a == b)
    except Exception:
        return a is b


_SCALAR_KEYS = ("reg_x", "reg_u", "max_it", "res_tol", "slew_rate",
                "u0_slew", "u_slew", "time_limit")


def _homogeneous(problems: Sequence[Dict[str, Any]]) -> bool:
    p0 = problems[0]
    if np.asarray(p0["x0"]).ndim != 1:
        return False  # already multi-particle: no free axis for stacking
    ss0 = p0.get("solver_settings", {}) or {}
    if ss0.get("Nc") not in (None, 0):
        # the stacked encoding makes the problems the particle axis; any
        # other consensus horizon (including -1 = full) would COUPLE the
        # independent problems — solve those serially instead
        return False
    for p in problems:
        if p.get("f_fx_fu_fn") is not p0.get("f_fx_fu_fn"):
            return False
        for k in _STACK_KEYS:
            a, b = p.get(k, None), p0.get(k, None)
            if (a is None) != (b is None):
                return False
            if a is not None and np.asarray(a).shape != np.asarray(b).shape:
                return False
        # scalar kwargs are taken from problem 0 by the stacked solve, so
        # they must agree across the batch
        for k in _SCALAR_KEYS:
            if not _values_equal(p.get(k, None), p0.get(k, None)):
                return False
        for k in ("lin_cost_fn", "extra_cstrs_fns"):
            if p.get(k, None) is not p0.get(k, None):
                return False
        if not _values_equal(p.get("solver_settings", {}) or {},
                             p0.get("solver_settings", {}) or {}):
            return False
    return True


_FUSED_CACHE: Dict[Any, Any] = {}


def _solve_problems_fused(problems, split):
    """One fully fused device program for the whole batch: the stacked
    problems become the particle axis with Nc=0 and the entire SCP loop runs
    under one jit (`jax_scp.build_scp_solver`) — no host round-trips per
    iteration. Requires the JAX dynamics protocol (`make_f_fx_fu_fn`) and the
    fused feature subset; raises otherwise so callers can fall back."""
    from .jax_scp import build_scp_solver, make_scp_data
    from .utils import default_dtype

    p0 = problems[0]
    dyn = getattr(p0.get("f_fx_fu_fn"), "__wrapped_dynamics__", None)
    if dyn is None:
        raise ValueError(
            "fused=True needs the JAX dynamics protocol: build f_fx_fu_fn "
            "with pmpc_tpu.make_f_fx_fu_fn(step_fn)")
    ss = dict(p0.get("solver_settings") or {})
    cone_features = [k for k in ("smooth_cstr", "smooth_alpha", "extra_cstrs",
                                 "k", "Hf", "weights")
                     if ss.get(k) is not None]
    if ss.get("u_soc_r") is not None and not _homogeneous(problems):
        # per-problem-varying cone radii cannot ride the single stacked
        # fused program (identical-settings contract); the cone batcher
        # stacks u_soc_r per problem
        cone_features.append("u_soc_r")
    if cone_features:
        # cone-program features cannot ride the structured box-IPM loop:
        # route to the scenario-batched cone driver (one vmapped condensed
        # assembly + cone IPM device call per SCP iteration). Particle
        # weights also route there: the stacked single-particle fused solver
        # has no per-particle cost scaling, while the cone driver pre-scales
        # each problem's cost arrays (scale_probs_cost! parity).
        from .conebatch import solve_problems_cone

        return solve_problems_cone(problems, split=split)
    unsupported = [k for k in ("weights", "diff_cost_fn", "solver",
                               "mu_target")
                   if ss.get(k) is not None]
    if str(ss.get("method", "condensed")).lower() not in ("condensed",):
        unsupported.append("method")
    for k in ("lin_cost_fn", "extra_cstrs_fns", "diff_cost_fn",
              "filter_method", "return_min_viol", "time_limit"):
        if p0.get(k):
            unsupported.append(k)
    if unsupported:
        raise ValueError(f"fused=True does not support: {unsupported}")

    st = stack_problems(problems)
    B = len(problems)
    Q = np.asarray(st["Q"], np.float64)
    N, xdim = Q.shape[1], Q.shape[-1]
    udim = np.asarray(st["R"]).shape[-1]
    dtype = np.dtype(ss.get("dtype", default_dtype()))
    slew_rate = float(p0.get("slew_rate", 0.0) or 0.0)
    # same alias precedence as scp_solve (u_slew overrides u0_slew when the
    # key is present, even with value None)
    u0_slew = p0["u_slew"] if "u_slew" in p0 else p0.get("u0_slew")
    slew_reg0 = float(ss.get("slew_reg0", ss.get("slew_reg", slew_rate))) \
        if u0_slew is not None else 0.0
    u_soc_r = ss.get("u_soc_r")
    if u_soc_r is not None:
        u_soc_r = np.broadcast_to(np.asarray(u_soc_r, dtype), (B, N))
    data = make_scp_data(
        np.asarray(st["x0"], dtype),
        np.asarray(st["Q"], dtype), np.asarray(st["R"], dtype),
        X_ref=st.get("X_ref"), U_ref=st.get("U_ref"),
        X_prev=st.get("X_prev"), U_prev=st.get("U_prev"),
        reg_x=float(p0.get("reg_x", 1.0)), reg_u=float(p0.get("reg_u", 1e-2)),
        slew_reg=slew_rate, slew_reg0=slew_reg0,
        slew_um1=(np.broadcast_to(np.asarray(u0_slew, dtype), (B, udim))
                  if u0_slew is not None else None),
        u_l=st.get("u_l"), u_u=st.get("u_u"),
        x_l=st.get("x_l"), x_u=st.get("x_u"),
        u_soc_r=u_soc_r,
        dtype=dtype,
    )
    has_u = st.get("u_l") is not None or st.get("u_u") is not None
    has_x = st.get("x_l") is not None or st.get("x_u") is not None
    max_it = int(p0.get("max_it", 100))
    res_tol = float(p0.get("res_tol", 1e-5))
    ipm_kw = dict(
        ipm_iters=int(ss.get("ipm_iters", 20)),
        ipm_tol_exp=(int(ss["ipm_tol_exp"]) if ss.get("ipm_tol_exp")
                     is not None else None),
        ipm_tau=(float(ss["ipm_tau"]) if ss.get("ipm_tau") is not None
                 else None),
        kappa=(float(ss["ipm_kappa"]) if ss.get("ipm_kappa") is not None
               else None),
        # same rule as the host frontends: an explicit ipm_tol_exp disables
        # the SCP-residual forcing unless ipm_adaptive_tol is itself set
        adaptive_tol=bool(ss.get("ipm_adaptive_tol",
                                 "ipm_tol_exp" not in ss)),
    )
    key = (id(dyn), B, N, xdim, udim, has_u, has_x, u_soc_r is not None,
           max_it, res_tol, str(dtype), tuple(sorted(ipm_kw.items())))
    solver = _FUSED_CACHE.get(key)
    if solver is None:
        solver = build_scp_solver(
            dyn, N=N, xdim=xdim, udim=udim, M=B, Nc=0,
            max_it=max_it, res_tol=res_tol,
            has_u_bounds=has_u, has_x_bounds=has_x,
            has_u_soc=u_soc_r is not None, **ipm_kw)
        _FUSED_CACHE[key] = solver
    X, U, info = solver(data)
    X, U = np.asarray(X), np.asarray(U)
    resid_m = np.asarray(info["resid_particle"], np.float64)
    base = dict(fused=True, iters=int(np.asarray(info["iters"])),
                resid=float(np.asarray(info["resid"])),
                converged=bool(np.asarray(info["converged"])))
    if not split:
        base["resid_particle"] = resid_m
        return [(X, U, base)]
    # per-problem convergence: each stacked problem is an independent
    # particle, so report its OWN residual, not the batch max
    return [(X[i], U[i],
             dict(base, batch_index=i, resid=float(resid_m[i]),
                  converged=bool(resid_m[i] < res_tol)))
            for i in range(B)]


def solve_problems(
    problems: List[Dict[str, Any]],
    split: bool = True,
    verbose: bool = False,
    fused: bool = False,
    **kw,
) -> List[Tuple[np.ndarray, np.ndarray, Dict[str, Any]]]:
    """Solve many problems at once; one stacked device solve when possible.

    ``fused=True`` additionally runs the whole SCP loop as ONE device program
    (requires homogeneous problems using the JAX dynamics protocol and the
    fused feature subset) — the deployment-scale path: thousands of problems
    per call with no per-iteration host round-trips."""
    problems = [dict(p) for p in problems]
    if len(problems) == 0:
        return []
    if fused:
        ss0 = dict(problems[0].get("solver_settings") or {})
        if any(ss0.get(k) is not None for k in
               ("smooth_cstr", "smooth_alpha", "extra_cstrs", "k", "Hf",
                "weights")) \
                or (ss0.get("u_soc_r") is not None
                    and not _homogeneous(problems)):
            # cone-featured problems: their own batcher (multi-particle and
            # consensus Nc allowed there; extras may differ numerically, so
            # only require matching SHAPES/settings-keys — the cone driver
            # validates signatures itself)
            from .conebatch import solve_problems_cone

            return solve_problems_cone(problems, split=split)
        if not _homogeneous(problems):
            raise ValueError("fused=True requires homogeneous problems")
        return _solve_problems_fused(problems, split)
    if not _homogeneous(problems):
        return [solve(**dict(p, verbose=verbose)) for p in problems]

    B = len(problems)
    stacked = stack_problems(problems)
    ss = dict(stacked.get("solver_settings") or {})
    # stacked problems are independent: no consensus across the batch
    ss.setdefault("Nc", 0)
    stacked["solver_settings"] = ss
    stacked["verbose"] = verbose
    stacked.pop("M", None)
    stacked.pop("Nc", None)
    X, U, data = scp_solve(**stacked)
    if X is None:
        return [(None, None, None)] * B
    if not split:
        return [(X, U, data)]

    def per_problem_data(i: int) -> Dict[str, Any]:
        # each split problem gets its OWN data dict (independent hist records)
        # so callers can annotate/mutate per problem
        d = dict(data, batch_index=i)
        if "hist" in d:
            d["hist"] = [dict(h) for h in d["hist"]]
        return d

    return [(X[i], U[i], per_problem_data(i)) for i in range(B)]
