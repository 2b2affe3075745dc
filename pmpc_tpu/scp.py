"""SCP outer loop and the per-iteration affine solve dispatcher.

Behavioral parity with the reference SCP driver (``pmpc/scp_mpc.py:205-442``):
linearize (user callback) -> augment cost -> affine consensus solve -> residual
bookkeeping, solution filtering (AA/smooth/select), min-violation tracking,
NaN failure contract, time-limit/residual stopping, verbose iteration table and
``data`` dict contract (``hist``, ``solver_data``, ``t_aff_solve``, ``sol_hist``).

The affine solve itself replaces the reference's Julia/C ECOS/OSQP bridge
(``pmpc/scp_mpc.py:78-167``, ``pmpc/static_backend.py:198-312``) with the
on-device condensed consensus solver (`pmpc_tpu.solvers`): direct arrow solve
when unconstrained, batched primal-dual IPM for exact box/cone constraints, and
a smooth log-barrier Newton path for ``smooth_cstr`` parity.
"""

from __future__ import annotations

import math
import time
from copy import copy
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from .utils import TablePrinter, atleast_nd, default_dtype
from . import filters as _filters

print_fn = print


# -- small numpy helpers (host-side loop bookkeeping) ------------------------------


def _norm(x, p=None, dim=None):
    return np.linalg.norm(x, p, dim)


def _bmv(A, x):
    return (A @ x[..., None])[..., 0]


def _XU2vec(X, U):
    return np.concatenate([np.asarray(X).reshape(-1), np.asarray(U).reshape(-1)])


# -- affine solve dispatcher -------------------------------------------------------


def _bounds_present(lo, hi) -> bool:
    if lo is None or hi is None:
        return False
    lo, hi = np.asarray(lo), np.asarray(hi)
    if lo.size == 0 or hi.size == 0:
        return False
    # reference drops bounds entirely if any entry is NaN (c_interface.jl:56-63)
    if np.any(np.isnan(lo)) or np.any(np.isnan(hi)):
        return False
    return True


def aff_solve(
    f: np.ndarray,
    fx: np.ndarray,
    fu: np.ndarray,
    x0: np.ndarray,
    X_prev: np.ndarray,
    U_prev: np.ndarray,
    Q: np.ndarray,
    R: np.ndarray,
    X_ref: np.ndarray,
    U_ref: np.ndarray,
    reg_x: float,
    reg_u: float,
    slew_rate: Optional[float],
    u_slew: Optional[np.ndarray],
    x_l: Optional[np.ndarray],
    x_u: Optional[np.ndarray],
    u_l: Optional[np.ndarray],
    u_u: Optional[np.ndarray],
    solver_settings: Optional[Dict[str, Any]] = None,
) -> Tuple[np.ndarray, np.ndarray, Any]:
    """Solve one linearized consensus MPC instance. Returns (X (M,N+1,xdim), U, data).

    Argument order/semantics match the reference ``aff_solve``
    (``pmpc/scp_mpc.py:78-98``); ``solver_settings`` carries the open config
    dict (solver, Nc, smooth_cstr/alpha/beta, extra_cstrs, weights, coerce, k,
    verbose, solver_state) like ``pmpc/static_backend.py:242-276``.
    """
    from .solvers.dispatch import affine_solve_np

    ss = copy(solver_settings) if solver_settings is not None else dict()
    dtype = ss.get("dtype", default_dtype())

    f = atleast_nd(np.asarray(f), 3)
    fx, fu = atleast_nd(np.asarray(fx), 4), atleast_nd(np.asarray(fu), 4)
    x0 = atleast_nd(np.asarray(x0), 2)
    X_prev, U_prev = atleast_nd(np.asarray(X_prev), 3), atleast_nd(np.asarray(U_prev), 3)
    Q, R = atleast_nd(np.asarray(Q), 4), atleast_nd(np.asarray(R), 4)
    X_ref, U_ref = atleast_nd(np.asarray(X_ref), 3), atleast_nd(np.asarray(U_ref), 3)
    M, N, xdim = f.shape
    udim = fu.shape[-1]

    has_u_bounds = _bounds_present(u_l, u_u)
    has_x_bounds = _bounds_present(x_l, x_u)
    u_l = atleast_nd(np.asarray(u_l, dtype=float), 3) if has_u_bounds else None
    u_u = atleast_nd(np.asarray(u_u, dtype=float), 3) if has_u_bounds else None
    x_l = atleast_nd(np.asarray(x_l, dtype=float), 3) if has_x_bounds else None
    x_u = atleast_nd(np.asarray(x_u, dtype=float), 3) if has_x_bounds else None

    # slew encoding parity with static_backend.py:262-272 / c_interface.jl:64-70:
    # - slew_rate couples consecutive controls (slew_reg),
    # - u_slew anchors the first control with weight slew_reg0
    #   (defaults to solver_settings["slew_reg"] like the static backend,
    #    falling back to slew_rate).
    slew_reg = float(slew_rate) if slew_rate is not None else 0.0
    if u_slew is not None:
        slew_reg0 = float(ss.get("slew_reg0", ss.get("slew_reg", slew_reg)))
        slew_um1 = np.broadcast_to(np.asarray(u_slew, dtype=float), (M, udim)).copy()
    else:
        slew_reg0 = 0.0
        slew_um1 = np.zeros((M, udim))

    Nc = int(ss.get("Nc", -1))
    Nc = Nc if Nc >= 0 else N

    X, U, data = affine_solve_np(
        x0=x0.astype(dtype),
        f=f.astype(dtype),
        fx=fx.astype(dtype),
        fu=fu.astype(dtype),
        X_prev=X_prev.astype(dtype),
        U_prev=U_prev.astype(dtype),
        Q=Q.astype(dtype),
        R=R.astype(dtype),
        X_ref=X_ref.astype(dtype),
        U_ref=U_ref.astype(dtype),
        reg_x=np.broadcast_to(np.asarray(reg_x, dtype=dtype), (M,)),
        reg_u=np.broadcast_to(np.asarray(reg_u, dtype=dtype), (M,)),
        slew_reg=np.full((M,), slew_reg, dtype=dtype),
        slew_reg0=np.full((M,), slew_reg0, dtype=dtype),
        slew_um1=slew_um1.astype(dtype),
        u_l=None if u_l is None else u_l.astype(dtype),
        u_u=None if u_u is None else u_u.astype(dtype),
        x_l=None if x_l is None else x_l.astype(dtype),
        x_u=None if x_u is None else x_u.astype(dtype),
        Nc=Nc,
        settings=ss,
    )
    X_traj = np.concatenate([np.asarray(x0)[:, None, :], np.asarray(X)], axis=-2)
    return X_traj, np.asarray(U), data


# -- cost augmentation (pmpc/scp_mpc.py:171-185) -----------------------------------


def _augment_cost(lin_cost_fn, X_prev, U_prev, Q, R, X_ref, U_ref, problems):
    """Fold the linearized nonlinear cost into the references: parity with
    ``pmpc/scp_mpc.py:171-185``."""
    if lin_cost_fn is None:
        return X_ref, U_ref
    cx, cu = lin_cost_fn(X_prev, U_prev, problems)
    if cx is not None:
        cx = np.asarray(cx)
        X_ref = X_ref - np.linalg.solve(Q, cx[..., None])[..., 0]
    if cu is not None:
        cu = np.asarray(cu)
        U_ref = U_ref - np.linalg.solve(R, cu[..., None])[..., 0]
    return X_ref, U_ref


# -- the SCP loop ------------------------------------------------------------------


def scp_solve(
    f_fx_fu_fn: Callable,
    Q: np.ndarray,
    R: np.ndarray,
    x0: np.ndarray,
    X_ref: Optional[np.ndarray] = None,
    U_ref: Optional[np.ndarray] = None,
    X_prev: Optional[np.ndarray] = None,
    U_prev: Optional[np.ndarray] = None,
    x_l: Optional[np.ndarray] = None,
    x_u: Optional[np.ndarray] = None,
    u_l: Optional[np.ndarray] = None,
    u_u: Optional[np.ndarray] = None,
    verbose: bool = False,
    debug: bool = False,
    max_it: int = 100,
    time_limit: float = 1000.0,
    res_tol: float = 1e-5,
    reg_x: float = 1e0,
    reg_u: float = 1e-2,
    slew_rate: float = 0.0,
    u0_slew: Optional[np.ndarray] = None,
    lin_cost_fn: Optional[Callable] = None,
    cost_fn: Optional[Callable] = None,  # deprecated
    extra_cstrs_fns: Optional[Callable] = None,
    solver_settings: Optional[Dict[str, Any]] = None,
    solver_state: Optional[Dict[str, Any]] = None,
    filter_method: str = "",
    filter_window: int = 5,
    filter_it0: int = 20,
    return_min_viol: bool = False,
    min_viol_it0: int = -1,
    **extra_kw,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, Any]]:
    """SCP solution of a nonlinear-dynamics quadratic-cost control problem.

    Signature and semantics are a drop-in for the reference ``scp_solve``
    (``pmpc/scp_mpc.py:205-277``); see that docstring for argument meaning.
    """
    if cost_fn is not None:
        raise ValueError("cost_fn is deprecated, use lin_cost_fn instead.")

    t_elaps = time.time()

    x0, reg_x, reg_u = np.array(x0, dtype=float), float(reg_x), float(reg_u)
    Q, R = np.copy(Q), np.copy(R)
    if x0.ndim == 1:  # single particle case
        assert x0.ndim == 1 and R.ndim == 3 and Q.ndim == 3
        args = Q, R, x0, X_ref, U_ref, X_prev, U_prev, x_l, x_u, u_l, u_u
        dims = [4, 4, 2, 3, 3, 3, 3, 3, 3, 3, 3]
        Q, R, x0, X_ref, U_ref, X_prev, U_prev, x_l, x_u, u_l, u_u = [
            atleast_nd(z, d) for z, d in zip(args, dims)
        ]
        single_particle = True
    else:
        assert x0.ndim == 2 and R.ndim == 4 and Q.ndim == 4
        single_particle = False
    M, N, xdim = Q.shape[:3]
    udim = R.shape[-1]

    X_ref = np.zeros((M, N, xdim)) if X_ref is None else np.array(X_ref, dtype=float)
    U_ref = np.zeros((M, N, udim)) if U_ref is None else np.array(U_ref, dtype=float)
    X_prev = np.array(X_prev, dtype=float) if X_prev is not None else X_ref
    U_prev = np.array(U_prev, dtype=float) if U_prev is not None else U_ref
    X_prev, U_prev = X_prev.reshape((M, N, xdim)), U_prev.reshape((M, N, udim))
    X_ref, U_ref = X_ref.reshape((M, N, xdim)), U_ref.reshape((M, N, udim))
    x_l, x_u, u_l, u_u = [
        np.array(z, dtype=float) if z is not None else np.zeros((0, 0, 0))
        for z in [x_l, x_u, u_l, u_u]
    ]
    slew_rate = float(slew_rate) if slew_rate is not None else None
    u0_slew = np.array(u0_slew, dtype=float) if u0_slew is not None else None
    u0_slew = extra_kw.pop("u_slew", u0_slew)  # alias accepted by the reference API
    data: Dict[str, Any] = dict(solver_data=[], hist=[], sol_hist=[])
    Fs: List[np.ndarray] = []

    field_names = ["it", "elaps", "obj", "resid", "reg_x", "reg_u"]
    fmts = ["%04d", "%8.3e", "%8.3e", "%8.3e", "%8.3e", "%8.3e"]
    tp = TablePrinter(field_names, fmts=fmts)
    solver_settings = copy(solver_settings) if solver_settings is not None else dict()

    min_viol = math.inf
    if verbose:
        print_fn(tp.make_header())
    it = 0
    X, U, solver_data = None, None, None
    max_res = math.inf
    while it < max_it:
        X_ = np.concatenate([x0[..., None, :], X_prev[..., :-1, :]], -2)
        f, fx, fu = f_fx_fu_fn(X_, U_prev)
        f = np.asarray(f, dtype=float).reshape((M, N, xdim))
        fx = np.asarray(fx, dtype=float).reshape((M, N, xdim, xdim))
        fu = np.asarray(fu, dtype=float).reshape((M, N, xdim, udim))

        problems = dict(f_fx_fu_fn=f_fx_fu_fn)
        problems = dict(problems, f=f, fx=fx, fu=fu, x0=x0, X_prev=X_prev, U_prev=U_prev)
        problems = dict(problems, slew_rate=slew_rate, u0_slew=u0_slew)
        problems = dict(problems, x_l=x_l, x_u=x_u, u_l=u_l, u_u=u_u)
        problems = dict(problems, Q=Q, R=R, X_ref=X_ref, U_ref=U_ref)
        problems = dict(extra_kw, **problems)
        X_ref_, U_ref_ = _augment_cost(lin_cost_fn, X_prev, U_prev, Q, R, X_ref, U_ref, problems)
        if extra_cstrs_fns is not None:
            solver_settings["extra_cstrs"] = tuple(extra_cstrs_fns(X_prev, U_prev, problems))
        solver_settings["solver_state"] = solver_state

        t_aff = time.time()
        X, U, solver_data = aff_solve(
            f, fx, fu, x0, X_prev, U_prev,
            Q, R, X_ref_, U_ref_,
            reg_x, reg_u, slew_rate, u0_slew,
            x_l, x_u, u_l, u_u,
            solver_settings=solver_settings,
        )
        t_aff = time.time() - t_aff

        solver_state = (solver_data or {}).get("solver_state", None)
        X, U = np.asarray(X).reshape((M, N + 1, xdim)), np.asarray(U).reshape((M, N, udim))

        if debug or filter_method != "":
            data["sol_hist"].append((X, U))

        if filter_method != "":
            X_full_prev = np.concatenate([x0[..., None, :], X_prev], -2)
            Fs.append(_XU2vec(X - X_full_prev, U - U_prev))
            if it >= filter_it0:
                alfs = _filters.FILTER_MAP[filter_method](Fs[-min(filter_window, len(Fs)):])
                XUs = data["sol_hist"][-min(filter_window, len(Fs)):]
                X = sum(alf * Xi for alf, (Xi, _) in zip(alfs, XUs))
                U = sum(alf * Ui for alf, (_, Ui) in zip(alfs, XUs))

        if np.any(np.isnan(X)) or np.any(np.isnan(U)):
            if verbose:
                print_fn("Solver failed...")
            return None, None, None

        X_ = X[..., 1:, :]
        if filter_method != "":
            dX = data["sol_hist"][-1][0][..., 1:, :] - X_prev
            dU = data["sol_hist"][-1][1] - U_prev
        else:
            dX, dU = X_ - X_prev, U - U_prev
        max_res = max(np.max(_norm(dX, 2, -1)), np.max(_norm(dU, 2, -1)))
        dX, dU = X_ - X_ref, U - U_ref
        obj = (np.sum(dX * _bmv(Q, dX)) + np.sum(dU * _bmv(R, dU))) / N / M

        X_prev, U_prev = X[..., 1:, :], U

        t_run = time.time() - t_elaps
        vals = (it + 1, t_run, obj, max_res, reg_x, reg_u)
        if verbose:
            print_fn(tp.make_values(vals))
        data["solver_data"].append(solver_data)
        data["hist"].append({k: val for k, val in zip(field_names, vals)})
        data.setdefault("t_aff_solve", [])
        data["t_aff_solve"].append(t_aff)

        if return_min_viol and (it >= min_viol_it0 or min_viol_it0 < 0):
            if min_viol > max_res:
                data["min_viol_sol"], min_viol = (X, U), max_res

        if max_res < res_tol:
            break
        it += 1
        if (time.time() - t_elaps) * (it + 1) / it > time_limit:
            break

    if verbose:
        print_fn(tp.make_footer())
    if verbose and max_res > 1e-2:
        msg = "Bad solution found, the solution is approximate to a residual:"
        print_fn("#" * 73)
        print_fn(msg, "%9.4e" % max_res)
        print_fn("#" * 73)
    if not debug:
        del data["sol_hist"]
    if not single_particle:
        return X.reshape((M, N + 1, xdim)), U.reshape((M, N, udim)), data
    return X.reshape((N + 1, xdim)), U.reshape((N, udim)), data


def solve(*args, **kwargs):
    """Main entry point; optional ``profile=True`` wraps with line_profiler
    (parity with ``pmpc/scp_mpc.py:446-456``)."""
    if kwargs.pop("profile", False):
        try:
            from line_profiler import LineProfiler

            LP = LineProfiler()
            LP.add_function(scp_solve)
            ret = LP.wrap_function(scp_solve)(*args, **kwargs)
            LP.print_stats(output_unit=1e-3)
            return ret
        except ImportError:
            pass
    return scp_solve(*args, **kwargs)


def solve_with_a_dict(problem: Dict[str, Any]) -> tuple:
    return solve(**problem)


def solve_problems_serial(
    problems: List[Dict[str, Any]],
    verbose: bool = False,
    **kw,
) -> List[Tuple[np.ndarray, np.ndarray, Dict[str, Any]]]:
    """Serial fallback batch solve (parity with ``pmpc/scp_mpc.py:504-511``)."""
    return [solve(**dict(p, verbose=verbose)) for p in problems]
