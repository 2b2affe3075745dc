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


def _homogeneous(problems: Sequence[Dict[str, Any]]) -> bool:
    p0 = problems[0]
    if np.asarray(p0["x0"]).ndim != 1:
        return False  # already multi-particle: no free axis for stacking
    for p in problems:
        if p.get("f_fx_fu_fn") is not p0.get("f_fx_fu_fn"):
            return False
        for k in _STACK_KEYS:
            a, b = p.get(k, None), p0.get(k, None)
            if (a is None) != (b is None):
                return False
            if a is not None and np.asarray(a).shape != np.asarray(b).shape:
                return False
        for k in ("lin_cost_fn", "extra_cstrs_fns"):
            if p.get(k, None) is not p0.get(k, None):
                return False
        if not _values_equal(p.get("solver_settings", {}) or {},
                             p0.get("solver_settings", {}) or {}):
            return False
    return True


def solve_problems(
    problems: List[Dict[str, Any]],
    split: bool = True,
    verbose: bool = False,
    **kw,
) -> List[Tuple[np.ndarray, np.ndarray, Dict[str, Any]]]:
    """Solve many problems at once; one stacked device solve when possible."""
    problems = [dict(p) for p in problems]
    if len(problems) == 0:
        return []
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
