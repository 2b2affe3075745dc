"""pmpc_tpu: a TPU-native particle sequential-convex-programming MPC engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference StanfordASL/pmpc library: nonlinear finite-horizon MPC via SCP with
consensus optimization over M sampled dynamics particles, convex-cone
constraints, and arbitrary linearized costs — with the convex subproblems
solved by batched on-device structured solvers instead of CPU ECOS/OSQP.

Public API parity with ``pmpc/__init__.py``: ``solve``, ``scp_solve``,
``Problem``, ``SOLVE_KWS``, plus ``accelerated_scp_solve``, ``tune_scp``,
``solve_problems``, and the ``remote`` farm module.
"""

from .scp import (  # noqa: F401
    aff_solve,
    scp_solve,
    solve,
    solve_with_a_dict,
)
from .problem import Problem  # noqa: F401
from .dynamics import linearize, make_f_fx_fu_fn, rollout  # noqa: F401

__version__ = "0.1.0"

# Keyword-compatible arguments of `solve` (parity with pmpc/__init__.py:5-31).
SOLVE_KWS = {
    "X_ref",
    "U_ref",
    "X_prev",
    "U_prev",
    "x_l",
    "x_u",
    "u_l",
    "u_u",
    "verbose",
    "debug",
    "max_it",
    "time_limit",
    "res_tol",
    "reg_x",
    "reg_u",
    "slew_rate",
    "u_slew",
    "u0_slew",
    "cost_fn",
    "lin_cost_fn",
    "extra_cstrs_fns",
    "method",
    "solver_settings",
    "solver_state",
    "filter_method",
    "filter_window",
    "filter_it0",
}


def __getattr__(name):
    # lazy imports to keep base import light
    if name == "accelerated_scp_solve":
        from .accelerated import accelerated_scp_solve

        return accelerated_scp_solve
    if name == "tune_scp":
        from .tune import tune_scp

        return tune_scp
    if name == "solve_problems":
        from .batch import solve_problems

        return solve_problems
    if name == "remote":
        from . import remote

        return remote
    raise AttributeError(f"module 'pmpc_tpu' has no attribute {name!r}")
