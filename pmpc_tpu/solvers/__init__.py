from .reduced import CondensedQP, assemble_condensed, solve_eq, recover_XU  # noqa: F401
