"""SCP regularization hyperparameter sweep.

Parity with ``pmpc/scp_mpc.py:460-497`` (``tune_scp``): log-spaced sweep over
``reg_x`` with ``reg_u = reg_ratio * reg_x``, picking the regularization with
the best final residual; optional matplotlib diagnostic plot.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from .scp import scp_solve


def tune_scp(
    *args,
    sample_nb: int = 14,
    reg_rng: Tuple[int, int] = (-3, 3),
    solve_fn: Callable = scp_solve,
    savefig: Optional[str] = None,
    plot: bool = False,
    **kwargs,
):
    reg_ratio = kwargs.get("reg_ratio", 1e-1)
    reg_list = kwargs.get("reg_list", np.logspace(*reg_rng, sample_nb))
    res_list = []
    for reg in reg_list:
        kwargs["reg_x"], kwargs["reg_u"] = reg, reg * reg_ratio
        kwargs["verbose"] = False
        kw = {k: v for k, v in kwargs.items() if k not in ("reg_ratio", "reg_list")}
        X, U, data = solve_fn(*args, **kw)
        inf = 1e2
        res_list.append(inf if data is None else data["hist"][-1]["resid"])

    if plot or savefig is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.loglog(reg_list, res_list)
        plt.ylabel("final residual")
        plt.xlabel("reg_x")
        plt.title("reg_u = reg_x * %6.1e" % reg_ratio)
        plt.tight_layout()
        plt.grid(visible=True, which="major")
        plt.grid(visible=True, which="minor")
        if savefig is not None:
            plt.savefig(savefig, dpi=200)

    reg_x = reg_list[int(np.argmin(res_list))]
    reg_u = reg_ratio * reg_x
    return reg_x, reg_u
