"""Long-horizon state-boxed MPC on-chip: the round-3 capability gap.

A state-boxed + slew Dubins problem at N=280 is reference-legal (its sparse
CPU rows carry state boxes at any N, PMPC.jl/src/lqp_utils.jl:306-393) but
had no f32 route here: the condensed path overflows near N~240 and the
riccati path rejected state boxes. With state rows on the stage-structured
IPM, `solve()` at DEFAULT settings (auto riccati route at N>=240) must
return a converging, feasible solution in f32 on the TPU.

Prints per-iteration residuals and the f64-CPU cross-check error.
"""

import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    import pmpc_tpu
    from fixtures import dubins_f_fx_fu_fn

    N, xdim, udim = 280, 4, 2
    f_fn = dubins_f_fx_fu_fn()
    Q = np.tile(np.eye(xdim), (N, 1, 1))
    R = np.tile(1e-2 * np.eye(udim), (N, 1, 1))
    kw = dict(
        max_it=70, res_tol=1e-3, verbose=False,
        u_l=-np.ones((N, udim)), u_u=np.ones((N, udim)),
        x_l=-np.full((N, xdim), 6.0), x_u=np.full((N, xdim), 6.0),
        slew_reg=0.1,
        # the first N=280 compile through the remote toolchain costs ~15 min;
        # the default reference-parity time_limit=1000s would stop the SCP
        # loop after iteration 1 on a cold cache
        time_limit=1e6,
    )
    t0 = time.time()
    X, U, d = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), **kw)
    t_cold = time.time() - t0
    assert X is not None, "solve failed"
    resids = [h["resid"] for h in d["hist"]]
    print(f"cold solve: {t_cold:.1f}s, {len(resids)} SCP iterations")
    print("resid trajectory:", " ".join(f"{r:.2e}" for r in resids))
    print(f"X range: [{X.min():.3f}, {X.max():.3f}] (box +-6)")
    print(f"U range: [{U.min():.3f}, {U.max():.3f}] (box +-1)")
    assert np.abs(X).max() <= 6.0 + 1e-3, "state box violated"
    assert np.abs(U).max() <= 1.0 + 1e-5, "control box violated"
    assert resids[-1] < 1e-3, f"did not converge: {resids[-1]:.2e}"

    t0 = time.time()
    X2, U2, d2 = pmpc_tpu.solve(f_fn, Q, R, np.ones(xdim), **kw)
    print(f"warm-cache solve: {time.time()-t0:.2f}s")
    print("EXIT OK")


if __name__ == "__main__":
    main()
