"""Probe: flagship SCP convergence — iterations to reach resid thresholds.

Reproduces the round-3 judge measurement (resid 0.073 after 8 iterations,
~32 to 1e-3) and serves as the A/B harness for round-4 iteration-count work
(device-loop Anderson acceleration, adaptive prox regularization).

Usage: python benchmarks/conv_probe.py [max_it] [extra build kwargs as k=v]
"""

import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _dubins
    from pmpc_tpu.jax_scp import build_scp_solver, make_scp_data

    max_it = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    kw = {}
    for a in sys.argv[2:]:
        k, v = a.split("=")
        try:
            kw[k] = int(v)
        except ValueError:
            try:
                kw[k] = float(v)
            except ValueError:
                kw[k] = v

    M, N, xdim, udim, Nc = 32, 30, 4, 2, 5
    solver = build_scp_solver(
        _dubins, N=N, xdim=xdim, udim=udim, M=M, Nc=Nc,
        max_it=max_it, res_tol=1e-5, has_u_bounds=True,
        ipm_iters=15, jit=True, collect_stats=True, **kw,
    )
    rng = np.random.default_rng(0)
    x0 = (np.ones((M, xdim)) + 0.05 * rng.normal(size=(M, xdim))).astype(np.float32)
    Q = np.tile(np.eye(xdim, dtype=np.float32), (M, N, 1, 1))
    R = np.tile((1e-2 * np.eye(udim)).astype(np.float32), (M, N, 1, 1))
    data = make_scp_data(
        x0, Q, R, reg_x=1.0, reg_u=0.1,
        u_l=-np.ones((M, N, udim), np.float32),
        u_u=np.ones((M, N, udim), np.float32),
    )
    t0 = time.time()
    X, U, info = solver(data)
    resids = np.asarray(info["scan_stats"]["resid"])
    print(f"compile+run: {time.time()-t0:.1f}s  kwargs={kw}")
    print("it resid")
    for i, r in enumerate(resids):
        print(f"{i+1:3d} {r:.3e}")
    for thr in (1e-2, 1e-3, 1e-4, 1e-5):
        hit = np.argmax(resids < thr) + 1 if np.any(resids < thr) else -1
        print(f"iters to {thr:g}: {hit}")


if __name__ == "__main__":
    main()
