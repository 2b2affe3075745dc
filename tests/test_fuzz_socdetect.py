"""Fuzz the stage-u-cone extras detection (round-5 routing change).

Random problems with randomized per-stage control-norm SOC extras (random
stage subsets, row scales c != 1, radii, extra linear rows): the structured
route (detection -> u_soc_r on the arrow IPM) must agree with the composed
dense cone program on every draw, and malformed/non-matching blocks must
fall back to composed without error."""

import numpy as np
import pytest

from pmpc_tpu.solvers.dispatch import affine_solve_np

import oracle


def _stage_cone_rows(M, N, xdim, udim, Nc, rng, n_cones, scale, lin_rows):
    nc, nf = Nc * udim, (N - Nc) * udim
    n_full = nc + M * nf + M * N * xdim
    rows, hs, qsizes = [], [], []
    picks = set()
    for _ in range(n_cones):
        i = int(rng.integers(M))
        j = int(rng.integers(N))
        if j < Nc:
            start = j * udim
        else:
            start = nc + i * nf + (j - Nc) * udim
        if start in picks:
            continue
        picks.add(start)
        r = 0.4 + 0.4 * rng.random()
        G = np.zeros((1 + udim, n_full))
        h = np.zeros(1 + udim)
        h[0] = r * scale
        for k in range(udim):
            G[1 + k, start + k] = -scale
        rows.append(G)
        hs.append(h)
        qsizes.append(1 + udim)
    l = 0
    if lin_rows:
        for _ in range(lin_rows):
            g = np.zeros((1, n_full))
            g[0, rng.integers(0, nc + M * nf, size=2)] = rng.normal(size=2)
            rows.insert(l, g)
            hs.insert(l, np.array([1.5 + rng.random()]))
            l += 1
    G_left = np.concatenate(rows, axis=0)
    h = np.concatenate(hs)
    return (l, qsizes, 0, G_left, np.zeros((G_left.shape[0], 0)), h,
            np.zeros(n_full), np.zeros(0))


@pytest.mark.parametrize("seed", range(800, 806))
def test_fuzz_stage_cone_detection_matches_composed(seed):
    rng = np.random.default_rng(seed)
    M, N, xdim, udim = 2, 6, 3, 2
    Nc = int(rng.integers(0, 4))
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    scale = float(rng.choice([1.0, 1.0, 2.0, 0.5]))
    ec = _stage_cone_rows(M, N, xdim, udim, Nc, rng,
                          n_cones=int(rng.integers(2, 7)), scale=scale,
                          lin_rows=int(rng.integers(0, 2)))
    kw = dict(
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.zeros(M), slew_reg0=np.zeros(M),
        slew_um1=np.zeros((M, udim)),
        u_l=None, u_u=None, x_l=None, x_u=None, Nc=Nc)
    args = (p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
            p["Q"], p["R"], p["X_ref"], p["U_ref"])
    X_s, U_s, d_s = affine_solve_np(*args, **kw,
                                    settings=dict(extra_cstrs=[ec]))
    X_c, U_c, d_c = affine_solve_np(
        *args, **kw,
        settings=dict(extra_cstrs=[ec], extras_structured=False))
    assert d_s["ipm_converged"] and d_c["ipm_converged"], (d_s, d_c)
    np.testing.assert_allclose(U_s, U_c, atol=1e-3)


@pytest.mark.parametrize("seed", range(820, 824))
def test_fuzz_riccati_squareplus_matches_condensed(seed):
    """Random boxes/slew/consensus draws: the riccati squareplus Newton must
    land on the condensed barrier's optimum."""
    rng = np.random.default_rng(seed)
    M, N, xdim, udim = 2, 7, 3, 2
    Nc = int(rng.integers(0, 4))
    with_slew = bool(rng.integers(2))
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    kw = dict(
        reg_x=np.full(M, 1.0), reg_u=np.full(M, 0.1),
        slew_reg=np.full(M, 0.3 if with_slew else 0.0),
        slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)),
        u_l=-0.5 * np.ones((M, N, udim)), u_u=0.5 * np.ones((M, N, udim)),
        x_l=None, x_u=None, Nc=Nc)
    args = (p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
            p["Q"], p["R"], p["X_ref"], p["U_ref"])
    ss = dict(smooth_cstr="squareplus", smooth_alpha=10.0, smooth_beta=1.0,
              newton_iters=40)
    X_c, U_c, _ = affine_solve_np(*args, **kw, settings=ss)
    X_r, U_r, _ = affine_solve_np(*args, **kw,
                                  settings=dict(ss, method="riccati"))
    np.testing.assert_allclose(U_r, U_c, atol=2e-5)
