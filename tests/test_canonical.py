"""Canonical matrix export vs the independent test oracle."""

import numpy as np

from pmpc_tpu.canonical import lqp_generate_problem_matrices

import oracle


def test_canonical_matches_oracle():
    rng = np.random.default_rng(50)
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    P, q, A, b, G, lo, hi = lqp_generate_problem_matrices(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=1.0, reg_u=0.1, Nc=Nc,
        lu=np.full((M, N, udim), -1.0), uu=np.full((M, N, udim), 1.0),
    )
    P_o, q_o = oracle.build_Pq(**p, reg_x=1.0, reg_u=0.1, slew_reg=np.zeros(M),
                               slew_reg0=np.zeros(M), slew_um1=np.zeros((M, udim)), Nc=Nc)
    A_o, b_o = oracle.build_Ab(p["x0"], p["f"], p["fx"], p["fu"],
                               p["X_prev"], p["U_prev"], Nc)
    np.testing.assert_allclose(P, P_o, atol=1e-12)
    np.testing.assert_allclose(q, q_o, atol=1e-12)
    np.testing.assert_allclose(A, A_o, atol=1e-12)
    np.testing.assert_allclose(b, b_o, atol=1e-12)
    nu_rows = Nc * udim + M * (N - Nc) * udim
    assert G.shape[0] == nu_rows and np.all(lo == -1.0) and np.all(hi == 1.0)
