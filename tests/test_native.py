"""Native C++ runtime: canonical assembly + ADMM solver vs python oracles."""

import numpy as np
import pytest

from pmpc_tpu import native

import oracle

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_canonical_matches_python():
    rng = np.random.default_rng(60)
    M, N, xdim, udim, Nc = 2, 5, 3, 2, 2
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    P, q, A, b = native.build_canonical(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=1.0, reg_u=0.1, slew_reg=0.3, slew_reg0=0.2,
        slew_um1=np.ones((M, udim)), Nc=Nc,
    )
    P_o, q_o = oracle.build_Pq(**p, reg_x=1.0, reg_u=0.1,
                               slew_reg=np.full(M, 0.3), slew_reg0=np.full(M, 0.2),
                               slew_um1=np.ones((M, udim)), Nc=Nc)
    A_o, b_o = oracle.build_Ab(p["x0"], p["f"], p["fx"], p["fu"],
                               p["X_prev"], p["U_prev"], Nc)
    np.testing.assert_allclose(P, P_o, atol=1e-12)
    np.testing.assert_allclose(q, q_o, atol=1e-12)
    np.testing.assert_allclose(A, A_o, atol=1e-12)
    np.testing.assert_allclose(b, b_o, atol=1e-12)


def test_native_admm_solves_box_qp():
    rng = np.random.default_rng(61)
    M, N, xdim, udim, Nc = 1, 6, 3, 2, 0
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    P, q, A, b = native.build_canonical(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=1.0, reg_u=0.1, slew_reg=0.0, slew_reg0=0.0,
        slew_um1=np.zeros((M, udim)), Nc=Nc,
    )
    n = P.shape[0]
    lo, hi = oracle.bounds_vectors(
        None, None, np.full((M, N, udim), -0.5), np.full((M, N, udim), 0.5),
        N, xdim, udim, M, Nc)
    z, status, iters = native.admm_box_qp(P, q, A, b,
                                          np.clip(lo, -1e20, 1e20),
                                          np.clip(hi, -1e20, 1e20),
                                          max_iter=20000, eps=1e-11)
    assert status == 0, (status, iters)
    z_o = oracle.solve_box_qp(P, q, A, b, lo, hi)
    X, U = oracle.split_z(z, N, xdim, udim, M, Nc)
    X_o, U_o = oracle.split_z(z_o, N, xdim, udim, M, Nc)
    # first-order ADMM accuracy (OSQP-role backend): moderate tolerance
    np.testing.assert_allclose(U, U_o, atol=5e-4)
    np.testing.assert_allclose(X, X_o, atol=5e-4)


def test_admm_persistent_incremental_and_prox():
    """Persistent AdmmSolver: set_q reuses the factorization, warm starts cut
    iterations, and prox_point evaluates the proximal operator
    (osqp_solver.jl:34-72, 83-207 role parity)."""
    rng = np.random.default_rng(61)
    M, N, xdim, udim, Nc = 1, 6, 3, 2, 0
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    P, q, A, b = native.build_canonical(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=1.0, reg_u=0.1, slew_reg=0.0, slew_reg0=0.0,
        slew_um1=np.zeros((M, udim)), Nc=Nc,
    )
    n = P.shape[0]
    lo, hi = oracle.bounds_vectors(
        None, None, np.full((M, N, udim), -0.5), np.full((M, N, udim), 0.5),
        N, xdim, udim, M, Nc)
    lo, hi = np.clip(lo, -1e20, 1e20), np.clip(hi, -1e20, 1e20)
    kw = dict(max_iter=20000, eps=1e-11)

    s = native.AdmmSolver(P, q, A, b, lo, hi)
    z1, st1, it1 = s.solve(**kw)
    z_ref, st_ref, _ = native.admm_box_qp(P, q, A, b, lo, hi, **kw)
    assert st1 == 0 and st_ref == 0
    np.testing.assert_allclose(z1, z_ref, atol=1e-7)

    # incremental q update + warm start: small perturbation converges faster
    q2 = q + 0.01 * rng.normal(size=n)
    s.set_q(q2)
    z2, st2, it2 = s.solve(**kw)
    assert st2 == 0
    z2_ref, st2c, it2_cold = native.admm_box_qp(P, q2, A, b, lo, hi, **kw)
    assert st2c == 0
    np.testing.assert_allclose(z2, z2_ref, atol=1e-6)
    assert it2 < it2_cold, (it2, it2_cold)

    # proximal operator: prox_{f0,mask}(v) == direct solve of the augmented QP
    mask = np.full(n, 2.5)
    v = rng.normal(size=n)
    s.prox_setup(mask)
    zp, stp, _ = s.prox_point(v, mask, **kw)
    assert stp == 0
    z_aug, st_aug, _ = native.admm_box_qp(
        P + np.diag(mask), q2 - mask * v, A, b, lo, hi, **kw)
    assert st_aug == 0
    np.testing.assert_allclose(zp, z_aug, atol=1e-6)

    # prox_reset restores the original problem
    s.prox_reset()
    s.set_q(q)
    s.cold_start()
    z3, st3, _ = s.solve(**kw)
    assert st3 == 0
    np.testing.assert_allclose(z3, z_ref, atol=1e-7)
    s.close()


def test_admm_prox_setup_twice_replaces_mask():
    """A second prox_setup without prox_reset must REPLACE the mask, not
    stack it into P (and prox_reset must still restore the original P)."""
    rng = np.random.default_rng(62)
    M, N, xdim, udim, Nc = 1, 5, 2, 1, 0
    p = oracle.random_problem(rng, M=M, N=N, xdim=xdim, udim=udim)
    P, q, A, b = native.build_canonical(
        p["x0"], p["f"], p["fx"], p["fu"], p["X_prev"], p["U_prev"],
        p["Q"], p["R"], p["X_ref"], p["U_ref"],
        reg_x=1.0, reg_u=0.1, slew_reg=0.0, slew_reg0=0.0,
        slew_um1=np.zeros((M, udim)), Nc=Nc,
    )
    n = P.shape[0]
    lo = np.full(n, -1e20)
    hi = np.full(n, 1e20)
    kw = dict(max_iter=20000, eps=1e-11)
    v = rng.normal(size=n)

    s = native.AdmmSolver(P, q, A, b, lo, hi)
    s.prox_setup(np.full(n, 5.0))
    _ = s.prox_point(v, np.full(n, 5.0), **kw)
    mask2 = np.full(n, 1.5)
    s.prox_setup(mask2)  # second setup: must not keep the 5.0 mask
    zp, stp, _ = s.prox_point(v, mask2, **kw)
    assert stp == 0
    z_ref, st_ref, _ = native.admm_box_qp(
        P + np.diag(mask2), q - mask2 * v, A, b, lo, hi, **kw)
    assert st_ref == 0
    np.testing.assert_allclose(zp, z_ref, atol=1e-6)
    # reset restores the ORIGINAL problem, not P + first mask
    s.prox_reset()
    z0, st0, _ = s.solve(**kw)
    z0_ref, st0c, _ = native.admm_box_qp(P, q, A, b, lo, hi, **kw)
    assert st0 == 0 and st0c == 0
    np.testing.assert_allclose(z0, z0_ref, atol=1e-6)
