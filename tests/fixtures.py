"""Shared test fixtures: JAX dynamics models (Dubins/unicycle car, double
integrator, random linear systems).

The unicycle car matches the semantics of the reference fixture
(``tests/dubins_car.py:48-90``: closed-form integration of unicycle dynamics
with constant acceleration and turn rate over a step of length T), derived and
implemented independently in JAX. State: [px, py, speed, heading];
controls: [acceleration, turn rate].
"""

import numpy as np
import jax.numpy as jnp

from pmpc_tpu.dynamics import make_f_fx_fu_fn


def unicycle_step(x, u, p=(1.0, 1.0, 0.3)):
    """Closed-form unicycle step. x=(px,py,v,th), u=(accel, turn), p=(v_scale,w_scale,T).

    Numerically stable at small turn rates: the exact integrals are expressed
    through C1 = int cos(th+h s) ds and C2 = int s cos(th+h s) ds (and sine
    analogues) with a Taylor switch at small |h| — no 1/w^2 cancellation, so
    Jacobians stay accurate in float32 (the reference fixture's eps-shift
    trick, tests/dubins_car.py:62-64, is catastrophically noisy in f32)."""
    v_scale, w_scale, T = p
    a = v_scale * u[..., 0]
    w = w_scale * -u[..., 1]
    px, py, v, th = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    h = T * w  # total turn over the step

    small = jnp.abs(h) < 0.1
    hs = jnp.where(small, 1.0, h)  # safe denominator for the exact branch
    h2 = h * h
    h3 = h2 * h
    sin_th, cos_th = jnp.sin(th), jnp.cos(th)
    sin_thh, cos_thh = jnp.sin(th + h), jnp.cos(th + h)

    # C1 = (sin(th+h) - sin(th))/h,  S1 = -(cos(th+h) - cos(th))/h
    C1_exact = (sin_thh - sin_th) / hs
    S1_exact = -(cos_thh - cos_th) / hs
    C1_taylor = cos_th - 0.5 * h * sin_th - (h2 / 6.0) * cos_th + (h3 / 24.0) * sin_th
    S1_taylor = sin_th + 0.5 * h * cos_th - (h2 / 6.0) * sin_th - (h3 / 24.0) * cos_th
    C1 = jnp.where(small, C1_taylor, C1_exact)
    S1 = jnp.where(small, S1_taylor, S1_exact)

    # C2 = int_0^1 s cos(th + h s) ds, S2 = int_0^1 s sin(th + h s) ds
    C2_exact = (h * sin_thh + cos_thh - cos_th) / (hs * hs)
    S2_exact = (-h * cos_thh + sin_thh - sin_th) / (hs * hs)
    C2_taylor = 0.5 * cos_th - (h / 3.0) * sin_th - (h2 / 8.0) * cos_th + (h3 / 30.0) * sin_th
    S2_taylor = 0.5 * sin_th + (h / 3.0) * cos_th - (h2 / 8.0) * sin_th - (h3 / 30.0) * cos_th
    C2 = jnp.where(small, C2_taylor, C2_exact)
    S2 = jnp.where(small, S2_taylor, S2_exact)

    px_new = px + T * v * C1 + T * T * a * C2
    py_new = py + T * v * S1 + T * T * a * S2
    v_new = v + T * a
    th_new = th + h
    return jnp.stack([px_new, py_new, v_new, th_new], axis=-1)


def dubins_f_fx_fu_fn(p=(1.0, 1.0, 0.3)):
    return make_f_fx_fu_fn(lambda x, u: unicycle_step(x, u, p))


def linear_f_fx_fu_fn(A, B, c=None):
    """Linear dynamics x+ = A x + B u + c as a reference-style callback."""
    A, B = np.asarray(A), np.asarray(B)
    c = np.zeros(A.shape[0]) if c is None else np.asarray(c)

    def f_fx_fu_fn(X, U):
        f = X @ A.T + U @ B.T + c
        fx = np.broadcast_to(A, X.shape[:-1] + A.shape)
        fu = np.broadcast_to(B, X.shape[:-1] + B.shape)
        return f, fx, fu

    return f_fx_fu_fn


def double_integrator_f_fx_fu_fn(dt=0.1):
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt**2], [dt]])
    return linear_f_fx_fu_fn(A, B)
