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
    """Closed-form unicycle step. x=(px,py,v,th), u=(accel, turn), p=(v_scale,w_scale,T)."""
    v_scale, w_scale, T = p
    eps = 1e-6
    a = v_scale * u[..., 0]
    w = w_scale * -u[..., 1]
    # keep |a|,|w| away from 0 so the closed form stays well-defined
    a = a + jnp.where(a >= 0.0, eps, -eps)
    w = w + jnp.where(w >= 0.0, eps, -eps)
    px, py, v, th = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    thT = th + T * w
    # integrate v(t) cos(th + w t) and v(t) sin(th + w t) for v(t) = v + a t
    px_new = px + (v / w) * (jnp.sin(thT) - jnp.sin(th)) + (a / w**2) * (
        jnp.cos(thT) - jnp.cos(th)
    ) + (a * T / w) * jnp.sin(thT)
    py_new = py - (v / w) * (jnp.cos(thT) - jnp.cos(th)) + (a / w**2) * (
        jnp.sin(thT) - jnp.sin(th)
    ) - (a * T / w) * jnp.cos(thT)
    v_new = v + T * a
    th_new = thT
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
