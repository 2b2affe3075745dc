"""Time the (B*M, 90, 90) SPD factor paths used by config-5's IPM."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.ops.block_chol import inv_cholesky, inv_chol_apply


def main():
    print(f"platform={jax.default_backend()}")
    rng = np.random.default_rng(0)
    for (B, n) in ((1024, 90), (2048, 50), (4096, 90)):
        A = rng.normal(size=(B, n, n)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32)
        Aj = jnp.asarray(A)
        b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

        fac = jax.jit(inv_cholesky)
        M = fac(Aj)
        _ = float(M.sum())
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            M = fac(Aj)
        _ = float(M.sum())
        dt_f = (time.perf_counter() - t0) / reps

        app = jax.jit(inv_chol_apply)
        x = app(M, b)
        _ = float(x.sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            x = app(M, b)
        _ = float(x.sum())
        dt_a = (time.perf_counter() - t0) / reps
        err = float(jnp.max(jnp.abs(jnp.einsum("bij,bj->bi", Aj, x) - b)))
        print(f"  ({B},{n},{n}): inv_cholesky {dt_f*1e3:7.2f} ms   "
              f"apply {dt_a*1e3:6.2f} ms   resid {err:.2e}")


if __name__ == "__main__":
    main()
