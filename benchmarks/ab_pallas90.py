"""Correctness + timing of the single-buffer Pallas factor at n=50/90."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pmpc_tpu  # noqa: F401
from pmpc_tpu.ops.pallas_chol import pallas_inv_cholesky, fits_vmem
from pmpc_tpu.ops.block_chol import inv_cholesky, inv_chol_apply


def main():
    print(f"platform={jax.default_backend()} fits_vmem(90)={fits_vmem(90)}")
    rng = np.random.default_rng(0)
    for (B, n) in ((2048, 50), (1024, 90), (1024, 96)):
        # well-conditioned SPD fixtures (IPM Newton matrices are regularized)
        G = rng.normal(size=(B, n, n)).astype(np.float32) / np.sqrt(n)
        A = G @ G.transpose(0, 2, 1) + np.eye(n, dtype=np.float32)
        Aj = jnp.asarray(A)
        b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

        pal = jax.jit(pallas_inv_cholesky)
        blk = jax.jit(inv_cholesky)
        Mp = pal(Aj)
        Mb = blk(Aj)
        dM = float(jnp.max(jnp.abs(Mp - Mb)))
        xp = inv_chol_apply(Mp, b)
        res = float(jnp.max(jnp.abs(jnp.einsum("bij,bj->bi", Aj, xp) - b)))

        reps = 30
        _ = float(Mp.sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            Mp = pal(Aj)
        _ = float(Mp.sum())
        dt_p = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            Mb = blk(Aj)
        _ = float(Mb.sum())
        dt_b = (time.perf_counter() - t0) / reps
        print(f"  ({B},{n},{n}): pallas {dt_p*1e3:7.2f} ms  blocked {dt_b*1e3:7.2f} ms"
              f"  |dM|={dM:.2e}  solve resid={res:.2e}")


if __name__ == "__main__":
    main()
