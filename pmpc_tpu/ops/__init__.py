from .linalg import cholesky_factor, cholesky_solve, psd_solve  # noqa: F401
