"""Small shared utilities: iteration table printing, shape helpers, dtype policy.

Parity notes: the ASCII iteration table matches the output format of the
reference's ``pmpc/utils.py:6-62`` (``TablePrinter``); ``atleast_nd`` /
``to_numpy_f64`` mirror ``pmpc/utils.py:65-80``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class TablePrinter:
    """ASCII table printer for SCP iteration logs (same layout as the reference)."""

    def __init__(self, names: Sequence[str], fmts: Optional[Sequence[str]] = None, prefix: str = ""):
        self.names = list(names)
        self.fmts = list(fmts) if fmts is not None else ["%9.4e" for _ in names]
        self.widths = [
            max(self._calc_width(fmt), len(name)) + 2 for fmt, name in zip(self.fmts, self.names)
        ]
        self.prefix = prefix

    @staticmethod
    def _calc_width(fmt: str) -> int:
        kind = fmt[-1]
        if kind in ("f", "e", "d", "i"):
            return max(len(fmt % 1), len(fmt % (-1)))
        if kind == "s":
            return len(fmt % "")
        raise ValueError(f"Unrecognized print format [{fmt}]")

    @staticmethod
    def _pad(s: str, width: int, left_justify: bool = True) -> str:
        assert len(s) <= width
        rem = width - len(s)
        if left_justify:
            return " " * (rem // 2) + s + " " * ((rem // 2) + (rem % 2))
        return " " * ((rem // 2) + (rem % 2)) + s + " " * (rem // 2)

    def make_row_sep(self) -> str:
        return "+" + "".join("-" * w + "+" for w in self.widths)

    def make_header(self) -> str:
        s = self.prefix + self.make_row_sep() + "\n" + self.prefix
        for name, width in zip(self.names, self.widths):
            s += "|" + self._pad(str(name), width, left_justify=True)
        s += "|\n"
        return s + self.prefix + self.make_row_sep()

    def make_footer(self) -> str:
        return self.prefix + self.make_row_sep()

    def make_values(self, vals: Sequence) -> str:
        assert len(vals) == len(self.fmts)
        s = self.prefix
        for val, fmt, width in zip(vals, self.fmts, self.widths):
            s += "|" + self._pad(fmt % val, width, left_justify=False)
        return s + "|"

    def print_header(self) -> None:
        print(self.make_header())

    def print_footer(self) -> None:
        print(self.make_footer())

    def print_values(self, vals: Sequence) -> None:
        print(self.make_values(vals))


def atleast_nd(x, n: int):
    """Left-pad the shape of ``x`` with 1s until it has ``n`` dims (None passes through)."""
    if x is None:
        return None
    x = np.asarray(x) if not hasattr(x, "reshape") else x
    return x.reshape((1,) * max(n - x.ndim, 0) + tuple(x.shape))


def to_numpy_f64(x):
    """Convert to a float64 numpy array (scalars pass through)."""
    if isinstance(x, np.ndarray) and x.dtype == np.float64:
        return x
    if isinstance(x, np.ndarray):
        return x.astype(np.float64)
    if isinstance(x, (float, int)):
        return x
    return np.array(x, dtype=np.float64)


def with_matmul_precision(prec: str):
    """Decorator: trace the wrapped function under ``jax.default_matmul_precision``.

    On TPU, float32 matmuls default to single-pass bfloat16 MXU execution
    (~8 mantissa bits) — catastrophic for an interior-point solver. The solver
    cores are traced under 'highest' (6-pass, full f32 accuracy); the context
    participates in the jit cache key so this is safe under jit."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            import os

            actual = os.environ.get("PMPC_TPU_MATMUL_PRECISION", prec)
            with jax.default_matmul_precision(actual):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def default_dtype():
    """The framework's working dtype: float64 when JAX x64 is enabled, else float32."""
    import jax

    return np.float64 if jax.config.jax_enable_x64 else np.float32
