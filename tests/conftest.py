import jax

# Tests compare against float64 numpy oracles; the library itself is
# dtype-generic (float32 on TPU).
jax.config.update("jax_enable_x64", True)
