"""Pallas (Mosaic) TPU kernels — the performance path.

Every kernel here has a pure-jnp reference implementation elsewhere in
ops/ that serves as its parity oracle (the reference repo's `_eq` test
pattern, SURVEY §4.5). Kernels fall back to the reference implementation
on non-TPU backends (tests run on CPU meshes).
"""

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"
