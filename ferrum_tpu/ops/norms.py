"""Normalization ops (jnp; XLA fuses these into adjacent matmuls).

TPU-native analog of the reference's rms_norm / fused_add_rms_norm /
qk-norm CUDA kernels (crates/ferrum-kernels/kernels/{rms_norm,
fused_add_rms_norm,qk_norm_rope}.cu). On TPU these are bandwidth-bound
elementwise ops that XLA fuses into the surrounding program, so they
stay as jnp expressions rather than Pallas kernels.

Numerics: accumulate in f32 regardless of activation dtype (matches the
reference's f32 activation-shadow policy for Gemma, traits.rs:1420).
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
             *, gemma_style: bool = False) -> jnp.ndarray:
    """RMSNorm over the last axis.

    gemma_style: weight is stored as (w - 1) and applied as (1 + w),
    matching Gemma checkpoints.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    w = weight.astype(jnp.float32)
    if gemma_style:
        w = 1.0 + w
    return (xf * w).astype(dtype)


def fused_add_rms_norm(x: jnp.ndarray, residual: jnp.ndarray,
                       weight: jnp.ndarray, eps: float,
                       *, gemma_style: bool = False):
    """(x + residual) then RMSNorm; returns (normed, new_residual).

    Mirrors the reference's fused_add_rms_norm.cu contract: the sum is
    the new residual stream, the norm feeds the next matmul.
    """
    s = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(s, weight, eps, gemma_style=gemma_style), s
