"""Rotary position embeddings (NeoX/HF half-split layout).

TPU-native analog of the reference's rope.cu / qk_norm_rope.cu kernels.
Frequencies are precomputed once (f32) and gathered by position inside
the jitted step; the rotation itself is a fused elementwise op.

Supports Llama-3 rope scaling (low/high frequency band interpolation)
per the `rope_scaling` config — required for Llama-3.1 parity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.configs import RopeScaling


def rope_inv_freq(head_dim: int, theta: float,
                  scaling: Optional[RopeScaling] = None) -> np.ndarray:
    """Per-pair inverse frequencies [head_dim // 2], f32 (host-side)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if scaling is not None and scaling.rope_type == "llama3":
        # Llama-3.1 frequency-band scaling (HF modeling_rope_utils).
        low_wl = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wl = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2.0 * math.pi / inv
        scaled = np.where(wavelen > low_wl, inv / scaling.factor, inv)
        smooth = (scaling.original_max_position_embeddings / wavelen
                  - scaling.low_freq_factor) / (
                      scaling.high_freq_factor - scaling.low_freq_factor)
        mid = (1.0 - smooth) * inv / scaling.factor + smooth * inv
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        inv = np.where(is_mid, mid, scaled)
    elif scaling is not None and scaling.rope_type == "linear":
        inv = inv / scaling.factor
    return inv.astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """cos/sin tables for given positions.

    positions: int32 [...]; returns (cos, sin) each [..., head_dim // 2] f32.
    """
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q or k. x: [..., num_heads, head_dim]; cos/sin: [..., head_dim//2].

    HF half-split convention: first half pairs with second half
    (x1 = x[..., :d/2], x2 = x[..., d/2:]).
    """
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
