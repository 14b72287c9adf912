"""Uniform linear-layer application over weight formats.

TPU-native analog of the reference's `Linear<B>` trait
(crates/ferrum-quantization/src/traits.rs): one `apply_linear` entry
point serves dense bf16, packed-int4 (GPTQ / GGUF / RTN), and
LoRA-adapted weights. Dispatch happens at trace time (params type is
static), so each compiled program contains exactly the right kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp

from .quant import QuantLinearParams, quant_matmul_ref


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "bias"], meta_fields=[])
@dataclass
class DenseLinearParams:
    """Dense weight stored [in, out] (x @ w)."""

    w: jnp.ndarray
    bias: Optional[jnp.ndarray]


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "lora_a", "lora_b"], meta_fields=["scale"])
@dataclass
class LoraLinearParams:
    """Low-rank adapted linear: y = base(x) + scale * (x @ A) @ B.

    ref: crates/ferrum-quantization/src/lora.rs (LoraLinearRef).
    """

    base: Union[DenseLinearParams, QuantLinearParams]
    lora_a: jnp.ndarray    # [in, r]
    lora_b: jnp.ndarray    # [r, out]
    scale: float


LinearParams = Union[DenseLinearParams, QuantLinearParams, LoraLinearParams]


def apply_linear(p: LinearParams, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W (+ bias). x: [..., in] → [..., out]."""
    if isinstance(p, DenseLinearParams):
        y = jnp.dot(x, p.w, preferred_element_type=jnp.float32).astype(x.dtype)
        if p.bias is not None:
            y = y + p.bias
        return y
    if isinstance(p, QuantLinearParams):
        from .pallas.quant_matmul import quant_matmul
        return quant_matmul(x, p)
    if isinstance(p, LoraLinearParams):
        y = apply_linear(p.base, x)
        delta = jnp.dot(jnp.dot(x, p.lora_a, preferred_element_type=jnp.float32),
                        p.lora_b.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        return y + (p.scale * delta).astype(y.dtype)
    raise TypeError(f"unknown linear params type {type(p)!r}")


def linear_out_features(p: LinearParams) -> int:
    if isinstance(p, DenseLinearParams):
        return p.w.shape[-1]
    if isinstance(p, QuantLinearParams):
        return p.out_features
    return linear_out_features(p.base)
