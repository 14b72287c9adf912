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


def concat_linears(ps) -> Optional[LinearParams]:
    """Fuse linears sharing one input into a single wider linear
    (output features concatenated, y = x @ [W0|W1|...]).

    Build-time pass feeding the qkv / gate-up fusions: one kernel
    invocation instead of N (each Pallas call at decode m carries fixed
    pipeline spin-up + a separate activation quantization on the w4a8
    path). Returns None when fusion is unsupported (mixed types, LoRA,
    act-order perms, mismatched quant geometry) — callers keep the
    split path. ref: the reference's fused split-qkv kernels
    (crates/ferrum-kernels/kernels/split_qkv*.cu) approached from the
    other side: it splits a fused projection, we fuse split ones."""
    if any(isinstance(p, LoraLinearParams) for p in ps):
        return None
    if all(isinstance(p, DenseLinearParams) for p in ps):
        if any(p.bias is not None for p in ps):
            bias = jnp.concatenate([
                p.bias if p.bias is not None
                else jnp.zeros(p.w.shape[-1], p.w.dtype) for p in ps])
        else:
            bias = None
        return DenseLinearParams(
            w=jnp.concatenate([p.w for p in ps], axis=-1), bias=bias)
    if all(isinstance(p, QuantLinearParams) for p in ps):
        p0 = ps[0]
        if any(p.in_features != p0.in_features
               or p.group_size != p0.group_size
               or p.input_perm is not None for p in ps):
            return None
        two_level = [p.scales2 is not None for p in ps]
        if any(two_level) != all(two_level):
            return None
        cat = lambda f: jnp.concatenate([getattr(p, f) for p in ps],  # noqa: E731
                                        axis=-1)
        if any(p.bias is not None for p in ps):
            bias = jnp.concatenate([
                p.bias if p.bias is not None
                else jnp.zeros(p.out_features, ps[0].scales.dtype)
                for p in ps])
        else:
            bias = None
        return QuantLinearParams(
            qweight=cat("qweight"), scales=cat("scales"),
            zeros=cat("zeros"), bias=bias,
            in_features=p0.in_features,
            out_features=sum(p.out_features for p in ps),
            group_size=p0.group_size,
            scales2=cat("scales2") if all(two_level) else None,
            chan_scale=cat("chan_scale") if all(two_level) else None)
    return None


def linear_out_features(p: LinearParams) -> int:
    if isinstance(p, DenseLinearParams):
        return p.w.shape[-1]
    if isinstance(p, QuantLinearParams):
        return p.out_features
    return linear_out_features(p.base)
