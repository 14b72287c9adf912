"""Fused int4 dequant + matmul (Pallas) — the Marlin-GEMM analog.

TPU-native analog of the reference's Marlin INT4×FP16 fused GEMM
(crates/ferrum-kernels/kernels/marlin_cuda_kernel.cu, vllm_marlin/):
weights stay packed int4 in HBM; each K-tile is dequantized in VMEM
immediately before its MXU contraction, so HBM weight traffic is the
packed nibble bytes — the quantity that sets decode speed-of-light.

Layout contract (ops/quant.py pack_rows_np): within every group of 128
input rows, byte row j holds original row g*128+j in its LOW nibble and
row g*128+64+j in its HIGH nibble → the kernel dequantizes a whole
group with two masks and ONE sublane concatenate (the "TPU repack"
trades the Marlin tile shuffle for this).

Grid: (N/bn, K/128) with K innermost, accumulating into a VMEM scratch
and writing out on the last K step. A group (128 rows) per K step keeps
scales/zeros scalar rows per tile.

Fallback: jnp dequant+dot on non-TPU backends (parity oracle
ops/quant.quant_matmul_ref; tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import quant as quant_ops
from ..quant import QuantLinearParams, dequantize, quant_matmul_ref
from . import on_tpu

GROUP = 128
BN = 256


def _qmm_kernel(x_ref, qw_ref, sc_ref, z_ref, o_ref, acc_ref, *,
                n_k_steps: int, out_dtype):
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q8 = qw_ref[:]                                  # [64, bn] uint8
    low = (q8 & 0xF).astype(jnp.int8)
    high = (q8 >> 4).astype(jnp.int8)
    qi = jnp.concatenate([low, high], axis=0)       # [128, bn] int8
    z = z_ref[:].astype(jnp.int8)                   # [1, bn]
    s = sc_ref[:].astype(jnp.float32)               # [1, bn]
    w = (qi - z).astype(jnp.bfloat16) * s.astype(jnp.bfloat16)

    acc_ref[:] += jax.lax.dot(
        x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == n_k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _quant_matmul_2d(x: jnp.ndarray, p: QuantLinearParams) -> jnp.ndarray:
    m, k = x.shape
    n = p.out_features
    assert k == p.in_features and k % GROUP == 0
    assert p.group_size == GROUP, "kernel assumes group_size=128"
    bn = BN if n % BN == 0 else (128 if n % 128 == 0 else None)
    if bn is None:
        return quant_matmul_ref(x, p)
    n_k = k // GROUP

    kernel = functools.partial(_qmm_kernel, n_k_steps=n_k,
                               out_dtype=x.dtype)
    grid = (n // bn, n_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, GROUP), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP // 2, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, p.qweight, p.scales, p.zeros)
    return out


def quant_matmul(x: jnp.ndarray, p: QuantLinearParams) -> jnp.ndarray:
    """y = x @ dequant(qweight) (+ bias). x: [..., in] → [..., out]."""
    if not on_tpu():
        return quant_matmul_ref(x, p)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    m = x2.shape[0]
    # MXU-friendly M: pad tiny decode batches up to 8 sublanes.
    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out = _quant_matmul_2d(x2, p)[:m]
    out = out.reshape(*lead, p.out_features)
    if p.bias is not None:
        out = out + p.bias
    return out


def quant_grouped_matmul(x: jnp.ndarray, p: QuantLinearParams,
                         sorted_expert_ids: jnp.ndarray,
                         group_sizes: jnp.ndarray) -> jnp.ndarray:
    """Grouped (MoE expert-stacked) int4 matmul.

    p holds stacked expert weights with a leading expert dim:
    qweight uint8 [E, in/2, out], scales [E, in/group, out],
    zeros [E, in/group, out]. Fallback: dequantize the stack and use
    ragged_dot; the dedicated Pallas kernel streams packed experts.
    """
    e = p.qweight.shape[0]
    w = jax.vmap(lambda qw, s, z: dequantize(
        QuantLinearParams(qweight=qw, scales=s, zeros=z, bias=None,
                          in_features=p.in_features,
                          out_features=p.out_features,
                          group_size=p.group_size), dtype=x.dtype))(
        p.qweight, p.scales, p.zeros)
    return jax.lax.ragged_dot(x, w, group_sizes,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
