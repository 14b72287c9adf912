"""Fused int4 dequant + matmul (Pallas) — the Marlin-GEMM analog.

TPU-native analog of the reference's Marlin INT4×FP16 fused GEMM
(crates/ferrum-kernels/kernels/marlin_cuda_kernel.cu, vllm_marlin/):
weights stay packed int4 in HBM; each K-tile is dequantized in VMEM
immediately before its MXU contraction, so HBM weight traffic is the
packed nibble bytes — the quantity that sets decode speed-of-light.

Layout contract (ops/quant.py pack_rows_np): within every group of 128
input rows, byte row j holds original row g*128+j in its LOW nibble and
row g*128+64+j in its HIGH nibble → a group dequantizes with two masks
and one sublane concatenate (the "TPU repack" trades the Marlin tile
shuffle for this).

Grid: (N/BN, K/BK) with K innermost, BK=256 (2 quant groups per step),
accumulating into VMEM scratch, output written on the last K step.
qweight streams through blocked specs (Pallas auto-pipelines the HBM→
VMEM loads across grid steps); scales/zeros are small and ride fully
resident in VMEM, sliced per step.

Fallback: jnp dequant+dot on non-TPU backends (parity oracle
ops/quant.quant_matmul_ref; tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QuantLinearParams, dequantize, quant_matmul_ref
from . import on_tpu

GROUP = 128
BKB = 128                # packed byte rows per K step (= 256 weight rows)
BN = 256


def _qmm_kernel(x_lo_ref, x_hi_ref, qw_ref, sc_ref, z_ref, o_ref, acc_ref,
                *, n_k_steps: int, half_groups: int, bn: int, gpt: int,
                out_dtype):
    """Global-halves layout: qweight byte tile [BKB, bn] carries weight
    rows [kk*BKB, (kk+1)*BKB) in its low nibbles (scale group kk) and
    rows [K/2 + kk*BKB, ...) in its high nibbles (group G/2 + kk). Each
    nibble plane contracts against its own x column slice — two MXU
    calls, zero shuffle ops."""
    j = pl.program_id(0)
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bkb = qw_ref.shape[0]
    qi = qw_ref[:].astype(jnp.int32)       # Mosaic: shifts need i32 lanes
    low = qi & 0xF
    high = qi >> 4

    lane = pl.ds(j * bn, bn)

    def dequant(plane, g0):
        # per-group scale rows broadcast over each GROUP-row stripe
        qg = plane.reshape(gpt, GROUP, bn)
        parts = []
        for t in range(gpt):
            st = sc_ref[g0 + t, :, lane].astype(jnp.bfloat16)   # [1, bn]
            zt = z_ref[g0 + t, :, lane].astype(jnp.int32)
            parts.append((qg[t] - zt).astype(jnp.bfloat16) * st)
        if gpt == 1:
            return parts[0]
        return jnp.concatenate(parts, axis=0)

    w_lo = dequant(low, kk * gpt)                           # [bkb, bn]
    w_hi = dequant(high, half_groups + kk * gpt)

    acc_ref[:] += jax.lax.dot(x_lo_ref[:], w_lo,
                              preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot(x_hi_ref[:], w_hi,
                              preferred_element_type=jnp.float32)

    @pl.when(kk == n_k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _quant_matmul_2d(x: jnp.ndarray, p: QuantLinearParams,
                     bkb: int = None, bn: int = None) -> jnp.ndarray:
    m, k = x.shape
    n = p.out_features
    assert k == p.in_features
    # Tile-size heuristic (measured on v5e: throughput rises ~3x from
    # (128,256) to (512,512)+, flattening at the VPU unpack ceiling):
    # prefer the largest tiles that divide the problem, capped for VMEM
    # when m is a prefill-sized batch.
    cap = 512 if m > 64 else 1024
    if bkb is None:
        bkb = cap
    while bkb >= GROUP and (k // 2) % bkb:
        bkb //= 2
    if bn is None:
        bn = cap
        while bn > 128 and n % bn:
            bn //= 2
    if p.group_size != GROUP or bkb < GROUP or (n % bn):
        return quant_matmul_ref(x, p)
    n_k = (k // 2) // bkb                    # byte-row tiles
    half_groups = (k // 2) // GROUP

    sc3 = p.scales.reshape(-1, 1, n)         # [G, 1, N]: leading-dim index
    z3 = p.zeros.reshape(-1, 1, n)
    kernel = functools.partial(_qmm_kernel, n_k_steps=n_k,
                               half_groups=half_groups, bn=bn,
                               gpt=bkb // GROUP, out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, bkb), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),           # x low cols
            pl.BlockSpec((m, bkb),
                         lambda j, kk, nk=n_k: (0, nk + kk),
                         memory_space=pltpu.VMEM),           # x high cols
            pl.BlockSpec((bkb, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # zeros (full)
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=p.qweight.nbytes + x.nbytes + 2 * m * n,
            transcendentals=0),
    )(x, x, p.qweight, sc3, z3)
    return out


def quant_matmul(x: jnp.ndarray, p: QuantLinearParams) -> jnp.ndarray:
    """y = x @ dequant(qweight) (+ bias). x: [..., in] → [..., out]."""
    if p.input_perm is not None:
        # act-order GPTQ: weight rows are group-sorted; gather the
        # activation into the same order (cheap: [m, K] gather on x,
        # never on the packed weight). See QuantLinearParams.input_perm.
        import dataclasses
        x = jnp.take(x, p.input_perm, axis=-1)
        p = dataclasses.replace(p, input_perm=None)
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
