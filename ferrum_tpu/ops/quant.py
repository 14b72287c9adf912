"""Weight-only INT4 quantization: packing, repacking, jnp reference matmul.

TPU-native analog of the reference's Marlin INT4 stack
(crates/ferrum-kernels/kernels/marlin_cuda_kernel.cu, vllm_marlin/
gptq_marlin_repack.cu) and GGUF Q4_K Metal kernels. Same contract,
different layout: weights are stored as packed 4-bit nibbles in HBM and
dequantized on the fly inside a fused Pallas matmul kernel
(ops/pallas/quant_matmul.py); this module owns the storage format, the
GPTQ/GGUF → native repack, and the pure-jnp reference implementation
used as the parity oracle (the reference's `_eq` test pattern).

Native packed layout ("TPU repack", the Marlin-repack equivalent):
  qweight : uint8 [in/2, out]  — two nibbles per byte packed along the
            *input* (sublane) axis as GLOBAL HALVES: byte row r holds
            original row r in its LOW nibble and row (in/2 + r) in its
            HIGH nibble. The matmul kernel then contracts the low and
            high nibble planes against two disjoint column slices of x
            with NO interleave/concat shuffles on the VPU — the layout
            choice is the TPU analog of the Marlin tile shuffle.
            (Requires in/2 to be a multiple of group_size so each byte
            tile maps to whole scale groups.)
  scales  : bf16 [in/group, out]
  zeros   : int8 [in/group, out]  — dequant w = (q - z) * s. GPTQ
            symmetric ("u4b8") means z == 8 everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scales", "zeros", "bias", "input_perm",
                      "scales2", "chan_scale"],
         meta_fields=["in_features", "out_features", "group_size"])
@dataclass
class QuantLinearParams:
    """Packed int4 linear weights in the native TPU layout.

    `input_perm` (act-order / desc_act GPTQ checkpoints only): the packed
    weight rows were sorted so each quant group is contiguous; the matmul
    contract is then y = x[..., input_perm] @ dequant(qweight). The
    activation gather is applied by `quant_matmul`/`quant_matmul_ref`
    (the runtime analog of Marlin's act-order perm applied to A,
    ref: vllm_marlin/gptq_marlin_repack.cu + marlin.cu g_idx handling).

    `scales2`/`chan_scale` (two-level w4a8, `requantize_two_level`):
    when present, the per-group scale factors as
    scales[g, n] == chan_scale[0, n] * scales2[g, n] with scales2 a
    SMALL INTEGER (int8). The w4a8 two-level Pallas kernel then
    dequantizes entirely in integer arithmetic — w8 = (q - z) * scales2
    stays within int8 — feeding full-K int8 MXU dots with a single
    per-channel float rescale at the end (the QServe/w4a8-progressive
    scheme; ref: the Marlin w4a16 GEMM this outruns,
    crates/ferrum-kernels/vllm_marlin/marlin.cu). All non-TL paths
    (w4a16 kernel, jnp reference, dequantize) keep using `scales` and
    remain valid on the requantized weights.
    """

    qweight: jnp.ndarray   # uint8 [in/2, out]
    scales: jnp.ndarray    # bf16  [in/group, out]
    zeros: jnp.ndarray     # int8  [in/group, out]
    bias: Optional[jnp.ndarray]
    in_features: int
    out_features: int
    group_size: int
    input_perm: Optional[jnp.ndarray] = None   # int32 [in] or None
    scales2: Optional[jnp.ndarray] = None      # int8 [in/group, out]
    chan_scale: Optional[jnp.ndarray] = None   # f32  [1, out]


def pack_rows_np(q: np.ndarray, group_size: int) -> np.ndarray:
    """Pack uint4 values [in, out] → uint8 [in/2, out]: global halves
    (byte row r = low nibble w[r] | high nibble w[in/2 + r])."""
    in_f, out_f = q.shape
    half = in_f // 2
    assert in_f % 2 == 0 and in_f % group_size == 0, (in_f, group_size)
    low = q[:half].astype(np.uint8)
    high = q[half:].astype(np.uint8)
    return (low & 0xF) | (high << 4)


def unpack_rows(qweight: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """uint8 [in/2, out] → uint4-valued int32 [in, out] (inverse of pack)."""
    qi = qweight.astype(jnp.int32)
    return jnp.concatenate([qi & 0xF, qi >> 4], axis=0)


def quantize_weight_np(
    w: np.ndarray, group_size: int = 128, symmetric: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Round-to-nearest group quantization of a [in, out] f32 weight.

    Returns (qweight_packed uint8 [in/2,out], scales f32 [in/g,out],
    zeros int8 [in/g,out]). This is the from-scratch quantizer used when
    no GPTQ checkpoint is supplied; GPTQ checkpoints convert via
    `repack_from_gptq` preserving their calibrated values bit-exactly.
    """
    in_f, out_f = w.shape
    assert in_f % group_size == 0, (in_f, group_size)
    wg = w.reshape(in_f // group_size, group_size, out_f)
    if symmetric:
        amax = np.abs(wg).max(axis=1)                       # [G, out]
        scale = np.maximum(amax / 7.0, 1e-10)
        zeros = np.full((in_f // group_size, out_f), 8, dtype=np.int8)
        q = np.clip(np.round(wg / scale[:, None, :]) + 8, 0, 15)
    else:
        wmin = wg.min(axis=1)
        wmax = wg.max(axis=1)
        scale = np.maximum((wmax - wmin) / 15.0, 1e-10)
        zeros = np.clip(np.round(-wmin / scale), 0, 15).astype(np.int8)
        q = np.clip(np.round(wg / scale[:, None, :]) + zeros[:, None, :], 0, 15)
    packed = pack_rows_np(q.astype(np.uint8).reshape(in_f, out_f), group_size)
    return packed, scale.astype(np.float32), zeros


def repack_from_gptq(
    qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None, bits: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, Optional[np.ndarray]]:
    """GPTQ checkpoint tensors → native layout (the repack step).

    GPTQ stores qweight int32 [in/8, out] (8 nibbles along in) and
    qzeros int32 [in/group, out/8]; scales f16 [in/group, out]. GPTQ's
    stored zero is (z - 1) in most exporters — the AutoGPTQ convention —
    so we add 1 back. act-order (g_idx): weight rows are sorted so each
    quant group is contiguous, and the SAME permutation must be applied
    to the activation at matmul time — returned as the 5th element
    (None when no act-order). This mirrors Marlin, which keeps a runtime
    perm applied to A (ref: vllm_marlin/gptq_marlin_repack.cu).
    """
    assert bits == 4, "only 4-bit GPTQ supported"
    in8, out_f = qweight.shape
    in_f = in8 * 8
    shifts = np.arange(8, dtype=np.uint32) * 4
    q = ((qweight.astype(np.uint32)[:, None, :] >> shifts[None, :, None]) & 0xF)
    q = q.reshape(in_f, out_f).astype(np.uint8)

    n_groups = qzeros.shape[0]
    group_size = in_f // n_groups
    zshift = np.arange(8, dtype=np.uint32) * 4
    z = ((qzeros.astype(np.uint32)[:, :, None] >> zshift[None, None, :]) & 0xF)
    z = z.reshape(n_groups, qzeros.shape[1] * 8).astype(np.int16) + 1
    z = np.clip(z, 0, 15).astype(np.int8)

    perm = None
    if g_idx is not None and len(g_idx) and not np.array_equal(
            g_idx, np.arange(in_f) // group_size):
        # act-order: sort rows so each group's rows are contiguous. Row
        # r of the sorted weight is original row perm[r], so the matmul
        # must contract x[..., perm] against it: (x[perm]) @ (W[perm])
        # == x @ W. The caller stores perm in QuantLinearParams.
        perm = np.argsort(g_idx, kind="stable").astype(np.int32)
        q = q[perm]
    packed = pack_rows_np(q, group_size)
    return packed, scales.astype(np.float32), z, group_size, perm


def make_quant_linear(
    w: np.ndarray, group_size: int = 128, bias: Optional[np.ndarray] = None,
    symmetric: bool = True, dtype=jnp.bfloat16,
) -> QuantLinearParams:
    """Quantize an [in, out] float weight into device QuantLinearParams."""
    packed, scales, zeros = quantize_weight_np(
        np.asarray(w, dtype=np.float32), group_size, symmetric)
    return QuantLinearParams(
        qweight=jnp.asarray(packed),
        scales=jnp.asarray(scales, dtype=dtype),
        zeros=jnp.asarray(zeros),
        bias=None if bias is None else jnp.asarray(bias, dtype=dtype),
        in_features=w.shape[0], out_features=w.shape[1], group_size=group_size,
    )


def dequantize(p: QuantLinearParams, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full dequantization [in, out] — reference path and load-time tool."""
    q = unpack_rows(p.qweight, p.group_size)                      # [in, out]
    in_f = p.in_features
    g = p.group_size
    qg = q.reshape(in_f // g, g, p.out_features)
    w = (qg - p.zeros[:, None, :].astype(jnp.int32)).astype(jnp.float32)
    w = w * p.scales[:, None, :].astype(jnp.float32)
    return w.reshape(in_f, p.out_features).astype(dtype)


def quant_matmul_w4a8_ref(x: jnp.ndarray, p: QuantLinearParams
                          ) -> jnp.ndarray:
    """Exact jnp emulation of the w4a8 Pallas kernel's math (parity
    oracle): dynamic per-row int8 activations, integer dot, per-group
    zero correction and rescale.

        y[m,n] = sx[m] · Σ_g sw[g,n]·(Σ_k xq[m,k]q[k,n] − z[g,n]Σ_k xq[m,k])
    """
    if p.input_perm is not None:
        x = jnp.take(x, p.input_perm, axis=-1)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int32)

    q = unpack_rows(p.qweight, p.group_size)            # [in, out] 0..15
    g = p.group_size
    n_groups = p.in_features // g
    y = jnp.zeros((x2.shape[0], p.out_features), jnp.float32)
    for gi in range(n_groups):
        xg = xq[:, gi * g:(gi + 1) * g]
        qg = q[gi * g:(gi + 1) * g]
        p32 = jnp.dot(xg, qg, preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg, axis=-1, keepdims=True)
        zt = p.zeros[gi][None, :].astype(jnp.float32)
        st = p.scales[gi][None, :].astype(jnp.float32)
        y += (p32.astype(jnp.float32) - zt * xsum.astype(jnp.float32)) * st
    out = (y * sx).astype(x.dtype).reshape(*lead, p.out_features)
    if p.bias is not None:
        out = out + p.bias
    return out


def _two_level_2d(qweight: jnp.ndarray, scales: jnp.ndarray,
                  zeros: jnp.ndarray, group_size: int):
    """One [in/2, out] packed weight → two-level requantized tensors.

    Factor each group scale as chan * qs with qs a small int chosen so
    that |(q - z) * qs| <= 127 (int8-safe):
      cap[g,n]  = 127 // max(z, 15 - z)        (15 for u4b8's z == 8)
      chan[n]   = max_g scales[g,n] / cap[g,n]
      qs[g,n]   = clip(ceil(scales / chan), 1, cap)
      eff       = chan * qs                     (>= scales, so the
                                                 re-rounded q stays in
                                                 the original nibble
                                                 range — no clipping)
    The weights are re-rounded against eff; the extra error is bounded
    by the step inflation eff/scales <= 2 on the worst group and ~1.0
    on the largest-scale groups (validated by the divergence gate,
    bench/accuracy.py)."""
    in_f = qweight.shape[0] * 2
    n = qweight.shape[1]
    g = in_f // group_size
    q = unpack_rows(qweight, group_size)                 # [in, out] i32
    s = scales.astype(jnp.float32)
    z = zeros.astype(jnp.int32)
    vmax = jnp.maximum(z, 15 - z)
    cap = (127 // jnp.maximum(vmax, 1)).astype(jnp.float32)
    chan = jnp.max(s / cap, axis=0, keepdims=True)       # [1, out]
    chan = jnp.maximum(chan, 1e-12)
    qs = jnp.clip(jnp.ceil(s / chan - 1e-6), 1.0, cap)   # [G, out]
    eff = chan * qs                                      # [G, out] f32
    qg = q.reshape(g, group_size, n)
    w = (qg - z[:, None]).astype(jnp.float32) * s[:, None]
    q2 = jnp.clip(jnp.round(w / eff[:, None]) + z[:, None], 0, 15)
    q2 = q2.astype(jnp.uint8).reshape(in_f, n)
    half = in_f // 2
    packed = (q2[:half] | (q2[half:] << 4)).astype(jnp.uint8)
    return packed, eff, qs.astype(jnp.int8), chan


def requantize_two_level(p: QuantLinearParams) -> QuantLinearParams:
    """Requantize into the two-level w4a8 form (see QuantLinearParams).

    Handles both 2D weights and stacked MoE experts (leading E dim).
    Idempotent; `scales` is replaced by the effective (chan * qs) scale
    so every existing dequant/matmul path stays correct."""
    import dataclasses

    if p.scales2 is not None:
        return p
    if p.qweight.ndim == 3:
        packed, eff, qs, chan = jax.vmap(
            lambda qw, s, z: _two_level_2d(qw, s, z, p.group_size))(
            p.qweight, p.scales, p.zeros)
    else:
        packed, eff, qs, chan = _two_level_2d(
            p.qweight, p.scales, p.zeros, p.group_size)
    return dataclasses.replace(
        p, qweight=packed, scales=eff.astype(p.scales.dtype),
        scales2=qs, chan_scale=chan)


def quant_matmul_w4a8tl_ref(x: jnp.ndarray, p: QuantLinearParams
                            ) -> jnp.ndarray:
    """Exact jnp emulation of the two-level w4a8 Pallas kernel (parity
    oracle): per-row int8 activations, integer weights
    w8 = (q - z) * scales2, ONE integer dot over the full K dim, one
    per-channel rescale:  y = (xq @ w8) * sx * chan."""
    assert p.scales2 is not None
    if p.input_perm is not None:
        x = jnp.take(x, p.input_perm, axis=-1)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int32)

    q = unpack_rows(p.qweight, p.group_size)            # [in, out]
    g = p.group_size
    qg = q.reshape(p.in_features // g, g, p.out_features)
    w8 = ((qg - p.zeros[:, None, :].astype(jnp.int32))
          * p.scales2[:, None, :].astype(jnp.int32))
    w8 = w8.reshape(p.in_features, p.out_features)
    acc = jnp.dot(xq, w8, preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * sx
           * p.chan_scale.astype(jnp.float32)).astype(x.dtype)
    out = out.reshape(*lead, p.out_features)
    if p.bias is not None:
        out = out + p.bias
    return out


def quant_matmul_ref(x: jnp.ndarray, p: QuantLinearParams) -> jnp.ndarray:
    """jnp reference: dequantize then matmul. Parity oracle for the
    Pallas fused kernel (ops/pallas/quant_matmul.py)."""
    if p.input_perm is not None:
        x = jnp.take(x, p.input_perm, axis=-1)
    w = dequantize(p, dtype=x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if p.bias is not None:
        out = out + p.bias
    return out
