"""Fused int4 dequant + matmul (Pallas) — the Marlin-GEMM analog.

TPU-native analog of the reference's Marlin INT4×FP16 fused GEMM
(crates/ferrum-kernels/kernels/marlin_cuda_kernel.cu, vllm_marlin/).
Weights stay packed int4 in HBM; dequantization happens in VMEM right
before the MXU contraction, so HBM traffic is the packed weight bytes —
the quantity that sets decode speed-of-light.

Current status: jnp fallback (dequant + dot, which XLA fuses reasonably);
the hand-tiled Pallas kernel lands behind the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant import QuantLinearParams, dequantize, quant_matmul_ref


def quant_matmul(x: jnp.ndarray, p: QuantLinearParams) -> jnp.ndarray:
    """y = x @ dequant(qweight) (+ bias). x: [..., in] → [..., out]."""
    return quant_matmul_ref(x, p)


def quant_grouped_matmul(x: jnp.ndarray, p: QuantLinearParams,
                         sorted_expert_ids: jnp.ndarray,
                         group_sizes: jnp.ndarray) -> jnp.ndarray:
    """Grouped (MoE expert-stacked) int4 matmul.

    p holds stacked expert weights with a leading expert dim:
    qweight uint8 [E, in/2, out], scales [E, in/group, out],
    zeros [E, in/group, out]. Fallback: dequantize the stack and use
    ragged_dot; the Pallas kernel will stream packed experts instead.
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
