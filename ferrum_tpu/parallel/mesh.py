"""Device mesh + sharding specs: TP / EP / DP as declarations.

TPU-native replacement for the reference's entire distributed stack —
NCCL all-reduce TP (crates/ferrum-kernels/src/backend/cuda/
{nccl_comm.rs,tp_decode.rs,collective.rs}), column/row WeightShard math
(crates/ferrum-engine/src/parallel/tensor_parallel.rs:159-335) and the
2-GPU layer-split PP (layer_split.rs): here parallelism is expressed as
jax.sharding.NamedSharding partition specs over a Mesh; XLA inserts and
overlaps the ICI collectives (psum after o_proj/down_proj falls out of
the row-sharded weight contraction).

Axes:
  data   — replicate weights, split request slots (DP)
  model  — tensor parallel: column-shard q/k/v/gate/up, row-shard
           o/down, shard KV heads
  expert — expert parallel for MoE stacks (folded into 'model' when
           both are requested on one axis budget)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.llama_family import (
    LayerParams, ModelParams, MoeLayerParams, PagedKvCache, QuantEmbedding,
)
from ..ops.linear import DenseLinearParams, LoraLinearParams
from ..ops.quant import QuantLinearParams


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def _lin_spec(col: bool):
    """Column-parallel shards out-features; row-parallel shards
    in-features (ref: WeightShard tensor_parallel.rs:159)."""
    return (P(None, "model"), P("model", None)) if col \
        else (P("model", None), P(None, "model"))


def _shard_linear(lin, mesh: Mesh, col: bool):
    w_spec, _ = _lin_spec(col)
    bias_spec = P("model") if col else P()
    if isinstance(lin, DenseLinearParams):
        return DenseLinearParams(
            w=jax.device_put(lin.w, NamedSharding(mesh, w_spec)),
            bias=None if lin.bias is None else jax.device_put(
                lin.bias, NamedSharding(mesh, bias_spec)))
    if isinstance(lin, QuantLinearParams):
        # qweight [in/2, out], scales/zeros [in/group, out]: both dims
        # follow the same col/row rule.
        spec = P(None, "model") if col else P("model", None)
        return QuantLinearParams(
            qweight=jax.device_put(lin.qweight, NamedSharding(mesh, spec)),
            scales=jax.device_put(lin.scales, NamedSharding(mesh, spec)),
            zeros=jax.device_put(lin.zeros, NamedSharding(mesh, spec)),
            bias=None if lin.bias is None else jax.device_put(
                lin.bias, NamedSharding(mesh, bias_spec)),
            in_features=lin.in_features, out_features=lin.out_features,
            group_size=lin.group_size,
            scales2=None if lin.scales2 is None else jax.device_put(
                lin.scales2, NamedSharding(mesh, spec)),
            chan_scale=None if lin.chan_scale is None else jax.device_put(
                lin.chan_scale,
                NamedSharding(mesh, P(None, "model") if col else P())))
    if isinstance(lin, LoraLinearParams):
        return LoraLinearParams(
            base=_shard_linear(lin.base, mesh, col),
            lora_a=jax.device_put(lin.lora_a, NamedSharding(mesh, P())),
            lora_b=jax.device_put(lin.lora_b, NamedSharding(mesh, P())),
            scale=lin.scale)
    raise TypeError(type(lin))


def _repl(x, mesh):
    return None if x is None else jax.device_put(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))


def shard_params(params: ModelParams, cfg: ModelConfig,
                 mesh: Mesh) -> ModelParams:
    """Place model weights with TP/EP shardings over `mesh`."""
    layers = []
    for lp in params.layers:
        moe = None
        if lp.moe is not None:
            m = lp.moe
            # Expert-parallel: shard the expert dim over 'model'
            # (EP==TP axis; ref maps EP to its own axis on larger meshes).
            e_spec = NamedSharding(mesh, P("model", None, None))
            if isinstance(m.gate, QuantLinearParams):
                def shard_qstack(q):
                    return QuantLinearParams(
                        qweight=jax.device_put(q.qweight, e_spec),
                        scales=jax.device_put(q.scales, e_spec),
                        zeros=jax.device_put(q.zeros, e_spec),
                        bias=_repl(q.bias, mesh),
                        in_features=q.in_features,
                        out_features=q.out_features,
                        group_size=q.group_size,
                        scales2=None if q.scales2 is None else
                        jax.device_put(q.scales2, e_spec),
                        chan_scale=None if q.chan_scale is None else
                        jax.device_put(q.chan_scale, e_spec))
                gate, up, down = (shard_qstack(m.gate), shard_qstack(m.up),
                                  shard_qstack(m.down))
            else:
                gate = jax.device_put(m.gate, e_spec)
                up = jax.device_put(m.up, e_spec)
                down = jax.device_put(m.down, e_spec)
            moe = MoeLayerParams(
                router=DenseLinearParams(          # router stays replicated
                    w=_repl(m.router.w, mesh),
                    bias=_repl(m.router.bias, mesh)),
                gate=gate, up=up, down=down)
        layers.append(LayerParams(
            input_norm=_repl(lp.input_norm, mesh),
            q=_shard_linear(lp.q, mesh, col=True),
            k=_shard_linear(lp.k, mesh, col=True),
            v=_shard_linear(lp.v, mesh, col=True),
            o=_shard_linear(lp.o, mesh, col=False),
            q_norm=_repl(lp.q_norm, mesh),
            k_norm=_repl(lp.k_norm, mesh),
            post_attn_norm=_repl(lp.post_attn_norm, mesh),
            pre_mlp_norm=_repl(lp.pre_mlp_norm, mesh),
            post_mlp_norm=_repl(lp.post_mlp_norm, mesh),
            gate=None if lp.gate is None else _shard_linear(lp.gate, mesh, True),
            up=None if lp.up is None else _shard_linear(lp.up, mesh, True),
            down=None if lp.down is None else _shard_linear(lp.down, mesh, False),
            moe=moe))
    if isinstance(params.embed, QuantEmbedding):
        embed = QuantEmbedding(
            q=jax.device_put(params.embed.q,
                             NamedSharding(mesh, P("model", None))),
            scale=jax.device_put(params.embed.scale,
                                 NamedSharding(mesh, P("model", None))))
    else:
        embed = jax.device_put(params.embed,
                               NamedSharding(mesh, P("model", None)))
    lm_head = None
    if params.lm_head is not None:
        lm_head = _shard_linear(params.lm_head, mesh, col=True)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=_repl(params.final_norm, mesh),
                       lm_head=lm_head)


def kv_sharding(mesh: Mesh) -> NamedSharding:
    """KV pool [L, blocks, page, Hkv*D]: shard heads over 'model'."""
    return NamedSharding(mesh, P(None, None, None, "model"))


def shard_kv(kv: PagedKvCache, mesh: Mesh) -> PagedKvCache:
    s = kv_sharding(mesh)
    return PagedKvCache(k=jax.device_put(kv.k, s),
                        v=jax.device_put(kv.v, s),
                        page=kv.page, kv_heads=kv.kv_heads,
                        head_dim=kv.head_dim)
