"""Checkpoint loaders: HF safetensors (bf16/f32) and GPTQ-INT4.

TPU-native analog of the reference's loader stack
(crates/ferrum-quantization/src/native_safetensors.rs NativeSafetensors-
Loader, crates/ferrum-models/src/loader/): mmap'd safetensors shards →
the explicit ModelParams pytree, with GPTQ autodetection from
quantize_config/config.json and on-load repack into the native packed-
int4 layout (the Marlin-repack analog, ops/quant.py).

Weight convention: HF stores linear weights [out, in]; we store [in,
out] (x @ W), so dense weights transpose on load. GPTQ already stores
[in/8, out] packed — no transpose.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ops.linear import DenseLinearParams
from ..ops.quant import QuantLinearParams, make_quant_linear, repack_from_gptq
from ..types import ModelLoadError
from .configs import ModelConfig, config_from_hf_json
from .llama_family import LayerParams, ModelParams, MoeLayerParams


# ---------------------------------------------------------------------------
# Tensor source abstraction (dict for tests, safetensors shards for disk)
# ---------------------------------------------------------------------------

class TensorSource:
    def __init__(self, tensors: Dict[str, np.ndarray]):
        self._t = tensors

    def __contains__(self, name: str) -> bool:
        return name in self._t

    def get(self, name: str) -> np.ndarray:
        try:
            return self._t[name]
        except KeyError:
            raise ModelLoadError(f"missing tensor {name!r}")

    def keys(self):
        return self._t.keys()

    @classmethod
    def from_dir(cls, model_dir: str) -> "TensorSource":
        files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
        if not files:
            raise ModelLoadError(f"no .safetensors under {model_dir}")
        from safetensors import safe_open
        tensors: Dict[str, np.ndarray] = {}

        class _Lazy:
            """Lazily materialize tensors (mmap-backed) to keep peak host
            memory at one-tensor granularity."""

            def __init__(self, files):
                self._handles = [safe_open(f, framework="numpy")
                                 for f in files]
                self._where = {}
                for h in self._handles:
                    for k in h.keys():
                        self._where[k] = h

            def __contains__(self, k):
                return k in self._where

            def __getitem__(self, k):
                return self._where[k].get_tensor(k)

            def keys(self):
                return self._where.keys()

        src = cls({})
        src._t = _Lazy(files)
        return src


def _norm(src: TensorSource, name: str, dtype) -> jnp.ndarray:
    return jnp.asarray(src.get(name), dtype=dtype)


def _maybe(src: TensorSource, name: str, dtype) -> Optional[jnp.ndarray]:
    return _norm(src, name, dtype) if name in src else None


def _dense(src: TensorSource, prefix: str, dtype) -> DenseLinearParams:
    w = np.asarray(src.get(prefix + ".weight"))
    b = src.get(prefix + ".bias") if (prefix + ".bias") in src else None
    return DenseLinearParams(
        w=jnp.asarray(np.ascontiguousarray(w.T), dtype=dtype),
        bias=None if b is None else jnp.asarray(b, dtype=dtype))


def _gptq(src: TensorSource, prefix: str, dtype) -> QuantLinearParams:
    qweight = np.asarray(src.get(prefix + ".qweight"))
    qzeros = np.asarray(src.get(prefix + ".qzeros"))
    scales = np.asarray(src.get(prefix + ".scales")).astype(np.float32)
    g_idx = np.asarray(src.get(prefix + ".g_idx")) \
        if (prefix + ".g_idx") in src else None
    packed, sc, z, group, perm = repack_from_gptq(
        qweight, qzeros, scales, g_idx)
    bias = src.get(prefix + ".bias") if (prefix + ".bias") in src else None
    return QuantLinearParams(
        qweight=jnp.asarray(packed), scales=jnp.asarray(sc, dtype=dtype),
        zeros=jnp.asarray(z),
        bias=None if bias is None else jnp.asarray(bias, dtype=dtype),
        in_features=qweight.shape[0] * 8, out_features=qweight.shape[1],
        group_size=group,
        input_perm=None if perm is None else jnp.asarray(perm))


def _linear(src: TensorSource, prefix: str, dtype, quantize_rtn: bool = False
            ) -> Any:
    """Pick GPTQ tensors when present, else dense (optionally RTN-
    quantizing on load for the quantize-on-load path)."""
    if (prefix + ".qweight") in src:
        return _gptq(src, prefix, dtype)
    d = _dense(src, prefix, dtype)
    if quantize_rtn:
        w = np.asarray(d.w, dtype=np.float32)
        if w.shape[0] % 128 == 0:
            b = None if d.bias is None else np.asarray(d.bias)
            return make_quant_linear(w, group_size=128, bias=b, dtype=dtype)
    return d


def _expert_stack(src: TensorSource, layer_prefix: str, proj: str,
                  num_experts: int, dtype, quantize_rtn: bool):
    """MoE expert weights → stacked params with a leading expert dim.

    Three lanes (ref: StackedExpertLinear, crates/ferrum-quantization/
    src/gptq.rs:154 + vllm_marlin_moe/ops.cu expert stacks):
      - GPTQ checkpoints (`experts.N.*.qweight`): per-expert repack into
        the native packed layout, stacked → QuantLinearParams [E, ...]
        feeding the streamed grouped Pallas kernel.
      - dense + quantize-on-load: RTN each expert, same stacked layout.
      - dense: bf16 stack [E, in, out] for ragged_dot.
    act-order (g_idx) expert checkpoints are rejected: per-expert input
    perms cannot share one activation gather in the grouped kernel.
    """
    first = f"{layer_prefix}.mlp.experts.0.{proj}"
    if f"{first}.qweight" in src:
        packs, scs, zs = [], [], []
        for e in range(num_experts):
            ep = f"{layer_prefix}.mlp.experts.{e}.{proj}"
            qweight = np.asarray(src.get(f"{ep}.qweight"))
            qzeros = np.asarray(src.get(f"{ep}.qzeros"))
            scales = np.asarray(src.get(f"{ep}.scales")).astype(np.float32)
            g_idx = np.asarray(src.get(f"{ep}.g_idx")) \
                if f"{ep}.g_idx" in src else None
            packed, sc, z, group, perm = repack_from_gptq(
                qweight, qzeros, scales, g_idx)
            if perm is not None:
                raise ModelLoadError(
                    "act-order (desc_act) GPTQ MoE experts are not "
                    "supported: per-expert activation permutations "
                    f"({ep}.g_idx)")
            packs.append(packed)
            scs.append(sc)
            zs.append(z)
        return QuantLinearParams(
            qweight=jnp.asarray(np.stack(packs)),
            scales=jnp.asarray(np.stack(scs), dtype=dtype),
            zeros=jnp.asarray(np.stack(zs)), bias=None,
            in_features=packs[0].shape[0] * 2,
            out_features=packs[0].shape[1], group_size=group)
    ws = [np.asarray(src.get(
        f"{layer_prefix}.mlp.experts.{e}.{proj}.weight")).T
        for e in range(num_experts)]
    stack = np.stack(ws)
    if quantize_rtn and stack.shape[1] % 256 == 0:
        from .quantize import _quant_expert_stack
        return _quant_expert_stack(stack, group_size=128, dtype=dtype)
    return jnp.asarray(stack, dtype=dtype)


# ---------------------------------------------------------------------------
# HF name mapping → ModelParams
# ---------------------------------------------------------------------------

def params_from_hf(cfg: ModelConfig, src: TensorSource,
                   dtype=jnp.bfloat16, quantize_rtn: bool = False
                   ) -> ModelParams:
    gemma = cfg.family == "gemma3"
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        a = f"{p}.self_attn"
        moe = None
        gate = up = down = None
        gdn_p = None
        shared = None
        if cfg.layer_is_moe(i):
            m = cfg.moe
            router = _dense(src, f"{p}.mlp.gate", dtype)
            moe = MoeLayerParams(
                router=router,
                gate=_expert_stack(src, p, "gate_proj", m.num_experts,
                                   dtype, quantize_rtn),
                up=_expert_stack(src, p, "up_proj", m.num_experts,
                                 dtype, quantize_rtn),
                down=_expert_stack(src, p, "down_proj", m.num_experts,
                                   dtype, quantize_rtn))
            if cfg.shared_expert_intermediate_size:
                from .gdn import SharedExpertParams
                shared = SharedExpertParams(
                    gate=_linear(src, f"{p}.mlp.shared_expert.gate_proj",
                                 dtype, quantize_rtn),
                    up=_linear(src, f"{p}.mlp.shared_expert.up_proj",
                               dtype, quantize_rtn),
                    down=_linear(src, f"{p}.mlp.shared_expert.down_proj",
                                 dtype, quantize_rtn),
                    gate_proj=_dense(src, f"{p}.mlp.shared_expert_gate",
                                     dtype))
        else:
            gate = _linear(src, f"{p}.mlp.gate_proj", dtype, quantize_rtn)
            up = _linear(src, f"{p}.mlp.up_proj", dtype, quantize_rtn)
            down = _linear(src, f"{p}.mlp.down_proj", dtype, quantize_rtn)

        if cfg.layer_is_linear_attn(i):
            # qwen3.5/qwen3-next GDN mixer (ref: qwen35_weights.rs
            # weight manifest; HF names model.layers.N.linear_attn.*).
            from .gdn import GdnLayerParams
            la = f"{p}.linear_attn"
            gdn_p = GdnLayerParams(
                in_qkvz=_linear(src, f"{la}.in_proj_qkvz", dtype,
                                quantize_rtn),
                in_ba=_linear(src, f"{la}.in_proj_ba", dtype,
                              quantize_rtn),
                conv_w=jnp.asarray(src.get(f"{la}.conv1d.weight")[:, 0, :],
                                   dtype=dtype),
                a_log=jnp.asarray(src.get(f"{la}.A_log"), jnp.float32),
                dt_bias=jnp.asarray(src.get(f"{la}.dt_bias"), jnp.float32),
                norm_w=_norm(src, f"{la}.norm.weight", dtype),
                out=_linear(src, f"{la}.out_proj", dtype, quantize_rtn))
            layers.append(LayerParams(
                input_norm=_norm(src, f"{p}.input_layernorm.weight",
                                 dtype),
                q=None, k=None, v=None, o=None, q_norm=None, k_norm=None,
                post_attn_norm=None,
                pre_mlp_norm=_norm(
                    src, f"{p}.post_attention_layernorm.weight", dtype),
                post_mlp_norm=None,
                gate=gate, up=up, down=down, moe=moe,
                gdn=gdn_p, shared_expert=shared))
            continue

        layers.append(LayerParams(
            input_norm=_norm(src, f"{p}.input_layernorm.weight", dtype),
            q=_linear(src, f"{a}.q_proj", dtype, quantize_rtn),
            k=_linear(src, f"{a}.k_proj", dtype, quantize_rtn),
            v=_linear(src, f"{a}.v_proj", dtype, quantize_rtn),
            o=_linear(src, f"{a}.o_proj", dtype, quantize_rtn),
            q_norm=_maybe(src, f"{a}.q_norm.weight", dtype),
            k_norm=_maybe(src, f"{a}.k_norm.weight", dtype),
            post_attn_norm=_maybe(
                src, f"{p}.post_attention_layernorm.weight", dtype)
            if gemma else None,
            pre_mlp_norm=_norm(
                src,
                f"{p}.pre_feedforward_layernorm.weight" if gemma
                else f"{p}.post_attention_layernorm.weight", dtype),
            post_mlp_norm=_maybe(
                src, f"{p}.post_feedforward_layernorm.weight", dtype)
            if gemma else None,
            gate=gate, up=up, down=down, moe=moe,
            shared_expert=shared))

    lm_head = None
    if not cfg.tie_word_embeddings and "lm_head.weight" in src:
        lm_head = _dense(src, "lm_head", dtype)
    return ModelParams(
        embed=_norm(src, "model.embed_tokens.weight", dtype),
        layers=layers,
        final_norm=_norm(src, "model.norm.weight", dtype),
        lm_head=lm_head)


# ---------------------------------------------------------------------------
# Directory entry point (ref: WeightFormat::detect weight_format.rs)
# ---------------------------------------------------------------------------

def detect_quantization(model_dir: str) -> str:
    qc = os.path.join(model_dir, "quantize_config.json")
    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.exists(qc):
        return "gptq_int4"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        q = c.get("quantization_config")
        if q and q.get("quant_method") == "gptq":
            if int(q.get("bits", 4)) != 4:
                raise ModelLoadError("only 4-bit GPTQ supported")
            return "gptq_int4"
    return "none"


def load_checkpoint(model_dir: str, engine_cfg: EngineConfig
                    ) -> Tuple[ModelConfig, ModelParams, Any]:
    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise ModelLoadError(f"no config.json under {model_dir}")
    model_cfg = config_from_hf_json(cfg_path)
    dtype = jnp.bfloat16 if engine_cfg.dtype == "bf16" else jnp.float32
    src = TensorSource.from_dir(model_dir)
    quantize_rtn = engine_cfg.quantization == "gptq_int4" \
        and detect_quantization(model_dir) == "none"
    params = params_from_hf(model_cfg, src, dtype=dtype,
                            quantize_rtn=quantize_rtn)
    from ..tokenizer import FerrumTokenizer
    tok = None
    if os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        tok = FerrumTokenizer.from_pretrained(model_dir)
        if tok.eos_token_ids:
            model_cfg.eos_token_ids = tuple(tok.eos_token_ids)
    return model_cfg, params, tok
