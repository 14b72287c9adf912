"""Model architecture configs + HF config.json mapping + registry presets.

TPU-native analog of the reference's model registry and architecture
definitions (crates/ferrum-models/src/registry.rs:21-105,
src/definition.rs). One `ModelConfig` describes every decoder-only
family the framework serves:

  - llama   : Llama-3.x / TinyLlama / Vicuna (GQA + SwiGLU + RoPE)
  - mistral : llama + sliding-window attention
  - qwen2   : llama + attention QKV bias
  - qwen3   : llama + per-head QK-norm, no bias
  - gemma3  : 5:1 local/global attention, dual RoPE bases, GeGLU,
              sandwich norms, sqrt(hidden) embedding scaling
              (ref: registry.rs:34-38)
  - qwen3_moe : qwen3 attention + sparse MoE MLP (Qwen3-30B-A3B)
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class RopeScaling:
    """Llama-3 style rope scaling (config.json `rope_scaling`)."""

    rope_type: str = "default"          # default | llama3 | yarn | linear
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192

    @classmethod
    def from_hf(cls, d: Optional[Dict[str, Any]]) -> Optional["RopeScaling"]:
        if not d:
            return None
        return cls(
            rope_type=d.get("rope_type", d.get("type", "default")),
            factor=float(d.get("factor", 1.0)),
            low_freq_factor=float(d.get("low_freq_factor", 1.0)),
            high_freq_factor=float(d.get("high_freq_factor", 4.0)),
            original_max_position_embeddings=int(
                d.get("original_max_position_embeddings", 8192)),
        )


@dataclass
class MoeConfig:
    num_experts: int = 128
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    # Layers listed here use a dense MLP instead of MoE.
    mlp_only_layers: Tuple[int, ...] = ()
    decoder_sparse_step: int = 1


@dataclass
class GdnConfig:
    """Gated-DeltaNet linear-attention dims (qwen3.5/qwen3-next; ref:
    qwen35_config.rs Qwen35LinearAttentionConfig)."""

    num_key_heads: int = 16
    num_value_heads: int = 32
    key_head_dim: int = 128
    value_head_dim: int = 128
    conv_kernel_dim: int = 4


@dataclass
class ModelConfig:
    family: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 14336
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[RopeScaling] = None
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    qk_norm: bool = False               # qwen3: per-head RMSNorm on q,k
    attention_bias: bool = False        # qwen2: bias on q/k/v projections
    sliding_window: Optional[int] = None
    # gemma3: every Nth layer is global, others sliding-window local.
    sliding_window_pattern: int = 0     # 0 = uniform (all global or all SWA)
    # Explicit per-layer attention kinds (HF `layer_types`):
    # "full_attention" | "sliding_attention"; overrides the pattern.
    layer_types: Optional[Tuple[str, ...]] = None
    activation: str = "silu"            # silu | gelu_tanh
    # gemma3 extras
    query_pre_attn_scalar: Optional[float] = None
    sandwich_norms: bool = False        # pre+post norms around attn and mlp
    embedding_multiplier: Optional[float] = None  # sqrt(hidden) for gemma
    rope_local_theta: float = 10000.0   # gemma3 local-layer rope base
    final_logit_softcap: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    # MoE
    moe: Optional[MoeConfig] = None
    # qwen3.5/qwen3-next hybrid: layer_types may contain
    # "linear_attention"; these layers use the gated-DeltaNet mixer.
    gdn: Optional[GdnConfig] = None
    # Fraction of head_dim that gets RoPE (qwen3-next: 0.25).
    partial_rotary_factor: float = 1.0
    # qwen3-next full-attn: q_proj emits 2x(heads*dim); the second half
    # sigmoid-gates the attention output before o_proj.
    attn_output_gate: bool = False
    # MoE shared expert (qwen3-next): intermediate size; 0 = none.
    shared_expert_intermediate_size: int = 0
    # Token ids
    bos_token_id: Optional[int] = 1
    eos_token_ids: Tuple[int, ...] = (2,)

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def attn_scale(self) -> float:
        if self.query_pre_attn_scalar is not None:
            return 1.0 / math.sqrt(self.query_pre_attn_scalar)
        return 1.0 / math.sqrt(self.head_dim)

    def layer_sliding_window(self, layer_idx: int) -> Optional[int]:
        """Effective sliding window for a layer (gemma3 5:1 pattern).

        Returns None for full/global attention layers.
        """
        if self.sliding_window is None:
            return None
        if self.layer_types is not None:
            return self.sliding_window \
                if self.layer_types[layer_idx] == "sliding_attention" else None
        if self.sliding_window_pattern and self.sliding_window_pattern > 0:
            # Gemma3: every `pattern`-th layer (1-indexed) is global.
            if (layer_idx + 1) % self.sliding_window_pattern == 0:
                return None
            return self.sliding_window
        return self.sliding_window

    def layer_is_linear_attn(self, layer_idx: int) -> bool:
        return (self.layer_types is not None
                and self.layer_types[layer_idx] == "linear_attention")

    @property
    def num_linear_layers(self) -> int:
        if self.layer_types is None:
            return 0
        return sum(1 for t in self.layer_types if t == "linear_attention")

    @property
    def num_kv_layers(self) -> int:
        """Layers that own a KV-cache slice (full/sliding attention).
        Hybrid models allocate KV only for these."""
        return self.num_layers - self.num_linear_layers

    def kv_layer_index(self, layer_idx: int) -> int:
        """Ordinal of a full-attention layer among KV-owning layers."""
        if self.layer_types is None:
            return layer_idx
        return sum(1 for t in self.layer_types[:layer_idx]
                   if t != "linear_attention")

    def linear_layer_index(self, layer_idx: int) -> int:
        """Ordinal of a linear-attention layer among GDN layers."""
        return sum(1 for t in self.layer_types[:layer_idx]
                   if t == "linear_attention")

    def layer_is_moe(self, layer_idx: int) -> bool:
        m = self.moe
        if m is None:
            return False
        if layer_idx in m.mlp_only_layers:
            return False
        return (layer_idx + 1) % m.decoder_sparse_step == 0


# ---------------------------------------------------------------------------
# HF config.json → ModelConfig
# ---------------------------------------------------------------------------

_HF_ARCH_FAMILY = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "mistral",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
    "Qwen3MoeForCausalLM": "qwen3_moe",
    "Qwen3NextForCausalLM": "qwen3_next",
}


def family_from_hf_architectures(archs: List[str]) -> str:
    for a in archs:
        if a in _HF_ARCH_FAMILY:
            return _HF_ARCH_FAMILY[a]
    raise ValueError(
        f"unsupported architectures {archs!r}; supported: {sorted(_HF_ARCH_FAMILY)}")


def config_from_hf_dict(d: Dict[str, Any]) -> ModelConfig:
    """Map a HuggingFace config.json dict to ModelConfig.

    Refuses unknown architectures loudly (the reference's explicit
    loader refusal policy, README 'loader refuses it loudly').
    """
    if "text_config" in d:  # Gemma3ForConditionalGeneration wraps text config
        inner = dict(d["text_config"])
        inner.setdefault("architectures", d.get("architectures", []))
        d = inner
    family = family_from_hf_architectures(d.get("architectures", []))
    hidden = int(d["hidden_size"])
    heads = int(d["num_attention_heads"])
    head_dim = int(d.get("head_dim") or hidden // heads)
    eos = d.get("eos_token_id", 2)
    eos_ids = tuple(eos) if isinstance(eos, list) else (int(eos),)

    cfg = ModelConfig(
        family=family,
        vocab_size=int(d["vocab_size"]),
        hidden_size=hidden,
        num_layers=int(d["num_hidden_layers"]),
        num_heads=heads,
        num_kv_heads=int(d.get("num_key_value_heads", heads)),
        head_dim=head_dim,
        intermediate_size=int(d["intermediate_size"]),
        rms_norm_eps=float(d.get("rms_norm_eps", 1e-6)),
        rope_theta=float(d.get("rope_theta", 10000.0)),
        rope_scaling=RopeScaling.from_hf(d.get("rope_scaling")),
        max_position_embeddings=int(d.get("max_position_embeddings", 8192)),
        tie_word_embeddings=bool(d.get("tie_word_embeddings", False)),
        bos_token_id=d.get("bos_token_id"),
        eos_token_ids=eos_ids,
    )

    if family == "qwen2":
        cfg.attention_bias = True
    if family == "qwen3" or family == "qwen3_moe":
        cfg.qk_norm = True
    if family == "mistral":
        cfg.sliding_window = d.get("sliding_window")
    if d.get("layer_types"):
        cfg.layer_types = tuple(d["layer_types"])
    if family == "gemma3":
        cfg.qk_norm = True
        cfg.activation = "gelu_tanh"
        cfg.sandwich_norms = True
        cfg.sliding_window = d.get("sliding_window", 1024)
        cfg.sliding_window_pattern = int(d.get("sliding_window_pattern", 6))
        cfg.query_pre_attn_scalar = float(d.get("query_pre_attn_scalar", head_dim))
        cfg.embedding_multiplier = math.sqrt(hidden)
        cfg.rope_local_theta = float(d.get("rope_local_base_freq", 10000.0))
        cfg.final_logit_softcap = d.get("final_logit_softcapping")
        cfg.attn_logit_softcap = d.get("attn_logit_softcapping")
        cfg.rms_norm_eps = float(d.get("rms_norm_eps", 1e-6))
    if family == "qwen3_moe":
        cfg.moe = MoeConfig(
            num_experts=int(d.get("num_experts", 128)),
            num_experts_per_tok=int(d.get("num_experts_per_tok", 8)),
            moe_intermediate_size=int(d.get("moe_intermediate_size", 768)),
            norm_topk_prob=bool(d.get("norm_topk_prob", True)),
            mlp_only_layers=tuple(d.get("mlp_only_layers", []) or []),
            decoder_sparse_step=int(d.get("decoder_sparse_step", 1)),
        )
    if family == "qwen3_next":
        cfg.qk_norm = True
        cfg.attn_output_gate = True
        cfg.partial_rotary_factor = float(
            d.get("partial_rotary_factor", 0.25))
        cfg.gdn = GdnConfig(
            num_key_heads=int(d.get("linear_num_key_heads", 16)),
            num_value_heads=int(d.get("linear_num_value_heads", 32)),
            key_head_dim=int(d.get("linear_key_head_dim", 128)),
            value_head_dim=int(d.get("linear_value_head_dim", 128)),
            conv_kernel_dim=int(d.get("linear_conv_kernel_dim", 4)))
        if cfg.layer_types is None:
            # HF default: every 4th layer is full attention.
            interval = int(d.get("full_attention_interval", 4))
            cfg.layer_types = tuple(
                "full_attention" if (i + 1) % interval == 0
                else "linear_attention" for i in range(cfg.num_layers))
        if int(d.get("num_experts", 0) or 0) > 0:
            cfg.moe = MoeConfig(
                num_experts=int(d["num_experts"]),
                num_experts_per_tok=int(d.get("num_experts_per_tok", 8)),
                moe_intermediate_size=int(
                    d.get("moe_intermediate_size", 512)),
                norm_topk_prob=bool(d.get("norm_topk_prob", True)),
                mlp_only_layers=tuple(d.get("mlp_only_layers", []) or []),
                decoder_sparse_step=int(d.get("decoder_sparse_step", 1)),
            )
            cfg.shared_expert_intermediate_size = int(
                d.get("shared_expert_intermediate_size", 0) or 0)
    return cfg


def config_from_hf_json(path: str) -> ModelConfig:
    with open(path) as f:
        return config_from_hf_dict(json.load(f))


# ---------------------------------------------------------------------------
# Registry presets (ref: registry.rs aliases) — architecture shapes only;
# weights load from local checkpoints.
# ---------------------------------------------------------------------------

def preset(name: str) -> ModelConfig:
    n = name.lower()
    if n in ("tiny-test", "test-tiny"):
        # Hardware-free smoke-test model (CLI/e2e tests).
        return ModelConfig(
            family="qwen3", vocab_size=512, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
            qk_norm=True, tie_word_embeddings=True, rope_theta=10000.0,
            max_position_embeddings=2048, eos_token_ids=(257,))
    if n in ("tiny-quant", "tiny-test-quant"):
        # Smallest shape the int4-g128 pack layout supports (in/2 must
        # be a group multiple): hardware-free smokes of quantized
        # engines (chip-session scripts, accuracy harness).
        return ModelConfig(
            family="llama", vocab_size=1024, hidden_size=512,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=64,
            intermediate_size=1024, tie_word_embeddings=True,
            rope_theta=10000.0, max_position_embeddings=4096,
            eos_token_ids=(2,))
    if n in ("tiny-gdn", "tiny-qwen3-next"):
        # Hardware-free hybrid (GDN + full attention) smoke-test model.
        return ModelConfig(
            family="qwen3_next", vocab_size=512, hidden_size=64,
            num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
            intermediate_size=128, qk_norm=True, attn_output_gate=True,
            partial_rotary_factor=0.25, tie_word_embeddings=True,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            max_position_embeddings=2048, eos_token_ids=(257,),
            layer_types=("linear_attention", "full_attention",
                         "linear_attention"),
            gdn=GdnConfig(num_key_heads=2, num_value_heads=4,
                          key_head_dim=12, value_head_dim=16,
                          conv_kernel_dim=4))
    if n in ("qwen3-next-80b-a3b", "qwen3.5-80b", "qwen3-next"):
        # Qwen3-Next-80B-A3B (ref: qwen35.rs flagship; HF config).
        return ModelConfig(
            family="qwen3_next", vocab_size=151936, hidden_size=2048,
            num_layers=48, num_heads=16, num_kv_heads=2, head_dim=256,
            intermediate_size=5120, qk_norm=True, attn_output_gate=True,
            partial_rotary_factor=0.25, rope_theta=10000000.0,
            rms_norm_eps=1e-6, max_position_embeddings=262144,
            layer_types=tuple(
                "full_attention" if (i + 1) % 4 == 0 else
                "linear_attention" for i in range(48)),
            gdn=GdnConfig(num_key_heads=16, num_value_heads=32,
                          key_head_dim=128, value_head_dim=128,
                          conv_kernel_dim=4),
            moe=MoeConfig(num_experts=512, num_experts_per_tok=10,
                          moe_intermediate_size=512, norm_topk_prob=True),
            shared_expert_intermediate_size=512,
            bos_token_id=151643, eos_token_ids=(151645,),
        )
    if n in ("llama-3.1-8b", "llama3.1:8b", "llama-8b"):
        return ModelConfig(
            family="llama", vocab_size=128256, hidden_size=4096, num_layers=32,
            num_heads=32, num_kv_heads=8, head_dim=128, intermediate_size=14336,
            rope_theta=500000.0, max_position_embeddings=131072,
            rope_scaling=RopeScaling(rope_type="llama3", factor=8.0,
                                     low_freq_factor=1.0, high_freq_factor=4.0,
                                     original_max_position_embeddings=8192),
            bos_token_id=128000, eos_token_ids=(128001, 128008, 128009),
        )
    if n in ("llama-3.3-70b", "llama3.3:70b", "llama-70b"):
        # The reference's 70B-class lane (DeepSeek-R1-distill-70B /
        # Llama-3.3 on 2x4090 layer-split, layer_split.rs:1-60). Here
        # the story is TP sharding over ICI — parallel/fit.py proves
        # int4 fits TP>=4 on 16 GB v5e chips (tests/test_fit_plan.py).
        return ModelConfig(
            family="llama", vocab_size=128256, hidden_size=8192,
            num_layers=80, num_heads=64, num_kv_heads=8, head_dim=128,
            intermediate_size=28672, rope_theta=500000.0,
            max_position_embeddings=131072,
            rope_scaling=RopeScaling(rope_type="llama3", factor=8.0,
                                     low_freq_factor=1.0,
                                     high_freq_factor=4.0,
                                     original_max_position_embeddings=8192),
            bos_token_id=128000, eos_token_ids=(128001, 128008, 128009),
        )
    if n in ("qwen3-0.6b", "qwen3:0.6b"):
        return ModelConfig(
            family="qwen3", vocab_size=151936, hidden_size=1024, num_layers=28,
            num_heads=16, num_kv_heads=8, head_dim=128, intermediate_size=3072,
            rope_theta=1000000.0, qk_norm=True, tie_word_embeddings=True,
            rms_norm_eps=1e-6, max_position_embeddings=40960,
            bos_token_id=151643, eos_token_ids=(151645, 151643),
        )
    if n in ("qwen3-4b", "qwen3:4b"):
        return ModelConfig(
            family="qwen3", vocab_size=151936, hidden_size=2560, num_layers=36,
            num_heads=32, num_kv_heads=8, head_dim=128, intermediate_size=9728,
            rope_theta=1000000.0, qk_norm=True, tie_word_embeddings=True,
            rms_norm_eps=1e-6, max_position_embeddings=40960,
            bos_token_id=151643, eos_token_ids=(151645, 151643),
        )
    if n in ("qwen3-8b", "qwen3:8b"):
        return ModelConfig(
            family="qwen3", vocab_size=151936, hidden_size=4096, num_layers=36,
            num_heads=32, num_kv_heads=8, head_dim=128, intermediate_size=12288,
            rope_theta=1000000.0, qk_norm=True, rms_norm_eps=1e-6,
            max_position_embeddings=40960,
            bos_token_id=151643, eos_token_ids=(151645, 151643),
        )
    if n in ("qwen3-30b-a3b", "qwen3:30b-a3b", "qwen3-moe"):
        return ModelConfig(
            family="qwen3_moe", vocab_size=151936, hidden_size=2048,
            num_layers=48, num_heads=32, num_kv_heads=4, head_dim=128,
            intermediate_size=6144, rope_theta=1000000.0, qk_norm=True,
            rms_norm_eps=1e-6, max_position_embeddings=40960,
            moe=MoeConfig(num_experts=128, num_experts_per_tok=8,
                          moe_intermediate_size=768, norm_topk_prob=True),
            bos_token_id=151643, eos_token_ids=(151645, 151643),
        )
    if n in ("qwen3-15b-a3b", "qwen3-moe-half"):
        # Single-chip MoE bench lane: the 30B-A3B architecture with 64
        # experts (half the stack) — int4 experts ≈ 7.3 GB + attention
        # ≈ 0.4 GB, honestly fits one v5e's 16 GB HBM beside the KV
        # pool. Per-token active compute equals the flagship's (8 of 64
        # experts, same expert size). The full 30B needs TP=2+ (see
        # NOTES_ROUND2 HBM plan).
        return ModelConfig(
            family="qwen3_moe", vocab_size=151936, hidden_size=2048,
            num_layers=48, num_heads=32, num_kv_heads=4, head_dim=128,
            intermediate_size=6144, rope_theta=1000000.0, qk_norm=True,
            rms_norm_eps=1e-6, max_position_embeddings=40960,
            moe=MoeConfig(num_experts=64, num_experts_per_tok=8,
                          moe_intermediate_size=768, norm_topk_prob=True),
            bos_token_id=151643, eos_token_ids=(151645, 151643),
        )
    raise ValueError(f"unknown model preset {name!r}")
