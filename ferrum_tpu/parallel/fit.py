"""Sharded HBM fit planning — the 70B-class story, quantified.

TPU-native analog of the reference's VRAM autosizing + layer-split
planning (crates/ferrum-cli/src/gpu_mem_autosize.rs,
ferrum-engine/src/layer_split.rs — which fits 70B-class models on
2x24GB via a 2-stage pipeline). Here the mechanism is TP/EP sharding
over the ICI mesh (parallel/mesh.py): this module computes, per chip,
the weight bytes under the EXACT shardings `shard_params` applies
(col/row-split attention+MLP, EP-split experts, vocab-split embeddings,
replicated norms/router) and the KV-pool budget left over, so a serving
config can be validated BEFORE allocating (and the plan is unit-tested
against the flagship shapes: Qwen3-30B-A3B needs TP>=2 on 16 GB v5e,
Llama-3.3-70B int4 needs TP>=4)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

from ..models.configs import ModelConfig

V5E_HBM = 16 * (1 << 30)
GROUP = 128


def _quant_linear_bytes(in_f: int, out_f: int, two_level: bool = True
                        ) -> int:
    """Packed int4 (group 128) storage: nibbles + bf16 scales + int8
    zeros (+ int8 scales2 + f32 chan for the two-level form)."""
    g = in_f // GROUP
    n = in_f * out_f // 2 + g * out_f * 2 + g * out_f
    if two_level:
        n += g * out_f + 4 * out_f
    return n


def _dense_bytes(in_f: int, out_f: int, dtype_bytes: int = 2) -> int:
    return in_f * out_f * dtype_bytes


@dataclass
class FitPlan:
    model: str
    tp: int
    weights_per_chip: int
    kv_bytes_per_token_per_chip: int
    hbm_per_chip: int
    reserve_frac: float
    max_model_len: int

    @property
    def kv_budget(self) -> int:
        return int(self.hbm_per_chip * (1 - self.reserve_frac)
                   - self.weights_per_chip)

    @property
    def fits(self) -> bool:
        # at least one full-length sequence must fit
        return self.kv_budget >= self.kv_bytes_per_token_per_chip \
            * self.max_model_len

    @property
    def max_kv_tokens(self) -> int:
        return max(0, self.kv_budget // self.kv_bytes_per_token_per_chip)

    @property
    def max_full_len_seqs(self) -> int:
        return self.max_kv_tokens // self.max_model_len

    def as_dict(self) -> Dict:
        return {
            "model": self.model, "tp": self.tp,
            "weights_per_chip_gib": round(self.weights_per_chip / 2**30, 2),
            "kv_budget_gib": round(max(self.kv_budget, 0) / 2**30, 2),
            "kv_bytes_per_token": self.kv_bytes_per_token_per_chip,
            "max_kv_tokens": self.max_kv_tokens,
            "max_seqs_at_max_len": self.max_full_len_seqs,
            "fits": self.fits,
        }


def plan_fit(cfg: ModelConfig, name: str, tp: int = 1,
             quant: str = "int4", kv_dtype: str = "bf16",
             hbm_per_chip: int = V5E_HBM, reserve_frac: float = 0.22,
             max_model_len: int = 4096) -> FitPlan:
    """Per-chip weight/KV accounting under parallel/mesh.py shardings.

    TP splits attention heads + MLP/expert intermediate dims (col/row)
    and the vocab dim of embed/lm_head; norms and MoE routers are
    replicated. EP rides the same axis (expert dim / tp). KV heads are
    sharded over 'model' (kv_sharding); when tp > num_kv_heads the
    extra ranks replicate KV (accounted conservatively)."""
    h = cfg.hidden_size
    q_out = cfg.num_heads * cfg.head_dim
    kv_out = cfg.num_kv_heads * cfg.head_dim
    quantized = quant in ("int4", "gptq_int4", "gguf_q4k")

    def lin(in_f, out_f, shards):
        b = _quant_linear_bytes(in_f, out_f) if quantized \
            else _dense_bytes(in_f, out_f)
        return b // shards

    per_layer = 0
    # attention (sharded by heads — col for q/k/v, row for o)
    per_layer += lin(h, q_out, tp) + 2 * lin(h, kv_out, min(
        tp, cfg.num_kv_heads)) + lin(q_out, h, tp)
    per_layer += 4 * h * 2                       # norms (replicated)
    if cfg.moe is not None:
        m = cfg.moe
        e_shard = max(m.num_experts // tp, 1)
        per_layer += e_shard * (
            2 * lin(h, m.moe_intermediate_size, 1)
            + lin(m.moe_intermediate_size, h, 1))
        per_layer += _dense_bytes(h, m.num_experts)   # router replicated
    else:
        per_layer += 2 * lin(h, cfg.intermediate_size, tp) \
            + lin(cfg.intermediate_size, h, tp)
    weights = per_layer * cfg.num_layers
    # embeddings vocab-sharded; lm_head col-sharded (bf16 both)
    weights += cfg.vocab_size * h * 2 // tp
    if not cfg.tie_word_embeddings:
        weights += cfg.vocab_size * h * 2 // tp
    weights += h * 2                             # final norm

    kv_el = 1 if kv_dtype == "int8" else 2
    kv_heads_per_chip = max(cfg.num_kv_heads // tp, 1)
    kv_tok = 2 * cfg.num_kv_layers * kv_heads_per_chip * cfg.head_dim \
        * kv_el
    if kv_dtype == "int8":
        kv_tok += 2 * cfg.num_kv_layers * kv_heads_per_chip * 4

    return FitPlan(model=name, tp=tp, weights_per_chip=int(weights),
                   kv_bytes_per_token_per_chip=int(kv_tok),
                   hbm_per_chip=hbm_per_chip, reserve_frac=reserve_frac,
                   max_model_len=max_model_len)
