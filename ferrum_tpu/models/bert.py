"""BERT encoder — embeddings executor model.

TPU-native analog of the reference's BERT wrapper
(crates/ferrum-models/src/multimodal/bert.rs, which delegates to
candle's BertModel): here the encoder is a pure jnp function — one
jitted program per padded-length bucket — feeding the embedding lane
(engine/embedding.py). Bidirectional attention, learned position +
token-type embeddings, post-LN blocks (classic BERT), GELU.
Parity: tests/test_bert.py vs transformers' BertModel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BertConfig":
        return cls(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            max_position_embeddings=d.get("max_position_embeddings", 512),
            type_vocab_size=d.get("type_vocab_size", 2),
            layer_norm_eps=float(d.get("layer_norm_eps", 1e-12)))


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "b"], meta_fields=[])
@dataclass
class BAff:
    w: jnp.ndarray
    b: Optional[jnp.ndarray]


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "k", "v", "o", "ln_attn", "fc1", "fc2",
                      "ln_out"],
         meta_fields=[])
@dataclass
class BertBlock:
    q: BAff
    k: BAff
    v: BAff
    o: BAff
    ln_attn: BAff          # post-attention LayerNorm
    fc1: BAff
    fc2: BAff
    ln_out: BAff           # post-MLP LayerNorm


@partial(jax.tree_util.register_dataclass,
         data_fields=["word_emb", "pos_emb", "type_emb", "ln_emb",
                      "blocks"],
         meta_fields=[])
@dataclass
class BertParams:
    word_emb: jnp.ndarray
    pos_emb: jnp.ndarray
    type_emb: jnp.ndarray
    ln_emb: BAff
    blocks: List[BertBlock]


def params_from_hf_sd(cfg: BertConfig, sd: Dict[str, np.ndarray],
                      dtype=jnp.float32) -> BertParams:
    def strip(k):
        return k[5:] if k.startswith("bert.") else k

    sd = {strip(k): v for k, v in sd.items()}

    def aff(prefix, transpose=True):
        w = sd[f"{prefix}.weight"]
        if transpose and w.ndim == 2:
            w = w.T
        b = sd.get(f"{prefix}.bias")
        return BAff(jnp.asarray(w, dtype=dtype),
                    None if b is None else jnp.asarray(b, dtype=dtype))

    def block(i):
        p = f"encoder.layer.{i}"
        return BertBlock(
            q=aff(f"{p}.attention.self.query"),
            k=aff(f"{p}.attention.self.key"),
            v=aff(f"{p}.attention.self.value"),
            o=aff(f"{p}.attention.output.dense"),
            ln_attn=aff(f"{p}.attention.output.LayerNorm",
                        transpose=False),
            fc1=aff(f"{p}.intermediate.dense"),
            fc2=aff(f"{p}.output.dense"),
            ln_out=aff(f"{p}.output.LayerNorm", transpose=False))

    e = "embeddings"
    return BertParams(
        word_emb=jnp.asarray(sd[f"{e}.word_embeddings.weight"],
                             dtype=dtype),
        pos_emb=jnp.asarray(sd[f"{e}.position_embeddings.weight"],
                            dtype=dtype),
        type_emb=jnp.asarray(sd[f"{e}.token_type_embeddings.weight"],
                             dtype=dtype),
        ln_emb=aff(f"{e}.LayerNorm", transpose=False),
        blocks=[block(i) for i in range(cfg.num_layers)])


def _ln(x, p: BAff, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p.w.astype(jnp.float32)
            + p.b.astype(jnp.float32)).astype(x.dtype)


def _lin(x, p: BAff):
    y = jnp.dot(x, p.w, preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p.b if p.b is not None else y


def bert_encode(cfg: BertConfig, params: BertParams,
                tokens: jnp.ndarray,       # int32 [B, T]
                mask: jnp.ndarray) -> jnp.ndarray:
    """-> last hidden state [B, T, H] (bidirectional; pads masked)."""
    b, t = tokens.shape
    x = (params.word_emb[tokens] + params.pos_emb[None, :t]
         + params.type_emb[0][None, None])
    x = _ln(x, params.ln_emb, cfg.layer_norm_eps)
    dh = cfg.hidden_size // cfg.num_heads
    bias = jnp.where(mask[:, None, None, :], 0.0, -jnp.inf)  # [B,1,1,T]
    for blk in params.blocks:
        q = _lin(x, blk.q).reshape(b, t, cfg.num_heads, dh)
        k = _lin(x, blk.k).reshape(b, t, cfg.num_heads, dh)
        v = _lin(x, blk.v).reshape(b, t, cfg.num_heads, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (dh ** -0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype).reshape(b, t, -1)
        x = _ln(x + _lin(attn, blk.o), blk.ln_attn, cfg.layer_norm_eps)
        h = _lin(x, blk.fc1)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = _ln(x + _lin(h, blk.fc2), blk.ln_out, cfg.layer_norm_eps)
    return x


def load_bert_dir(model_dir: str, dtype=jnp.float32):
    import json
    import os

    from .loader import TensorSource
    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    cfg = BertConfig.from_hf_dict(d)
    src = TensorSource.from_dir(model_dir)
    sd = {k: src.get(k) for k in src.keys()}
    return cfg, params_from_hf_sd(cfg, sd, dtype=dtype)
