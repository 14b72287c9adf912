"""Whisper ASR — encoder/decoder forward + greedy transcription in JAX.

TPU-native analog of the reference's custom Whisper forward
(crates/ferrum-models/src/multimodal/whisper.rs:1-576 — which hand-rolls
LayerNorm/softmax over candle buffers) and its executor
(executor/whisper_executor.rs): here the whole pipeline is jitted XLA —
the encoder is ONE program over the padded 30 s window, and greedy
decoding is ONE `lax.scan` over max_new_tokens with a static KV cache
(no per-token dispatch), with EOT truncation on the host.

The log-mel frontend (ops/audio.py) reproduces HF's
WhisperFeatureExtractor numerically (hann window, n_fft=400, hop=160,
Slaney mel filterbank, log10 + max-8dB clamp).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    encoder_heads: int = 6
    decoder_heads: int = 6
    encoder_ffn: int = 1536
    decoder_ffn: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    suppress_tokens: Tuple[int, ...] = ()
    begin_suppress_tokens: Tuple[int, ...] = ()
    forced_decoder_ids: Tuple[Tuple[int, int], ...] = ()

    @classmethod
    def from_hf_dict(cls, d: dict) -> "WhisperConfig":
        return cls(
            vocab_size=d["vocab_size"],
            num_mel_bins=d.get("num_mel_bins", 80),
            d_model=d["d_model"],
            encoder_layers=d["encoder_layers"],
            decoder_layers=d["decoder_layers"],
            encoder_heads=d["encoder_attention_heads"],
            decoder_heads=d["decoder_attention_heads"],
            encoder_ffn=d["encoder_ffn_dim"],
            decoder_ffn=d["decoder_ffn_dim"],
            max_source_positions=d.get("max_source_positions", 1500),
            max_target_positions=d.get("max_target_positions", 448),
            decoder_start_token_id=d.get("decoder_start_token_id", 50258),
            eos_token_id=(d.get("eos_token_id") or 50257),
            suppress_tokens=tuple(d.get("suppress_tokens") or ()),
            begin_suppress_tokens=tuple(
                d.get("begin_suppress_tokens") or ()),
            forced_decoder_ids=tuple(
                (int(i), int(t)) for i, t in
                (d.get("forced_decoder_ids") or ())),
        )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _reg(cls, fields):
    return partial(jax.tree_util.register_dataclass, data_fields=fields,
                   meta_fields=[])(cls)


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "b"], meta_fields=[])
@dataclass
class Aff:
    """Affine (linear or layernorm) weight + optional bias."""

    w: jnp.ndarray
    b: Optional[jnp.ndarray]


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "k", "v", "o"], meta_fields=[])
@dataclass
class AttnP:
    q: Aff
    k: Aff
    v: Aff
    o: Aff


@partial(jax.tree_util.register_dataclass,
         data_fields=["ln1", "attn", "ln_cross", "cross", "ln2",
                      "fc1", "fc2"],
         meta_fields=[])
@dataclass
class BlockP:
    ln1: Aff
    attn: AttnP
    ln_cross: Optional[Aff]
    cross: Optional[AttnP]
    ln2: Aff
    fc1: Aff
    fc2: Aff


@partial(jax.tree_util.register_dataclass,
         data_fields=["conv1", "conv2", "enc_pos", "enc_blocks", "enc_ln",
                      "dec_embed", "dec_pos", "dec_blocks", "dec_ln"],
         meta_fields=[])
@dataclass
class WhisperParams:
    conv1: Aff          # [d, mels, 3]
    conv2: Aff          # [d, d, 3] stride 2
    enc_pos: jnp.ndarray
    enc_blocks: List[BlockP]
    enc_ln: Aff
    dec_embed: jnp.ndarray
    dec_pos: jnp.ndarray
    dec_blocks: List[BlockP]
    dec_ln: Aff


def params_from_hf_sd(cfg: WhisperConfig, sd: Dict[str, np.ndarray],
                      dtype=jnp.float32) -> WhisperParams:
    def aff(prefix, transpose=True):
        w = sd[f"{prefix}.weight"]
        if transpose and w.ndim == 2:
            w = w.T
        b = sd.get(f"{prefix}.bias")
        return Aff(jnp.asarray(w, dtype=dtype),
                   None if b is None else jnp.asarray(b, dtype=dtype))

    def attnp(prefix):
        return AttnP(q=aff(f"{prefix}.q_proj"), k=aff(f"{prefix}.k_proj"),
                     v=aff(f"{prefix}.v_proj"),
                     o=aff(f"{prefix}.out_proj"))

    def block(prefix, cross):
        return BlockP(
            ln1=aff(f"{prefix}.self_attn_layer_norm", transpose=False),
            attn=attnp(f"{prefix}.self_attn"),
            ln_cross=aff(f"{prefix}.encoder_attn_layer_norm",
                         transpose=False) if cross else None,
            cross=attnp(f"{prefix}.encoder_attn") if cross else None,
            ln2=aff(f"{prefix}.final_layer_norm", transpose=False),
            fc1=aff(f"{prefix}.fc1"), fc2=aff(f"{prefix}.fc2"))

    e = "model.encoder"
    d = "model.decoder"
    return WhisperParams(
        conv1=aff(f"{e}.conv1", transpose=False),
        conv2=aff(f"{e}.conv2", transpose=False),
        enc_pos=jnp.asarray(sd[f"{e}.embed_positions.weight"], dtype=dtype),
        enc_blocks=[block(f"{e}.layers.{i}", cross=False)
                    for i in range(cfg.encoder_layers)],
        enc_ln=aff(f"{e}.layer_norm", transpose=False),
        dec_embed=jnp.asarray(sd[f"{d}.embed_tokens.weight"], dtype=dtype),
        dec_pos=jnp.asarray(sd[f"{d}.embed_positions.weight"], dtype=dtype),
        dec_blocks=[block(f"{d}.layers.{i}", cross=True)
                    for i in range(cfg.decoder_layers)],
        dec_ln=aff(f"{d}.layer_norm", transpose=False),
    )


def load_whisper_dir(model_dir: str, dtype=jnp.float32):
    """(cfg, params) from a HF whisper checkpoint directory."""
    import json
    import os

    from .loader import TensorSource
    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    gen_path = os.path.join(model_dir, "generation_config.json")
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            g = json.load(f)
        for k in ("forced_decoder_ids", "suppress_tokens",
                  "begin_suppress_tokens", "decoder_start_token_id",
                  "eos_token_id"):
            if g.get(k) is not None:
                d[k] = g[k]
    cfg = WhisperConfig.from_hf_dict(d)
    src = TensorSource.from_dir(model_dir)
    sd = {k: src.get(k) for k in src.keys()}
    if "proj_out.weight" in sd and "model.decoder.embed_tokens.weight" \
            not in sd:
        sd["model.decoder.embed_tokens.weight"] = sd["proj_out.weight"]
    return cfg, params_from_hf_sd(cfg, sd, dtype=dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, p: Aff, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p.w.astype(jnp.float32)
    if p.b is not None:
        y = y + p.b.astype(jnp.float32)
    return y.astype(x.dtype)


def _lin(x, p: Aff):
    y = jnp.dot(x, p.w, preferred_element_type=jnp.float32).astype(x.dtype)
    if p.b is not None:
        y = y + p.b
    return y


def _mha(q_in, kv_in, p: AttnP, heads: int, causal_mask=None):
    """Multi-head attention (q scaled by d_h^-0.5, HF convention)."""
    n, d = q_in.shape[-2], q_in.shape[-1]
    dh = d // heads
    q = _lin(q_in, p.q) * (dh ** -0.5)
    k = _lin(kv_in, p.k)
    v = _lin(kv_in, p.v)
    m = kv_in.shape[-2]
    q = q.reshape(*q.shape[:-1], heads, dh)
    k = k.reshape(*k.shape[:-1], heads, dh)
    v = v.reshape(*v.shape[:-1], heads, dh)
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    if causal_mask is not None:
        scores = jnp.where(causal_mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q_in.dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", probs, v,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    return _lin(out.reshape(*q_in.shape[:-1], d), p.o)


def encode(cfg: WhisperConfig, params: WhisperParams,
           mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, n_mels, 3000] -> encoder states [B, 1500, d]."""
    x = jnp.moveaxis(mel, -2, -1)                       # [B, T, mels]
    # conv1 k=3 s=1 p=1, gelu
    w1 = jnp.moveaxis(params.conv1.w, (0, 1, 2), (2, 1, 0))  # [3,mels,d]
    x = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC")) + params.conv1.b
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    # conv2 k=3 s=2 p=1, gelu
    w2 = jnp.moveaxis(params.conv2.w, (0, 1, 2), (2, 1, 0))
    x = jax.lax.conv_general_dilated(
        x, w2, window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC")) + params.conv2.b
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = x + params.enc_pos[None, :x.shape[1]]
    for blk in params.enc_blocks:
        h = _mha(_ln(x, blk.ln1), _ln(x, blk.ln1), blk.attn,
                 cfg.encoder_heads)
        x = x + h
        h = _lin(jax.nn.gelu(
            _lin(_ln(x, blk.ln2), blk.fc1).astype(jnp.float32),
            approximate=False).astype(x.dtype), blk.fc2)
        x = x + h
    return _ln(x, params.enc_ln)


def decoder_logits(cfg: WhisperConfig, params: WhisperParams,
                   tokens: jnp.ndarray,       # int32 [B, T]
                   enc: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced decoder -> logits [B, T, vocab] (parity tests +
    prompt scoring)."""
    b, t = tokens.shape
    x = params.dec_embed[tokens] + params.dec_pos[None, :t]
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    for blk in params.dec_blocks:
        h = _mha(_ln(x, blk.ln1), _ln(x, blk.ln1), blk.attn,
                 cfg.decoder_heads, causal_mask=mask)
        x = x + h
        h = _mha(_ln(x, blk.ln_cross), enc, blk.cross, cfg.decoder_heads)
        x = x + h
        h = _lin(jax.nn.gelu(
            _lin(_ln(x, blk.ln2), blk.fc1).astype(jnp.float32),
            approximate=False).astype(x.dtype), blk.fc2)
        x = x + h
    x = _ln(x, params.dec_ln)
    return jnp.dot(x, params.dec_embed.T,
                   preferred_element_type=jnp.float32)


# Compiled greedy-decode programs keyed by (model, n_forced, total,
# batch bucket) — the previous per-call jax.jit closure retraced on
# EVERY request.
_decode_fns: dict = {}


def _get_greedy_fn(cfg: WhisperConfig, n_forced: int, total: int):
    key = (id(cfg), n_forced, total)
    fn = _decode_fns.get(key)
    if fn is not None:
        return fn

    def step_all(params, buf_dev, enc, sup):
        def body(buf_dev, i):
            logits = decoder_logits(cfg, params, buf_dev, enc)
            row = logits[:, i - 1]                         # [B, V]
            row = jnp.where(sup[None, :], -jnp.inf, row)
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
            keep = i < n_forced
            cur = buf_dev[:, i]
            buf_dev = buf_dev.at[:, i].set(jnp.where(keep, cur, nxt))
            return buf_dev, None

        buf_dev, _ = jax.lax.scan(
            body, buf_dev, jnp.arange(n_forced, total))
        return buf_dev

    fn = jax.jit(step_all)
    _decode_fns[key] = fn
    return fn


def greedy_transcribe_tokens_batch(cfg: WhisperConfig,
                                   params: WhisperParams,
                                   mels: List[np.ndarray],
                                   max_new_tokens: int = 64
                                   ) -> List[List[int]]:
    """Greedy decode a BATCH of 30s windows -> per-window token ids
    (without the forced prefix), each truncated at EOT on the host.

    Shapes are static: the decoder re-scores the whole (padded) token
    buffer each step inside one lax.scan — O(T^2) but T <= 448 and the
    matmuls batch perfectly on the MXU. Batch is padded to a pow2
    bucket so concurrent requests (engine/asr.py micro-batcher) share
    one compiled program and one weight stream."""
    b = len(mels)
    b_pad = 1
    while b_pad < b:
        b_pad *= 2
    mel0 = np.asarray(mels[0])
    mel_arr = np.zeros((b_pad,) + mel0.shape, mel0.dtype)
    for i, m in enumerate(mels):
        mel_arr[i] = m
    enc = encode(cfg, params, jnp.asarray(mel_arr))        # [B, S, H]
    forced = [cfg.decoder_start_token_id] + [
        t for _i, t in sorted(cfg.forced_decoder_ids)]
    n_forced = len(forced)
    total = min(n_forced + max_new_tokens, cfg.max_target_positions)
    buf = np.full((b_pad, total), cfg.eos_token_id, np.int32)
    buf[:, :n_forced] = forced

    sup = np.zeros(cfg.vocab_size, bool)
    for t in cfg.suppress_tokens:
        if t < cfg.vocab_size:
            sup[t] = True

    fn = _get_greedy_fn(cfg, n_forced, total)
    out = np.asarray(fn(params, jnp.asarray(buf), enc, jnp.asarray(sup)))
    results: List[List[int]] = []
    for row in out[:b]:
        toks: List[int] = []
        for t in row[n_forced:]:
            if int(t) == cfg.eos_token_id:
                break
            toks.append(int(t))
        results.append(toks)
    return results


def greedy_transcribe_tokens(cfg: WhisperConfig, params: WhisperParams,
                             mel: np.ndarray,
                             max_new_tokens: int = 64) -> List[int]:
    """Greedy decode one 30s window (batch-of-one convenience)."""
    return greedy_transcribe_tokens_batch(
        cfg, params, [mel], max_new_tokens=max_new_tokens)[0]
