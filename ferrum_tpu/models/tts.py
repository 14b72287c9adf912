"""Text-to-speech: talker (codec-token LM) + code predictor + vocoder.

TPU-native analog of the reference's Qwen3-TTS stack:
- talker — Qwen3-style backbone generating speech-codec tokens from a
  projected text prefix (+ speaker token), one frame per step
  (crates/ferrum-models/src/multimodal/qwen3_tts.rs,
  qwen3_tts_backbone.rs: 20-layer/1024-hidden backbone, text projection
  2048→1024, codec bos/eos control tokens);
- code predictor — per-frame sub-decoder producing the remaining
  codebook groups conditioned on the talker hidden state
  (qwen3_tts.rs "SubTalker code predictor (31 codebooks)");
- vocoder — RVQ decode (sum of per-quantizer codebook embeddings) →
  causal conv → transformer → ConvTranspose upsampling → waveform
  (qwen3_tts_vocoder.rs: "SplitRVQ decode → CausalConv → Transformer →
  Upsampling → Waveform @ 24kHz").

Redesign, not a translation: the reference hand-rolls candle tensor ops
per backend; here the frame loop is ONE `lax.scan` over a static token
buffer (the Whisper-lane decode pattern — no per-frame dispatch), the
code predictor runs as a short inner scan over the group axis, and the
vocoder is one jitted program; XLA fuses the conv/attention stacks.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ModelLoadError


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------

@dataclass
class TtsTalkerConfig:
    codec_vocab: int = 3072            # codec token vocabulary
    hidden_size: int = 1024
    num_layers: int = 20
    num_heads: int = 16
    ffn_size: int = 2816
    text_vocab: int = 151936
    text_hidden: int = 2048
    num_code_groups: int = 32
    codec_bos_id: int = 3070
    codec_eos_id: int = 3071
    max_text_len: int = 256
    max_frames: int = 512
    rms_norm_eps: float = 1e-6
    speakers: Tuple[str, ...] = ("default",)

    @classmethod
    def from_dict(cls, d: dict) -> "TtsTalkerConfig":
        kw = {k: d[k] for k in cls.__dataclass_fields__ if k in d}
        if "speakers" in kw:
            kw["speakers"] = tuple(kw["speakers"])
        return cls(**kw)


@dataclass
class TtsVocoderConfig:
    codebook_size: int = 2048
    num_quantizers: int = 32           # == talker num_code_groups
    latent_dim: int = 1024
    hidden_size: int = 512
    num_layers: int = 8
    num_heads: int = 16
    ffn_size: int = 1024
    decoder_dim: int = 1536
    upsample_rates: Tuple[int, ...] = (8, 5, 4, 3, 2, 2)   # prod = 1920
    sample_rate: int = 24000
    rms_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "TtsVocoderConfig":
        kw = {k: d[k] for k in cls.__dataclass_fields__ if k in d}
        if "upsample_rates" in kw:
            kw["upsample_rates"] = tuple(kw["upsample_rates"])
        return cls(**kw)

    @property
    def total_upsample(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r


@dataclass
class TtsConfig:
    talker: TtsTalkerConfig = field(default_factory=TtsTalkerConfig)
    vocoder: TtsVocoderConfig = field(default_factory=TtsVocoderConfig)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "TtsConfig":
        return cls(
            talker=TtsTalkerConfig.from_dict(d.get("talker_config", {})),
            vocoder=TtsVocoderConfig.from_dict(d.get("vocoder_config", {})))


# ---------------------------------------------------------------------------
# Params (pytrees)
# ---------------------------------------------------------------------------

def _reg(fields):
    return partial(jax.tree_util.register_dataclass, data_fields=fields,
                   meta_fields=[])


@_reg(["wq", "wk", "wv", "wo", "ln1", "w_gate", "w_up", "w_down", "ln2"])
@dataclass
class TtsBlockP:
    wq: jnp.ndarray
    wk: jnp.ndarray
    wv: jnp.ndarray
    wo: jnp.ndarray
    ln1: jnp.ndarray                  # rms weight
    w_gate: jnp.ndarray
    w_up: jnp.ndarray
    w_down: jnp.ndarray
    ln2: jnp.ndarray


@_reg(["text_embed", "text_proj", "spk_embed", "code_embed", "pos",
       "blocks", "ln_f", "head", "cp_in", "cp_embed", "cp_blocks",
       "cp_ln_f", "cp_head"])
@dataclass
class TtsTalkerParams:
    text_embed: jnp.ndarray           # [text_vocab, text_hidden]
    text_proj: jnp.ndarray            # [text_hidden, hidden]
    spk_embed: jnp.ndarray            # [n_speakers, hidden]
    code_embed: jnp.ndarray           # [G, codec_vocab, hidden]
    pos: jnp.ndarray                  # [max_pos, hidden]
    blocks: List[TtsBlockP]
    ln_f: jnp.ndarray
    head: jnp.ndarray                 # [hidden, codec_vocab] (group 0)
    # code predictor (SubTalker): tiny causal transformer over groups
    cp_in: jnp.ndarray                # [hidden, hidden] hidden→cp cond
    cp_embed: jnp.ndarray             # [G, codec_vocab, hidden] reuse dims
    cp_blocks: List[TtsBlockP]
    cp_ln_f: jnp.ndarray
    cp_head: jnp.ndarray              # [G-1, hidden, codec_vocab]


@_reg(["vq_embed", "conv_in_w", "conv_in_b", "proj_in", "pos", "blocks",
       "ln_f", "proj_out", "up_ws", "up_bs", "conv_out_w", "conv_out_b"])
@dataclass
class TtsVocoderParams:
    vq_embed: jnp.ndarray             # [Q, codebook, latent]
    conv_in_w: jnp.ndarray            # [k, latent, hidden] (causal)
    conv_in_b: jnp.ndarray
    proj_in: jnp.ndarray              # identity-size [hidden, hidden]
    pos: jnp.ndarray                  # [max_frames, hidden]
    blocks: List[TtsBlockP]
    ln_f: jnp.ndarray
    proj_out: jnp.ndarray             # [hidden, decoder_dim]
    up_ws: List[jnp.ndarray]          # per rate r: [2r, C_in, C_out]
    up_bs: List[jnp.ndarray]
    conv_out_w: jnp.ndarray           # [7, C_last, 1]
    conv_out_b: jnp.ndarray


@_reg(["talker", "vocoder"])
@dataclass
class TtsParams:
    talker: TtsTalkerParams
    vocoder: TtsVocoderParams


def init_random_tts_params(cfg: TtsConfig, seed: int = 0,
                           dtype=jnp.float32) -> TtsParams:
    """Architecture-true random init (tests / benches / demo lanes)."""
    t, v = cfg.talker, cfg.vocoder
    rng = np.random.default_rng(seed)

    def nrm(*shape, s=0.02):
        return jnp.asarray(rng.normal(0, s, shape), dtype)

    def block(h, ffn):
        return TtsBlockP(
            wq=nrm(h, h), wk=nrm(h, h), wv=nrm(h, h), wo=nrm(h, h),
            ln1=jnp.ones(h, dtype), w_gate=nrm(h, ffn), w_up=nrm(h, ffn),
            w_down=nrm(ffn, h), ln2=jnp.ones(h, dtype))

    h = t.hidden_size
    g = t.num_code_groups
    max_pos = t.max_text_len + t.max_frames + 2
    talker = TtsTalkerParams(
        text_embed=nrm(t.text_vocab, t.text_hidden),
        text_proj=nrm(t.text_hidden, h),
        # larger scale: speaker conditioning must be able to steer the
        # argmax'd codec decisions even at random init (test gate)
        spk_embed=nrm(len(t.speakers), h, s=0.5),
        code_embed=nrm(g, t.codec_vocab, h),
        pos=nrm(max_pos, h),
        blocks=[block(h, t.ffn_size) for _ in range(t.num_layers)],
        ln_f=jnp.ones(h, dtype),
        head=nrm(h, t.codec_vocab),
        cp_in=nrm(h, h),
        cp_embed=nrm(g, t.codec_vocab, h),
        cp_blocks=[block(h, t.ffn_size) for _ in range(2)],
        cp_ln_f=jnp.ones(h, dtype),
        cp_head=nrm(max(g - 1, 1), h, t.codec_vocab),
    )
    vh = v.hidden_size
    ch = [v.decoder_dim]
    for _ in v.upsample_rates:
        ch.append(max(ch[-1] // 2, 8))
    vocoder = TtsVocoderParams(
        vq_embed=nrm(v.num_quantizers, v.codebook_size, v.latent_dim),
        conv_in_w=nrm(3, v.latent_dim, vh),
        conv_in_b=jnp.zeros(vh, dtype),
        proj_in=nrm(vh, vh),
        pos=nrm(t.max_frames, vh),
        blocks=[block(vh, v.ffn_size) for _ in range(v.num_layers)],
        ln_f=jnp.ones(vh, dtype),
        proj_out=nrm(vh, v.decoder_dim),
        up_ws=[nrm(2 * r, ch[i], ch[i + 1])
               for i, r in enumerate(v.upsample_rates)],
        up_bs=[jnp.zeros(ch[i + 1], dtype)
               for i in range(len(v.upsample_rates))],
        conv_out_w=nrm(7, ch[-1], 1),
        conv_out_b=jnp.zeros(1, dtype),
    )
    return TtsParams(talker=talker, vocoder=vocoder)


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _block_fwd(x, p: TtsBlockP, heads: int, eps: float, mask):
    """Pre-RMSNorm MHA + SwiGLU block (Qwen3-backbone shape)."""
    n, d = x.shape[-2], x.shape[-1]
    dh = d // heads
    xin = _rms(x, p.ln1, eps)
    q = jnp.dot(xin, p.wq).reshape(*xin.shape[:-1], heads, dh) * dh ** -0.5
    k = jnp.dot(xin, p.wk).reshape(*xin.shape[:-1], heads, dh)
    v = jnp.dot(xin, p.wv).reshape(*xin.shape[:-1], heads, dh)
    s = jnp.einsum("...qhd,...khd->...hqk", q, k,
                   preferred_element_type=jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("...hqk,...khd->...qhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + jnp.dot(o.reshape(*x.shape[:-1], d), p.wo)
    xin = _rms(x, p.ln2, eps)
    gate = jax.nn.silu(jnp.dot(xin, p.w_gate).astype(jnp.float32))
    x = x + jnp.dot((gate * jnp.dot(xin, p.w_up)).astype(x.dtype), p.w_down)
    return x


def talker_hidden(cfg: TtsTalkerConfig, p: TtsTalkerParams,
                  seq: jnp.ndarray) -> jnp.ndarray:
    """Full-buffer causal forward: seq [T, hidden] → hidden [T, hidden]."""
    t = seq.shape[0]
    mask = jnp.tril(jnp.ones((t, t), bool))[None]
    x = seq
    for blk in p.blocks:
        x = _block_fwd(x, blk, cfg.num_heads, cfg.rms_norm_eps, mask)
    return _rms(x, p.ln_f, cfg.rms_norm_eps)


def predict_groups(cfg: TtsTalkerConfig, p: TtsTalkerParams,
                   h_frame: jnp.ndarray, code0: jnp.ndarray) -> jnp.ndarray:
    """Code predictor: greedy-decode groups 1..G-1 for one frame.

    Inner lax.scan over the group axis: step g attends over
    [cond, c0_emb, ..., c_{g}_emb] (static buffer, causal). Returns
    codes [G] including group 0. ref: qwen3_tts.rs SubTalker."""
    g_total = cfg.num_code_groups
    if g_total == 1:
        return code0[None]
    buf = jnp.zeros((g_total + 1, p.cp_in.shape[1]), h_frame.dtype)
    buf = buf.at[0].set(jnp.dot(h_frame, p.cp_in))
    buf = buf.at[1].set(p.cp_embed[0, code0])
    codes0 = jnp.zeros(g_total, jnp.int32).at[0].set(code0)

    def body(carry, gi):
        buf, codes = carry
        x = buf
        tmask = (jnp.arange(g_total + 1) <= gi)[None, None, :]
        for blk in p.cp_blocks:
            x = _block_fwd(x[None], blk, cfg.num_heads, cfg.rms_norm_eps,
                           tmask)[0]
        h = _rms(x, p.cp_ln_f, cfg.rms_norm_eps)[gi]
        logits = jnp.dot(h, p.cp_head[gi - 1],
                         preferred_element_type=jnp.float32)
        c = jnp.argmax(logits).astype(jnp.int32)
        codes = codes.at[gi].set(c)
        buf = buf.at[gi + 1].set(p.cp_embed[jnp.minimum(gi, g_total - 1), c])
        return (buf, codes), None

    (_, codes), _ = jax.lax.scan(
        body, (buf, codes0), jnp.arange(1, g_total, dtype=jnp.int32))
    return codes


def synthesize_codes(cfg: TtsTalkerConfig, p: TtsTalkerParams,
                     text_ids: np.ndarray, speaker_id: int,
                     max_frames: int) -> np.ndarray:
    """Greedy frame generation → codes [T, G] (host-truncated at eos).

    One jitted lax.scan over frames; every step rescans the static
    buffer (the Whisper-lane pattern — static shapes, no per-frame
    dispatch; a KV-cached variant is the later optimization)."""
    tl = min(len(text_ids), cfg.max_text_len)
    text_ids = np.asarray(text_ids[:tl], np.int32)
    n_prefix = tl + 1                     # + speaker token
    total = n_prefix + max_frames
    g = cfg.num_code_groups

    text_h = jnp.dot(p.text_embed[jnp.asarray(text_ids)], p.text_proj)
    spk = p.spk_embed[speaker_id]
    prefix = jnp.concatenate([text_h, spk[None]], 0)

    @jax.jit
    def run():
        seq = jnp.zeros((total, cfg.hidden_size), prefix.dtype)
        seq = seq.at[:n_prefix].set(prefix)
        # global speaker conditioning: the speaker vector rides every
        # frame input row (not only the prefix token) — the AR decisions
        # stay speaker-sensitive at any model scale
        seq = seq.at[n_prefix:].add(spk[None])
        seq = seq + p.pos[:total]
        # frame 0 input rides the bos code embedding
        bos = jnp.sum(p.code_embed[:, cfg.codec_bos_id], axis=0)
        seq = seq.at[n_prefix].add(bos)

        def body(carry, i):
            seq, _ = carry
            h = talker_hidden(cfg, p, seq)
            hrow = h[n_prefix + i]
            logits = jnp.dot(hrow, p.head,
                             preferred_element_type=jnp.float32)
            c0 = jnp.argmax(logits).astype(jnp.int32)
            codes = predict_groups(cfg, p, hrow, c0)
            # next frame input = sum of this frame's code embeddings
            emb = jnp.sum(jax.vmap(lambda ce, c: ce[c])(
                p.code_embed, codes), axis=0)
            nxt = n_prefix + i + 1
            seq = jax.lax.cond(
                nxt < total,
                lambda s: s.at[jnp.minimum(nxt, total - 1)].add(emb),
                lambda s: s, seq)
            return (seq, codes), codes

        (_, _), all_codes = jax.lax.scan(
            body, (seq, jnp.zeros(g, jnp.int32)),
            jnp.arange(max_frames, dtype=jnp.int32))
        return all_codes                                   # [T, G]

    codes = np.asarray(run())
    out: List[np.ndarray] = []
    for row in codes:
        if int(row[0]) == cfg.codec_eos_id:
            break
        out.append(row)
    if not out:
        return np.zeros((0, g), np.int32)
    return np.stack(out)


def _conv1d(x, w, b, padding):
    """x [T, Cin], w [K, Cin, Cout] → [T', Cout]."""
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=(padding,),
        dimension_numbers=("NWC", "WIO", "NWC"))[0]
    return y + b


def vocode(cfg: TtsVocoderConfig, p: TtsVocoderParams,
           codes: jnp.ndarray) -> jnp.ndarray:
    """codes int32 [T, Q] → waveform f32 [T * total_upsample].

    RVQ decode → causal conv → transformer → ConvTranspose stack →
    tanh. ref: qwen3_tts_vocoder.rs."""
    t = codes.shape[0]
    # RVQ decode: sum the per-quantizer codebook rows
    lat = jnp.sum(jax.vmap(lambda e, c: e[c], in_axes=(0, 1))(
        p.vq_embed, codes), axis=0)                         # [T, latent]
    # causal conv k=3 (left pad 2)
    x = _conv1d(lat, p.conv_in_w, p.conv_in_b, (2, 0))
    x = jax.nn.gelu(x.astype(jnp.float32)).astype(lat.dtype)
    x = jnp.dot(x, p.proj_in) + p.pos[:t]
    mask = jnp.tril(jnp.ones((t, t), bool))[None]
    for blk in p.blocks:
        x = _block_fwd(x, blk, cfg.num_heads, cfg.rms_norm_eps, mask)
    x = _rms(x, p.ln_f, cfg.rms_norm_eps)
    x = jnp.dot(x, p.proj_out)                              # [T, dec]
    for r, w, b in zip(cfg.upsample_rates, p.up_ws, p.up_bs):
        # ConvTranspose1d(kernel 2r, stride r): length exactly ×r.
        # jax.lax.conv_transpose applies `padding` to the r-dilated
        # input, so out = in*r - 3r + 2 + pad_lo + pad_hi; pad sums to
        # 3r - 2 for out == in*r.
        lo = (3 * r - 2) // 2
        y = jax.lax.conv_transpose(
            x[None], w, strides=(r,), padding=((lo, 3 * r - 2 - lo),),
            dimension_numbers=("NWC", "WIO", "NWC"))[0]
        y = y + b
        x = jax.nn.gelu(y.astype(jnp.float32)).astype(y.dtype)
    wav = _conv1d(x, p.conv_out_w, p.conv_out_b, (3, 3))[:, 0]
    return jnp.tanh(wav.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Checkpoint IO (canonical safetensors naming — this framework's format)
# ---------------------------------------------------------------------------

def _flatten(params: TtsParams) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}

    def put(prefix, obj):
        if isinstance(obj, TtsBlockP):
            for f in ("wq", "wk", "wv", "wo", "ln1", "w_gate", "w_up",
                      "w_down", "ln2"):
                flat[f"{prefix}.{f}"] = np.asarray(getattr(obj, f))
        elif isinstance(obj, list):
            for i, o in enumerate(obj):
                put(f"{prefix}.{i}", o)
        else:
            flat[prefix] = np.asarray(obj)

    for side in ("talker", "vocoder"):
        sp = getattr(params, side)
        for f in sp.__dataclass_fields__:
            put(f"{side}.{f}", getattr(sp, f))
    return flat


def save_tts_dir(cfg: TtsConfig, params: TtsParams, out_dir: str) -> None:
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    d = {
        "architectures": ["FerrumTtsModel"],
        "talker_config": {k: (list(v) if isinstance(v, tuple) else v)
                          for k, v in cfg.talker.__dict__.items()},
        "vocoder_config": {k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in cfg.vocoder.__dict__.items()},
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    save_file(_flatten(params), os.path.join(out_dir, "model.safetensors"))


def load_tts_dir(model_dir: str, dtype=jnp.float32
                 ) -> Tuple[TtsConfig, TtsParams]:
    from safetensors import safe_open
    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise ModelLoadError(f"no config.json under {model_dir}")
    with open(cfg_path) as f:
        cfg = TtsConfig.from_hf_dict(json.load(f))
    sd: Dict[str, np.ndarray] = {}
    with safe_open(os.path.join(model_dir, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)

    def get(name):
        if name not in sd:
            raise ModelLoadError(f"missing tensor {name}")
        return jnp.asarray(sd[name], dtype)

    def block(prefix):
        return TtsBlockP(**{f: get(f"{prefix}.{f}")
                            for f in ("wq", "wk", "wv", "wo", "ln1",
                                      "w_gate", "w_up", "w_down", "ln2")})

    def blocks(prefix):
        out = []
        i = 0
        while f"{prefix}.{i}.wq" in sd:
            out.append(block(f"{prefix}.{i}"))
            i += 1
        return out

    talker = TtsTalkerParams(
        text_embed=get("talker.text_embed"),
        text_proj=get("talker.text_proj"),
        spk_embed=get("talker.spk_embed"),
        code_embed=get("talker.code_embed"),
        pos=get("talker.pos"),
        blocks=blocks("talker.blocks"),
        ln_f=get("talker.ln_f"), head=get("talker.head"),
        cp_in=get("talker.cp_in"), cp_embed=get("talker.cp_embed"),
        cp_blocks=blocks("talker.cp_blocks"),
        cp_ln_f=get("talker.cp_ln_f"), cp_head=get("talker.cp_head"))
    n_up = len(cfg.vocoder.upsample_rates)
    vocoder = TtsVocoderParams(
        vq_embed=get("vocoder.vq_embed"),
        conv_in_w=get("vocoder.conv_in_w"),
        conv_in_b=get("vocoder.conv_in_b"),
        proj_in=get("vocoder.proj_in"), pos=get("vocoder.pos"),
        blocks=blocks("vocoder.blocks"),
        ln_f=get("vocoder.ln_f"), proj_out=get("vocoder.proj_out"),
        up_ws=[get(f"vocoder.up_ws.{i}") for i in range(n_up)],
        up_bs=[get(f"vocoder.up_bs.{i}") for i in range(n_up)],
        conv_out_w=get("vocoder.conv_out_w"),
        conv_out_b=get("vocoder.conv_out_b"))
    return cfg, TtsParams(talker=talker, vocoder=vocoder)
