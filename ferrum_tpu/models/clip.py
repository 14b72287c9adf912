"""CLIP — dual-tower text/image embedding model in JAX.

TPU-native analog of the reference's CLIP wrapper
(crates/ferrum-models/src/multimodal/clip.rs, which delegates to
candle's ClipModel): both towers are pure jnp functions jitted per
input bucket. Text tower: causal transformer, EOT-token pooling, text
projection. Vision tower: patch conv + class token + pre/post LN
encoder, class-token pooling, visual projection. Outputs are the
L2-normalized projection-space embeddings used for similarity.
Parity: tests/test_clip.py vs transformers' CLIPModel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ClipConfig:
    # text tower
    vocab_size: int = 49408
    text_hidden: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_intermediate: int = 2048
    max_position_embeddings: int = 77
    eos_token_id: int = 49407
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_hidden: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_intermediate: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf_dict(cls, d: dict) -> "ClipConfig":
        t = d["text_config"]
        v = d["vision_config"]
        return cls(
            vocab_size=t["vocab_size"], text_hidden=t["hidden_size"],
            text_layers=t["num_hidden_layers"],
            text_heads=t["num_attention_heads"],
            text_intermediate=t["intermediate_size"],
            max_position_embeddings=t.get("max_position_embeddings", 77),
            eos_token_id=t.get("eos_token_id", 49407),
            image_size=v["image_size"], patch_size=v["patch_size"],
            vision_hidden=v["hidden_size"],
            vision_layers=v["num_hidden_layers"],
            vision_heads=v["num_attention_heads"],
            vision_intermediate=v["intermediate_size"],
            projection_dim=d.get("projection_dim", 512),
            layer_norm_eps=float(t.get("layer_norm_eps", 1e-5)))


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "b"], meta_fields=[])
@dataclass
class CAff:
    w: jnp.ndarray
    b: Optional[jnp.ndarray]


@partial(jax.tree_util.register_dataclass,
         data_fields=["ln1", "q", "k", "v", "o", "ln2", "fc1", "fc2"],
         meta_fields=[])
@dataclass
class ClipBlock:
    ln1: CAff
    q: CAff
    k: CAff
    v: CAff
    o: CAff
    ln2: CAff
    fc1: CAff
    fc2: CAff


@partial(jax.tree_util.register_dataclass,
         data_fields=["tok_emb", "pos_emb", "blocks", "final_ln", "proj"],
         meta_fields=[])
@dataclass
class TextTower:
    tok_emb: jnp.ndarray
    pos_emb: jnp.ndarray
    blocks: List[ClipBlock]
    final_ln: CAff
    proj: jnp.ndarray            # [hidden, proj_dim]


@partial(jax.tree_util.register_dataclass,
         data_fields=["patch_w", "cls_emb", "pos_emb", "pre_ln",
                      "blocks", "post_ln", "proj"],
         meta_fields=[])
@dataclass
class VisionTower:
    patch_w: jnp.ndarray         # [hidden, 3, P, P] conv kernel
    cls_emb: jnp.ndarray
    pos_emb: jnp.ndarray
    pre_ln: CAff
    blocks: List[ClipBlock]
    post_ln: CAff
    proj: jnp.ndarray


@partial(jax.tree_util.register_dataclass,
         data_fields=["text", "vision", "logit_scale"], meta_fields=[])
@dataclass
class ClipParams:
    text: TextTower
    vision: VisionTower
    logit_scale: jnp.ndarray


def params_from_hf_sd(cfg: ClipConfig, sd: Dict[str, np.ndarray],
                      dtype=jnp.float32) -> ClipParams:
    def aff(prefix, transpose=True):
        w = sd[f"{prefix}.weight"]
        if transpose and w.ndim == 2:
            w = w.T
        b = sd.get(f"{prefix}.bias")
        return CAff(jnp.asarray(w, dtype=dtype),
                    None if b is None else jnp.asarray(b, dtype=dtype))

    def block(prefix):
        return ClipBlock(
            ln1=aff(f"{prefix}.layer_norm1", transpose=False),
            q=aff(f"{prefix}.self_attn.q_proj"),
            k=aff(f"{prefix}.self_attn.k_proj"),
            v=aff(f"{prefix}.self_attn.v_proj"),
            o=aff(f"{prefix}.self_attn.out_proj"),
            ln2=aff(f"{prefix}.layer_norm2", transpose=False),
            fc1=aff(f"{prefix}.mlp.fc1"),
            fc2=aff(f"{prefix}.mlp.fc2"))

    tm = "text_model"
    vm = "vision_model"
    text = TextTower(
        tok_emb=jnp.asarray(
            sd[f"{tm}.embeddings.token_embedding.weight"], dtype=dtype),
        pos_emb=jnp.asarray(
            sd[f"{tm}.embeddings.position_embedding.weight"], dtype=dtype),
        blocks=[block(f"{tm}.encoder.layers.{i}")
                for i in range(cfg.text_layers)],
        final_ln=aff(f"{tm}.final_layer_norm", transpose=False),
        proj=jnp.asarray(sd["text_projection.weight"].T, dtype=dtype))
    vision = VisionTower(
        patch_w=jnp.asarray(
            sd[f"{vm}.embeddings.patch_embedding.weight"], dtype=dtype),
        cls_emb=jnp.asarray(
            sd[f"{vm}.embeddings.class_embedding"], dtype=dtype),
        pos_emb=jnp.asarray(
            sd[f"{vm}.embeddings.position_embedding.weight"], dtype=dtype),
        pre_ln=aff(f"{vm}.pre_layrnorm", transpose=False),
        blocks=[block(f"{vm}.encoder.layers.{i}")
                for i in range(cfg.vision_layers)],
        post_ln=aff(f"{vm}.post_layernorm", transpose=False),
        proj=jnp.asarray(sd["visual_projection.weight"].T, dtype=dtype))
    return ClipParams(
        text=text, vision=vision,
        logit_scale=jnp.asarray(sd.get("logit_scale", np.float32(0.0)),
                                jnp.float32))


def _ln(x, p: CAff, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p.w.astype(jnp.float32)
            + p.b.astype(jnp.float32)).astype(x.dtype)


def _lin(x, p: CAff):
    y = jnp.dot(x, p.w, preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p.b if p.b is not None else y


def _quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _encoder(blocks, x, heads, eps, causal):
    b, t, d = x.shape
    dh = d // heads
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    for blk in blocks:
        h = _ln(x, blk.ln1, eps)
        q = _lin(h, blk.q).reshape(b, t, heads, dh) * (dh ** -0.5)
        k = _lin(h, blk.k).reshape(b, t, heads, dh)
        v = _lin(h, blk.v).reshape(b, t, heads, dh)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        if mask is not None:
            sc = jnp.where(mask, sc, -jnp.inf)
        pr = jax.nn.softmax(sc, axis=-1).astype(x.dtype)
        at = jnp.einsum("bhqk,bkhd->bqhd", pr, v,
                        preferred_element_type=jnp.float32
                        ).astype(x.dtype).reshape(b, t, d)
        x = x + _lin(at, blk.o)
        h = _ln(x, blk.ln2, eps)
        x = x + _lin(_quick_gelu(_lin(h, blk.fc1)), blk.fc2)
    return x


def encode_text(cfg: ClipConfig, params: ClipParams,
                tokens: jnp.ndarray) -> jnp.ndarray:
    """int32 [B, T] (padded with EOT after the EOT token) -> L2-normed
    text embeddings [B, proj_dim]."""
    t = params.text
    b, tl = tokens.shape
    x = t.tok_emb[tokens] + t.pos_emb[None, :tl]
    x = _encoder(t.blocks, x, cfg.text_heads, cfg.layer_norm_eps,
                 causal=True)
    x = _ln(x, t.final_ln, cfg.layer_norm_eps)
    # Pool at the FIRST EOT position (HF: argmax over token==eos).
    eot = jnp.argmax((tokens == cfg.eos_token_id).astype(jnp.int32),
                     axis=1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    emb = jnp.dot(pooled, t.proj, preferred_element_type=jnp.float32)
    return emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


def encode_image(cfg: ClipConfig, params: ClipParams,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """f32 [B, 3, H, W] (CLIP-normalized) -> L2-normed image embeddings
    [B, proj_dim]."""
    v = params.vision
    b = pixels.shape[0]
    x = jax.lax.conv_general_dilated(
        pixels, jnp.moveaxis(v.patch_w, (0, 1), (3, 2)),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID", dimension_numbers=("NCHW", "HWIO", "NHWC"))
    x = x.reshape(b, -1, cfg.vision_hidden)         # [B, P*P, D]
    cls = jnp.broadcast_to(v.cls_emb[None, None],
                           (b, 1, cfg.vision_hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v.pos_emb[None, :x.shape[1]]
    x = _ln(x, v.pre_ln, cfg.layer_norm_eps)
    x = _encoder(v.blocks, x, cfg.vision_heads, cfg.layer_norm_eps,
                 causal=False)
    pooled = _ln(x[:, 0], v.post_ln, cfg.layer_norm_eps)
    emb = jnp.dot(pooled, v.proj, preferred_element_type=jnp.float32)
    return emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(img, image_size: int) -> np.ndarray:
    """PIL image -> CLIP-normalized f32 [3, S, S] (resize shorter side +
    center crop, matching CLIPImageProcessor defaults)."""
    from PIL import Image
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(image_size, int(round(w * scale))),
                      max(image_size, int(round(h * scale)))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    arr = (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return np.moveaxis(arr, 2, 0)


def load_clip_dir(model_dir: str, dtype=jnp.float32):
    import json
    import os

    from .loader import TensorSource
    with open(os.path.join(model_dir, "config.json")) as f:
        d = json.load(f)
    cfg = ClipConfig.from_hf_dict(d)
    src = TensorSource.from_dir(model_dir)
    sd = {k: src.get(k) for k in src.keys()}
    return cfg, params_from_hf_sd(cfg, sd, dtype=dtype)
