"""Embedding engine: mean-pooled, L2-normalized text embeddings.

TPU-native analog of the reference's embedding modality lane
(crates/ferrum-engine/src/modality_engines embedding wrapper + BERT
executor): wraps a loaded decoder model as an embedder (last-hidden-
state mean pooling over real tokens) behind the same bucketed-compile
discipline as the serving engine. A dedicated encoder family (BERT)
plugs into the same interface.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.llama_family import ModelParams, encode_forward
from ..tokenizer import FerrumTokenizer


class EmbeddingEngine:
    def __init__(self, model_cfg: ModelConfig, params: ModelParams,
                 tokenizer: FerrumTokenizer, max_len: int = 512):
        self.model_cfg = model_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._fns: Dict[int, "jax.stages.Wrapped"] = {}

    def _fn(self, t_pad: int):
        fn = self._fns.get(t_pad)
        if fn is None:
            mc = self.model_cfg

            def run(params, tokens, t_real):
                h = encode_forward(params, mc, tokens, t_real)
                # mean over real tokens, L2 normalize (f32)
                mask = (jnp.arange(t_pad) < t_real)[:, None]
                hf = h.astype(jnp.float32) * mask
                pooled = hf.sum(axis=0) / jnp.maximum(t_real, 1)
                return pooled / jnp.maximum(
                    jnp.linalg.norm(pooled), 1e-9)

            fn = jax.jit(run)
            self._fns[t_pad] = fn
        return fn

    def embed(self, texts: List[str]) -> Tuple[np.ndarray, int]:
        """Returns (embeddings [N, H] f32, total_tokens)."""
        out = []
        total = 0
        for text in texts:
            ids = self.tokenizer.encode(text)[: self.max_len]
            total += len(ids)
            t = len(ids)
            t_pad = max(16, 1 << (t - 1).bit_length())
            toks = np.zeros(t_pad, np.int32)
            toks[:t] = ids
            vec = self._fn(t_pad)(self.params, jnp.asarray(toks),
                                  jnp.asarray(t, jnp.int32))
            out.append(np.asarray(vec))
        return np.stack(out), total


class ClipEmbeddingEngine:
    """CLIP dual-tower embedder (ref: multimodal/clip.rs +
    ClipExecutor): text via the causal text tower (EOT pooling), images
    via the ViT tower; both land in the shared projection space,
    L2-normalized. Accepts {"image": <base64>} items alongside strings
    through the same embed() interface."""

    def __init__(self, model_dir: str):
        from ..models.clip import load_clip_dir
        self.cfg, self.params = load_clip_dir(model_dir)
        self.tokenizer = self._load_tokenizer(model_dir)
        self._text_fns: Dict[int, "jax.stages.Wrapped"] = {}
        self._img_fn = None

    @staticmethod
    def _load_tokenizer(model_dir: str):
        import os

        from tokenizers import Tokenizer
        p = os.path.join(model_dir, "tokenizer.json")
        return Tokenizer.from_file(p) if os.path.exists(p) else None

    def _text_fn(self, t_pad: int):
        fn = self._text_fns.get(t_pad)
        if fn is None:
            from ..models.clip import encode_text
            fn = jax.jit(lambda p, t: encode_text(self.cfg, p, t))
            self._text_fns[t_pad] = fn
        return fn

    def embed(self, items) -> Tuple[np.ndarray, int]:
        """items: list of str (text) or {"image": base64/bytes}."""
        import base64
        import io

        from ..models.clip import encode_image, preprocess_image
        out = []
        total = 0
        for it in items:
            if isinstance(it, dict) and "image" in it:
                from PIL import Image
                raw = it["image"]
                if isinstance(raw, str):
                    raw = base64.b64decode(raw)
                img = Image.open(io.BytesIO(raw))
                px = preprocess_image(img, self.cfg.image_size)
                if self._img_fn is None:
                    self._img_fn = jax.jit(
                        lambda p, x: encode_image(self.cfg, p, x))
                vec = self._img_fn(self.params, jnp.asarray(px[None]))
                out.append(np.asarray(vec)[0])
                total += 1
                continue
            if self.tokenizer is None:
                from ..types import ModelLoadError
                raise ModelLoadError(
                    "CLIP text embedding needs tokenizer.json")
            ids = self.tokenizer.encode(it).ids[
                : self.cfg.max_position_embeddings]
            total += len(ids)
            t_pad = max(8, 1 << (len(ids) - 1).bit_length())
            t_pad = min(t_pad, self.cfg.max_position_embeddings)
            toks = np.full((1, t_pad), self.cfg.eos_token_id, np.int32)
            toks[0, :len(ids)] = ids
            vec = self._text_fn(t_pad)(self.params, jnp.asarray(toks))
            out.append(np.asarray(vec)[0])
        return np.stack(out), total


class BertEmbeddingEngine:
    """Encoder-family embedder (ref: multimodal/bert.rs + BertExecutor):
    mean-pooled, L2-normalized BERT last-hidden-state. Same `embed`
    interface as EmbeddingEngine, so it drops into /v1/embeddings."""

    def __init__(self, model_dir: str, max_len: int = 512):
        from ..models.bert import load_bert_dir
        self.cfg, self.params = load_bert_dir(model_dir)
        self.tokenizer = self._load_tokenizer(model_dir)
        self.max_len = min(max_len, self.cfg.max_position_embeddings)
        self._fns: Dict[int, "jax.stages.Wrapped"] = {}

    @staticmethod
    def _load_tokenizer(model_dir: str):
        import os

        from tokenizers import Tokenizer
        p = os.path.join(model_dir, "tokenizer.json")
        if not os.path.exists(p):
            from ..types import ModelLoadError
            raise ModelLoadError(
                f"BERT embeddings need {p} (wordpiece tokenizer)")
        return Tokenizer.from_file(p)

    def _fn(self, t_pad: int):
        fn = self._fns.get(t_pad)
        if fn is None:
            from ..models.bert import bert_encode
            cfg = self.cfg

            def run(params, tokens, mask):
                h = bert_encode(cfg, params, tokens, mask)
                hf = h.astype(jnp.float32) * mask[:, :, None]
                n = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
                pooled = hf.sum(axis=1) / n
                return pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

            fn = jax.jit(run)
            self._fns[t_pad] = fn
        return fn

    def embed(self, texts: List[str]) -> Tuple[np.ndarray, int]:
        out = []
        total = 0
        for text in texts:
            enc = self.tokenizer.encode(text)
            ids = enc.ids[: self.max_len]
            total += len(ids)
            t = len(ids)
            t_pad = max(16, 1 << (t - 1).bit_length())
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :t] = ids
            mask = np.zeros((1, t_pad), bool)
            mask[0, :t] = True
            vec = self._fn(t_pad)(self.params, jnp.asarray(toks),
                                  jnp.asarray(mask))
            out.append(np.asarray(vec)[0])
        return np.stack(out), total
