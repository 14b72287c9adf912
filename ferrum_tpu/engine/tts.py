"""TTS lane: text → waveform engine (modality executor analog).

TPU-native analog of the reference's TTS engine + executor
(crates/ferrum-engine/src/engines (tts, 159 LoC),
crates/ferrum-models/src/executor (tts executor, 1,852 LoC)): owns the
jitted talker/code-predictor/vocoder programs, maps voice names to
speaker rows, and renders 16-bit PCM WAV bytes for `/v1/audio/speech`
and the `tts` CLI (axum_server.rs:201, main.rs tts subcommand)."""

from __future__ import annotations

import io
import os
import struct
import threading
import wave
from typing import Optional

import numpy as np

from ..types import InvalidRequestError, ModelLoadError


def encode_wav(audio: np.ndarray, sample_rate: int) -> bytes:
    """f32 [-1, 1] mono waveform → 16-bit PCM WAV bytes."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class TtsEngine:
    def __init__(self, model_dir: str, dtype=None):
        import jax.numpy as jnp

        from ..models.tts import load_tts_dir
        self.model_dir = model_dir
        self.cfg, self.params = load_tts_dir(
            model_dir, dtype=dtype or jnp.float32)
        self.tokenizer = self._load_tokenizer(model_dir)
        self._lock = threading.Lock()

    @staticmethod
    def _load_tokenizer(model_dir: str):
        try:
            from tokenizers import Tokenizer
            p = os.path.join(model_dir, "tokenizer.json")
            if os.path.exists(p):
                return Tokenizer.from_file(p)
        except Exception:
            pass
        return None

    # -- API ---------------------------------------------------------------
    @property
    def voices(self):
        return list(self.cfg.talker.speakers)

    @property
    def sample_rate(self) -> int:
        return self.cfg.vocoder.sample_rate

    def _text_ids(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(text).ids
        else:
            # byte-level fallback: UTF-8 bytes as ids (mirrors the main
            # engine's byte tokenizer for tokenizer-less checkpoints)
            ids = list(text.encode("utf-8"))
        tv = self.cfg.talker.text_vocab
        return np.asarray([i for i in ids if i < tv], np.int32)

    def synthesize(self, text: str, voice: str = "default",
                   max_frames: Optional[int] = None) -> np.ndarray:
        """text → f32 waveform at cfg.vocoder.sample_rate."""
        import jax.numpy as jnp

        from ..models.tts import synthesize_codes, vocode
        if not text:
            raise InvalidRequestError("`input` must be non-empty",
                                      param="input")
        t = self.cfg.talker
        if voice not in t.speakers:
            raise InvalidRequestError(
                f"unknown voice {voice!r} (have {list(t.speakers)})",
                param="voice")
        spk = t.speakers.index(voice)
        mf = min(max_frames or t.max_frames, t.max_frames)
        ids = self._text_ids(text)
        with self._lock:
            codes = synthesize_codes(t, self.params.talker, ids, spk, mf)
            if codes.shape[0] == 0:
                return np.zeros(0, np.float32)
            wav = vocode(self.cfg.vocoder, self.params.vocoder,
                         jnp.asarray(codes))
        return np.asarray(wav, np.float32)

    def synthesize_wav(self, text: str, voice: str = "default",
                       max_frames: Optional[int] = None) -> bytes:
        return encode_wav(self.synthesize(text, voice, max_frames),
                          self.sample_rate)


def maybe_tts_engine(model_dir: str) -> Optional[TtsEngine]:
    """TtsEngine if the directory is a TTS checkpoint, else None."""
    import json
    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        d = json.load(f)
    archs = d.get("architectures") or []
    if not any("Tts" in a for a in archs):
        return None
    return TtsEngine(model_dir)
