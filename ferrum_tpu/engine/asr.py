"""ASR lane: Whisper transcription engine (modality executor analog).

TPU-native analog of the reference's WhisperExecutor
(crates/ferrum-models/src/executor/whisper_executor.rs): owns the
jitted encoder + greedy-decode programs, chunks long audio into 30 s
windows, and decodes token ids to text with the checkpoint's tokenizer
when present (ids are returned either way)."""

from __future__ import annotations

import os
import threading
from typing import List, Optional

import numpy as np

from ..ops.audio import CHUNK_SAMPLES, decode_wav, log_mel_spectrogram
from ..types import ModelLoadError


class AsrEngine:
    def __init__(self, model_dir: str, dtype=None):
        import jax.numpy as jnp

        from ..models.whisper import load_whisper_dir
        self.model_dir = model_dir
        self.cfg, self.params = load_whisper_dir(
            model_dir, dtype=dtype or jnp.float32)
        self.tokenizer = self._load_tokenizer(model_dir)
        # Whisper decode is sequential per window; serialize requests
        # (batched windows are the later optimization).
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
    def transcribe_waveform(self, audio: np.ndarray,
                            max_new_tokens: int = 224) -> dict:
        """f32 mono 16 kHz waveform -> {"text", "token_ids"}."""
        from ..models.whisper import greedy_transcribe_tokens
        ids: List[int] = []
        with self._lock:
            for start in range(0, max(len(audio), 1), CHUNK_SAMPLES):
                window = audio[start:start + CHUNK_SAMPLES]
                mel = log_mel_spectrogram(
                    window, num_mels=self.cfg.num_mel_bins)
                ids.extend(greedy_transcribe_tokens(
                    self.cfg, self.params, mel,
                    max_new_tokens=max_new_tokens))
        text = ""
        if self.tokenizer is not None:
            text = self.tokenizer.decode(ids, skip_special_tokens=True)
        return {"text": text, "token_ids": ids}

    def transcribe_bytes(self, data: bytes, **kw) -> dict:
        return self.transcribe_waveform(decode_wav(data), **kw)


def maybe_asr_engine(model_dir: str) -> Optional[AsrEngine]:
    """AsrEngine if the directory is a whisper checkpoint, else None."""
    import json
    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        d = json.load(f)
    archs = d.get("architectures") or []
    if not any("Whisper" in a for a in archs):
        return None
    return AsrEngine(model_dir)
