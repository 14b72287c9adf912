"""Tokenizer wrapper + incremental streaming detokenization.

TPU-native analog of the reference's ferrum-tokenizer crate
(crates/ferrum-tokenizer/src/implementations/huggingface.rs and the
`IncrementalTokenizer` trait, ferrum-interfaces/src/tokenizer.rs:296):
wraps HuggingFace `tokenizers`, exposes encode/decode, and implements
the stable incremental-detokenization algorithm (hold back bytes while
the last token decodes to an incomplete UTF-8 sequence / byte-level
artifact, then emit the delta).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

from tokenizers import Tokenizer

from .types import ModelLoadError


class FerrumTokenizer:
    def __init__(self, tok: Tokenizer,
                 eos_token_ids: Sequence[int] = (),
                 bos_token_id: Optional[int] = None,
                 chat_template: Optional[str] = None,
                 special_ids: Optional[set] = None):
        self._tok = tok
        self.eos_token_ids = tuple(eos_token_ids)
        self.bos_token_id = bos_token_id
        self.chat_template = chat_template
        self._special_ids = special_ids or set()

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_dir: str) -> "FerrumTokenizer":
        """Load tokenizer.json (+ tokenizer_config.json metadata) from a
        local HF checkpoint directory."""
        tj = os.path.join(model_dir, "tokenizer.json")
        if not os.path.exists(tj):
            raise ModelLoadError(f"no tokenizer.json under {model_dir}")
        tok = Tokenizer.from_file(tj)

        chat_template = None
        eos_ids: List[int] = []
        bos_id = None
        special_ids = set()
        cfg_path = os.path.join(model_dir, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            chat_template = cfg.get("chat_template")
            if isinstance(chat_template, list):  # HF multi-template form
                chat_template = {t["name"]: t["template"]
                                 for t in chat_template}.get("default")
            for key in ("eos_token", "bos_token"):
                val = cfg.get(key)
                if isinstance(val, dict):
                    val = val.get("content")
                if val is not None:
                    tid = tok.token_to_id(val)
                    if tid is not None:
                        if key == "eos_token":
                            eos_ids.append(tid)
                        else:
                            bos_id = tid
            for tid_str, meta in (cfg.get("added_tokens_decoder") or {}).items():
                if meta.get("special"):
                    special_ids.add(int(tid_str))
        gen_cfg = os.path.join(model_dir, "generation_config.json")
        if os.path.exists(gen_cfg):
            with open(gen_cfg) as f:
                g = json.load(f)
            e = g.get("eos_token_id")
            if isinstance(e, list):
                eos_ids.extend(int(x) for x in e)
            elif e is not None:
                eos_ids.append(int(e))
        seen = set()
        eos_ids = [x for x in eos_ids if not (x in seen or seen.add(x))]
        return cls(tok, eos_ids, bos_id, chat_template, special_ids)

    # ------------------------------------------------------------------
    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens).ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def token_to_id(self, token: str) -> Optional[int]:
        return self._tok.token_to_id(token)

    # ------------------------------------------------------------------
    def decode_incremental(
        self, all_ids: Sequence[int], prefix_offset: int, read_offset: int,
    ) -> Tuple[str, int, int]:
        """Stable streaming detokenization.

        Returns (new_text, new_prefix_offset, new_read_offset). Text is
        emitted only once its bytes are final (no dangling UTF-8
        replacement char), so stream == non-stream byte-for-byte — the
        reference's product invariant (release ladder L3 stream==non-
        stream, SURVEY §4.9).
        """
        ids = list(all_ids)
        prefix_text = self._tok.decode(ids[prefix_offset:read_offset],
                                       skip_special_tokens=True)
        full_text = self._tok.decode(ids[prefix_offset:],
                                     skip_special_tokens=True)
        if len(full_text) > len(prefix_text) and not full_text.endswith("�"):
            return full_text[len(prefix_text):], read_offset, len(ids)
        return "", prefix_offset, read_offset


# ---------------------------------------------------------------------------
# Test tokenizer (hardware/network-free): byte-level vocabulary.
# ---------------------------------------------------------------------------

def make_byte_tokenizer(vocab_extra: int = 0) -> FerrumTokenizer:
    """A self-contained byte-level tokenizer for tests/benches: ids 0-255
    are raw bytes, 256=<bos>, 257=<eos>, then `vocab_extra` unused slots
    (to match a model's vocab size)."""
    from tokenizers import models, decoders, pre_tokenizers

    # ByteLevel maps bytes to printable unicode chars (GPT-2 alphabet).
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    alphabet.sort()
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    vocab["<bos>"] = 256
    vocab["<eos>"] = 257
    for i in range(vocab_extra):
        vocab[f"<extra_{i}>"] = 258 + i
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False,
                                                 use_regex=False)
    tok.decoder = decoders.ByteLevel()
    tok.add_special_tokens(["<bos>", "<eos>"])
    return FerrumTokenizer(tok, eos_token_ids=(257,), bos_token_id=256,
                           special_ids={256, 257})
