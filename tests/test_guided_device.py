"""Device-FSM guided decoding (sampling/token_fsm.py).

Parity contract: the token-level FSM tables must reproduce the host
RegexGuidedProcessor exactly — same allowed masks per state, same state
evolution per token — and the engine's device path must produce the
same greedy output as the host-masking fallback (which is itself the
oracle mirrored from ref guided.rs)."""

import numpy as np
import pytest

from ferrum_tpu.sampling.guided import RegexGuidedProcessor
from ferrum_tpu.sampling.regex_dfa import compile_regex
from ferrum_tpu.sampling.token_fsm import (
    HIGH_CP, PAD_CP, build_token_fsm, vocab_table,
)
from ferrum_tpu.tokenizer import make_byte_tokenizer
from ferrum_tpu.types import GuidedOptions, InferenceRequest, SamplingParams

PATTERNS = [
    r"(yes|no)",
    r"-?\d+(\.\d+)?",
    r'\{"a": (true|false)\}',
    r"[a-c]{2,3}x+",
    r'"([^"\\]|\\.)*"',
]


def _unpack(words: np.ndarray, vocab: int) -> np.ndarray:
    bits = (words[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
    return bits.reshape(words.shape[0], -1)[:, :vocab].astype(bool)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_fsm_mask_matches_host_processor(pattern):
    tok = make_byte_tokenizer()
    vocab = tok.vocab_size
    dfa = compile_regex(pattern)
    vt = vocab_table(tok, vocab)
    fsm = build_token_fsm(dfa, vt, vocab)
    proc = RegexGuidedProcessor(dfa, tok)
    masks = _unpack(fsm.mask_words, vocab)

    # Walk a few host trajectories; at every step the FSM row for the
    # mapped state must equal the host mask.
    rng = np.random.default_rng(0)
    for _ in range(5):
        proc.state = dfa.start
        proc._complete = False
        st = fsm.start
        for _step in range(8):
            host_mask = proc.allowed_mask()
            np.testing.assert_array_equal(masks[st], host_mask,
                                          err_msg=pattern)
            allowed = np.flatnonzero(host_mask)
            if len(allowed) == 0:
                break
            tid = int(rng.choice(allowed))
            if tid in tok.eos_token_ids:
                break
            proc.advance(None, tid)
            # FSM advance via codepoint fold (what the device does).
            cps = vt.token_cps[tid]
            for cp in cps:
                st = int(fsm.trans[st, cp])
            assert st == fsm.dfa_to_local[proc.state], pattern


def test_fsm_dead_state_allows_only_eos():
    tok = make_byte_tokenizer()
    vocab = tok.vocab_size
    dfa = compile_regex(r"abc")
    vt = vocab_table(tok, vocab)
    fsm = build_token_fsm(dfa, vt, vocab)
    dead_mask = _unpack(fsm.mask_words[fsm.dead][None], vocab)[0]
    allowed = set(np.flatnonzero(dead_mask).tolist())
    assert allowed == set(e for e in tok.eos_token_ids if e < vocab)


def test_vocab_table_codepoints():
    tok = make_byte_tokenizer()
    vt = vocab_table(tok, tok.vocab_size)
    a = tok.encode("a", add_special_tokens=False)[0]
    assert vt.token_cps[a, 0] == ord("a")
    assert vt.token_cps[a, 1] == PAD_CP if vt.token_cps.shape[1] > 1 else True
    assert not vt.valid[tok.eos_token_ids[0]]


def test_engine_device_guided_matches_host_greedy():
    """Same tiny engine, same guided regex, greedy: the device-FSM path
    must emit exactly what the host-masking path emits."""
    from tests.test_engine_e2e import tiny_engine

    patterns = [r"(yes|no)", r"-?\d\d", r"(foo|bar)+x"]
    eng = tiny_engine()
    try:
        outs_device = []
        for p in patterns:
            r = eng.infer(InferenceRequest(
                prompt="q:", sampling=SamplingParams(
                    max_tokens=8, temperature=0.0),
                guided=GuidedOptions(regex=p)))
            seqs = [s for s in ()]  # noqa: F841
            outs_device.append(r.token_ids)
        # Force the host fallback by clearing the FSM cache and
        # monkeypatching the setup to a no-op.
        eng._fsm_cache.clear()
        eng._setup_device_guided = lambda seq, opts: None
        for p, want in zip(patterns, outs_device):
            r = eng.infer(InferenceRequest(
                prompt="q:", sampling=SamplingParams(
                    max_tokens=8, temperature=0.0),
                guided=GuidedOptions(regex=p)))
            assert r.token_ids == want, p
    finally:
        eng.stop()


def test_engine_device_guided_used():
    """The device path is actually taken (guided_fsm set) for a simple
    regex on the tiny engine."""
    from tests.test_engine_e2e import tiny_engine

    eng = tiny_engine()
    try:
        r = eng.infer(InferenceRequest(
            prompt="pick:", sampling=SamplingParams(
                max_tokens=6, temperature=0.0),
            guided=GuidedOptions(regex=r"(red|green|blue)")))
        assert r.text in ("red", "green", "blue"), r.text
        key = next(iter(eng._fsm_cache))
        fsm, dfa, vt = eng._fsm_cache[key]
        assert fsm is not None
    finally:
        eng.stop()


def test_engine_device_guided_sampled_stays_in_language():
    from tests.test_engine_e2e import tiny_engine
    from ferrum_tpu.sampling.regex_dfa import compile_regex as cr

    eng = tiny_engine()
    try:
        pattern = r"(ab|cd)+"
        for seed in range(3):
            r = eng.infer(InferenceRequest(
                prompt="x", sampling=SamplingParams(
                    max_tokens=10, temperature=0.9, seed=seed),
                guided=GuidedOptions(regex=pattern)))
            dfa = cr(pattern)
            assert dfa.walk(dfa.start, r.text) is not None, r.text
    finally:
        eng.stop()
