"""TTS lane: talker + code predictor + vocoder + engine + HTTP + CLI.

ref: crates/ferrum-models/src/multimodal/qwen3_tts*.rs,
crates/ferrum-server/src/axum_server.rs:201 (/v1/audio/speech),
ferrum-cli tts subcommand. No public HF implementation of the
reference's TTS stack exists, so the gates here are structural:
determinism, length contracts (frames x total_upsample), eos stop,
checkpoint round-trip, and the HTTP 400 contract."""

import io
import json
import os
import wave

import numpy as np
import jax.numpy as jnp
import pytest

from ferrum_tpu.models.tts import (
    TtsConfig, TtsTalkerConfig, TtsVocoderConfig, init_random_tts_params,
    load_tts_dir, save_tts_dir, synthesize_codes, vocode,
)


def tiny_cfg():
    return TtsConfig(
        talker=TtsTalkerConfig(
            codec_vocab=64, hidden_size=32, num_layers=2, num_heads=4,
            ffn_size=64, text_vocab=260, text_hidden=16,
            num_code_groups=4, codec_bos_id=62, codec_eos_id=63,
            max_text_len=32, max_frames=8, speakers=("default", "alt")),
        vocoder=TtsVocoderConfig(
            codebook_size=64, num_quantizers=4, latent_dim=16,
            hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
            decoder_dim=32, upsample_rates=(2, 2, 2), sample_rate=8000))


@pytest.fixture(scope="module")
def tts():
    cfg = tiny_cfg()
    return cfg, init_random_tts_params(cfg, seed=0)


def test_synthesize_codes_shape_and_determinism(tts):
    cfg, params = tts
    ids = np.asarray([10, 20, 30], np.int32)
    c1 = synthesize_codes(cfg.talker, params.talker, ids, 0, max_frames=6)
    c2 = synthesize_codes(cfg.talker, params.talker, ids, 0, max_frames=6)
    assert c1.shape[1] == cfg.talker.num_code_groups
    assert c1.shape[0] <= 6
    np.testing.assert_array_equal(c1, c2)
    assert (c1 >= 0).all() and (c1 < cfg.talker.codec_vocab).all()


def test_speaker_changes_output(tts):
    cfg, params = tts
    ids = np.asarray([10, 20, 30], np.int32)
    a = synthesize_codes(cfg.talker, params.talker, ids, 0, max_frames=4)
    b = synthesize_codes(cfg.talker, params.talker, ids, 1, max_frames=4)
    assert a.shape != b.shape or not np.array_equal(a, b)


def test_vocoder_length_contract(tts):
    cfg, params = tts
    t = 5
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(
        0, cfg.vocoder.codebook_size,
        (t, cfg.vocoder.num_quantizers)), jnp.int32)
    wav = np.asarray(vocode(cfg.vocoder, params.vocoder, codes))
    assert wav.shape == (t * cfg.vocoder.total_upsample,)
    assert np.abs(wav).max() <= 1.0
    assert np.isfinite(wav).all()


def test_checkpoint_roundtrip(tts, tmp_path):
    cfg, params = tts
    d = str(tmp_path / "tts")
    save_tts_dir(cfg, params, d)
    cfg2, params2 = load_tts_dir(d)
    assert cfg2.talker.num_code_groups == cfg.talker.num_code_groups
    assert cfg2.vocoder.upsample_rates == cfg.vocoder.upsample_rates
    np.testing.assert_allclose(
        np.asarray(params2.talker.head), np.asarray(params.talker.head),
        rtol=1e-6)
    ids = np.asarray([5, 6], np.int32)
    a = synthesize_codes(cfg.talker, params.talker, ids, 0, max_frames=3)
    b = synthesize_codes(cfg2.talker, params2.talker, ids, 0, max_frames=3)
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def tts_dir(tts, tmp_path_factory):
    cfg, params = tts
    d = str(tmp_path_factory.mktemp("ckpt") / "tts")
    save_tts_dir(cfg, params, d)
    return d


def test_engine_wav(tts_dir):
    from ferrum_tpu.engine.tts import TtsEngine, maybe_tts_engine

    assert maybe_tts_engine(tts_dir) is not None
    eng = TtsEngine(tts_dir)
    data = eng.synthesize_wav("hello", max_frames=4)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == eng.sample_rate
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
    from ferrum_tpu.types import InvalidRequestError
    with pytest.raises(InvalidRequestError):
        eng.synthesize("hi", voice="nope")
    with pytest.raises(InvalidRequestError):
        eng.synthesize("")


def test_maybe_tts_engine_rejects_non_tts(tmp_path):
    from ferrum_tpu.engine.tts import maybe_tts_engine
    d = tmp_path / "not_tts"
    d.mkdir()
    (d / "config.json").write_text(
        json.dumps({"architectures": ["LlamaForCausalLM"]}))
    assert maybe_tts_engine(str(d)) is None


def test_cli_tts(tts_dir, tmp_path, capsys):
    from ferrum_tpu.cli import main
    out = str(tmp_path / "x.wav")
    rc = main(["tts", tts_dir, "hello world", "--out", out,
               "--max-frames", "3"])
    assert rc == 0
    with wave.open(out) as w:
        assert w.getnchannels() == 1
