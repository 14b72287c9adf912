"""Whisper lane parity vs transformers (torch CPU, random tiny model).

Three oracles: WhisperFeatureExtractor for the log-mel frontend,
WhisperForConditionalGeneration.forward for encoder/decoder logits, and
.generate(greedy) for the end-to-end token sequence
(ref: multimodal/whisper.rs + executor/whisper_executor.rs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ferrum_tpu.models.whisper import (
    WhisperConfig, decoder_logits, encode, greedy_transcribe_tokens,
    params_from_hf_sd,
)
from ferrum_tpu.ops.audio import decode_wav, log_mel_spectrogram

D = dict(vocab_size=51000, d_model=32, encoder_layers=2, decoder_layers=2,
         encoder_attention_heads=2, decoder_attention_heads=2,
         encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
         max_source_positions=1500, max_target_positions=64,
         decoder_start_token_id=50258, eos_token_id=50257,
         pad_token_id=50256)


@pytest.fixture(scope="module")
def oracle():
    from transformers import WhisperConfig as HFCfg
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFCfg(**D)).float().eval()
    d = dict(D)
    d["encoder_attention_heads"] = D["encoder_attention_heads"]
    cfg = WhisperConfig.from_hf_dict(d)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd.setdefault("model.decoder.embed_tokens.weight", sd["proj_out.weight"])
    params = params_from_hf_sd(cfg, sd, dtype=jnp.float32)
    return hf, cfg, params


def _mel(seed=0):
    rng = np.random.default_rng(seed)
    audio = rng.normal(0, 0.1, 16000 * 2).astype(np.float32)
    return audio, log_mel_spectrogram(audio, num_mels=D["num_mel_bins"])


def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=D["num_mel_bins"])
    audio, got = _mel()
    want = fe(audio, sampling_rate=16000,
              return_tensors="np").input_features[0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_encoder_matches_hf(oracle):
    hf, cfg, params = oracle
    _, mel = _mel()
    with torch.no_grad():
        want = hf.model.encoder(
            torch.from_numpy(mel)[None]).last_hidden_state.numpy()
    got = np.asarray(encode(cfg, params, jnp.asarray(mel)[None]))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_decoder_logits_match_hf(oracle):
    hf, cfg, params = oracle
    _, mel = _mel(1)
    toks = [50258, 17, 250, 4001, 9]
    with torch.no_grad():
        want = hf(input_features=torch.from_numpy(mel)[None],
                  decoder_input_ids=torch.tensor([toks])
                  ).logits[0].numpy()
    enc = encode(cfg, params, jnp.asarray(mel)[None])
    got = np.asarray(decoder_logits(
        cfg, params, jnp.asarray([toks], jnp.int32), enc))[0]
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


def test_greedy_transcription_follows_hf_argmax(oracle):
    """Each token of our greedy transcription must be HF forward's
    argmax over our own prefix (tie-aware: random tiny weights can have
    top-2 logit gaps below cross-framework f32 noise)."""
    hf, cfg, params = oracle
    _, mel = _mel(2)
    got = greedy_transcribe_tokens(cfg, params, mel, max_new_tokens=8)
    assert 1 <= len(got) <= 8
    seq = [cfg.decoder_start_token_id] + got
    with torch.no_grad():
        logits = hf(input_features=torch.from_numpy(mel)[None],
                    decoder_input_ids=torch.tensor([seq])
                    ).logits[0].numpy()
    for i, tok in enumerate(got):
        row = logits[i]
        top = int(np.argmax(row))
        assert top == tok or row[top] - row[tok] < 5e-3, (i, tok, top)


def test_wav_roundtrip():
    import io
    import wave
    rng = np.random.default_rng(3)
    pcm = (rng.normal(0, 0.1, 8000).clip(-1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    x = decode_wav(buf.getvalue())
    np.testing.assert_allclose(x, pcm.astype(np.float32) / 32768.0,
                               atol=1e-4)
