"""TTS lane e2e: tiny TTS checkpoint dir -> TtsEngine ->
/v1/audio/speech HTTP contract (ref: axum_server.rs:201
speech_handler + the explicit-400 rejection table)."""

import io
import wave

import pytest
import requests

from tests.test_engine_e2e import tiny_engine
from tests.test_server import ServerHandle
from tests.test_tts import tiny_cfg


@pytest.fixture(scope="module")
def tts_dir(tmp_path_factory):
    from ferrum_tpu.models.tts import init_random_tts_params, save_tts_dir
    cfg = tiny_cfg()
    params = init_random_tts_params(cfg, seed=0)
    d = str(tmp_path_factory.mktemp("tts-ckpt") / "tts")
    save_tts_dir(cfg, params, d)
    return d


@pytest.fixture(scope="module")
def tts_server(tts_dir):
    from ferrum_tpu.engine.tts import maybe_tts_engine
    tts = maybe_tts_engine(tts_dir)
    assert tts is not None
    h = ServerHandle(tiny_engine(max_num_seqs=2), port=18887,
                     tts_engine=tts)
    yield h
    h.stop()


def test_speech_wav(tts_server):
    r = requests.post(f"{tts_server.base}/v1/audio/speech",
                      json={"model": "tts", "input": "hello there",
                            "voice": "default"})
    assert r.status_code == 200, r.text
    assert r.headers["Content-Type"].startswith("audio/wav")
    with wave.open(io.BytesIO(r.content)) as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 8000


def test_speech_pcm(tts_server):
    r = requests.post(f"{tts_server.base}/v1/audio/speech",
                      json={"input": "hi", "response_format": "pcm"})
    assert r.status_code == 200
    assert len(r.content) % 2 == 0


def test_speech_rejections(tts_server):
    # missing input → 400 pointing at `input`
    r = requests.post(f"{tts_server.base}/v1/audio/speech",
                      json={"model": "tts"})
    assert r.status_code == 400
    assert r.json()["error"]["param"] == "input"
    # bad response_format → 400 pointing at it
    r = requests.post(f"{tts_server.base}/v1/audio/speech",
                      json={"input": "x", "response_format": "mp3"})
    assert r.status_code == 400
    assert r.json()["error"]["param"] == "response_format"
    # unknown voice → 400
    r = requests.post(f"{tts_server.base}/v1/audio/speech",
                      json={"input": "x", "voice": "bogus"})
    assert r.status_code == 400
    assert r.json()["error"]["param"] == "voice"


def test_speech_not_supported_without_engine():
    h = ServerHandle(tiny_engine(max_num_seqs=2), port=18888)
    try:
        r = requests.post(f"{h.base}/v1/audio/speech",
                          json={"input": "x"})
        assert r.status_code in (400, 501)
        assert "TTS" in r.json()["error"]["message"] or \
            "tts" in r.json()["error"]["message"]
    finally:
        h.stop()
