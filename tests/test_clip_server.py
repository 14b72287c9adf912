"""CLIP embeddings lane e2e: synthesized checkpoint dir ->
ClipEmbeddingEngine -> /v1/embeddings with text + base64 image items."""

import base64
import io
import json

import numpy as np
import pytest
import requests

torch = pytest.importorskip("torch")

from tests.test_clip import TEXT, VISION
from tests.test_engine_e2e import tiny_engine
from tests.test_server import ServerHandle


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    from safetensors.numpy import save_file
    from transformers import (
        CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig,
    )
    d = tmp_path_factory.mktemp("clip-tiny")
    torch.manual_seed(0)
    hf = CLIPModel(CLIPConfig(
        text_config=CLIPTextConfig(**TEXT).to_dict(),
        vision_config=CLIPVisionConfig(**VISION).to_dict(),
        projection_dim=48)).float().eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_file(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"architectures": ["CLIPModel"],
                   "text_config": TEXT, "vision_config": VISION,
                   "projection_dim": 48}, f)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    vocab = {f"w{i}": i for i in range(998)}
    vocab["[UNK]"] = 0
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    return str(d)


@pytest.fixture(scope="module")
def clip_server(clip_dir):
    from ferrum_tpu.engine.embedding import ClipEmbeddingEngine
    eng = ClipEmbeddingEngine(clip_dir)
    h = ServerHandle(tiny_engine(max_num_seqs=2), port=18885,
                     embedding_engine=eng)
    yield h
    h.stop()


def _png_b64():
    from PIL import Image
    img = Image.new("RGB", (48, 40), (200, 30, 90))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_text_and_image_embeddings(clip_server):
    r = requests.post(f"{clip_server.base}/v1/embeddings", json={
        "model": "clip", "input": ["w1 w2 w3", {"image": _png_b64()}]})
    assert r.status_code == 200, r.text
    data = r.json()["data"]
    assert len(data) == 2
    for item in data:
        v = np.asarray(item["embedding"])
        assert v.shape == (48,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-4)


def test_bad_item_rejected(clip_server):
    r = requests.post(f"{clip_server.base}/v1/embeddings", json={
        "model": "clip", "input": [{"video": "x"}]})
    assert r.status_code == 400
    assert r.json()["error"]["param"] == "input"
