"""CLIP dual-tower parity vs transformers' CLIPModel
(ref: multimodal/clip.rs wraps candle's ClipModel)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ferrum_tpu.models.clip import (
    ClipConfig, encode_image, encode_text, params_from_hf_sd,
)

TEXT = dict(vocab_size=1000, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=32, eos_token_id=999)
VISION = dict(image_size=32, patch_size=8, hidden_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=128)


@pytest.fixture(scope="module")
def oracle():
    from transformers import (
        CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig,
    )
    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        text_config=CLIPTextConfig(**TEXT).to_dict(),
        vision_config=CLIPVisionConfig(**VISION).to_dict(),
        projection_dim=48)
    hf = CLIPModel(hf_cfg).float().eval()
    cfg = ClipConfig.from_hf_dict({
        "text_config": TEXT, "vision_config": VISION,
        "projection_dim": 48})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return hf, cfg, params_from_hf_sd(cfg, sd, dtype=jnp.float32)


def test_text_embeddings_match_hf(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(0)
    toks = np.full((2, 10), 999, np.int64)
    toks[0, :6] = rng.integers(1, 900, 6)
    toks[1, :9] = rng.integers(1, 900, 9)
    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.from_numpy(toks))
        want = torch.nn.functional.normalize(want, dim=-1).numpy()
    got = np.asarray(encode_text(cfg, params,
                                 jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_image_embeddings_match_hf(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(1)
    px = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(px))
        want = torch.nn.functional.normalize(want, dim=-1).numpy()
    got = np.asarray(encode_image(cfg, params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_similarity_direction(oracle):
    """Same input twice → similarity 1; unit norms everywhere."""
    hf, cfg, params = oracle
    rng = np.random.default_rng(2)
    px = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    e1 = np.asarray(encode_image(cfg, params, jnp.asarray(px)))
    np.testing.assert_allclose(np.linalg.norm(e1, axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(float(e1 @ e1.T), 1.0, atol=1e-5)


def test_preprocess_shapes():
    from PIL import Image

    from ferrum_tpu.models.clip import preprocess_image
    img = Image.new("RGB", (100, 60), (120, 40, 200))
    arr = preprocess_image(img, 32)
    assert arr.shape == (3, 32, 32)
    assert np.isfinite(arr).all()
