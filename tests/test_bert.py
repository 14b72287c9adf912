"""BERT embeddings executor parity vs transformers' BertModel
(ref: multimodal/bert.rs wraps candle's BertModel; here the whole
encoder is one jitted jnp function)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ferrum_tpu.models.bert import (
    BertConfig, bert_encode, params_from_hf_sd,
)

D = dict(vocab_size=500, hidden_size=48, num_hidden_layers=3,
         num_attention_heads=4, intermediate_size=96,
         max_position_embeddings=64, type_vocab_size=2,
         layer_norm_eps=1e-12)


@pytest.fixture(scope="module")
def oracle():
    from transformers import BertConfig as HFCfg
    from transformers import BertModel
    torch.manual_seed(0)
    hf = BertModel(HFCfg(**D, hidden_act="gelu"),
                   add_pooling_layer=False).float().eval()
    cfg = BertConfig.from_hf_dict(dict(D))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return hf, cfg, params_from_hf_sd(cfg, sd, dtype=jnp.float32)


def test_encoder_matches_hf(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(0)
    toks = rng.integers(1, 500, (2, 10)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(toks)
                  ).last_hidden_state.numpy()
    got = np.asarray(bert_encode(
        cfg, params, jnp.asarray(toks, jnp.int32),
        jnp.ones((2, 10), bool)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


@pytest.mark.slow  # 16s padded-batch oracle
def test_padding_mask_matches_unpadded(oracle):
    hf, cfg, params = oracle
    rng = np.random.default_rng(1)
    toks = rng.integers(1, 500, 7).astype(np.int32)
    full = np.asarray(bert_encode(
        cfg, params, jnp.asarray(toks[None]), jnp.ones((1, 7), bool)))
    padded = np.zeros((1, 12), np.int32)
    padded[0, :7] = toks
    mask = np.zeros((1, 12), bool)
    mask[0, :7] = True
    got = np.asarray(bert_encode(
        cfg, params, jnp.asarray(padded), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0, :7], full[0], atol=2e-5)


def test_embedding_engine_interface(oracle, tmp_path):
    """BertEmbeddingEngine loads a checkpoint dir and returns unit
    vectors through the /v1/embeddings interface shape."""
    import json

    from safetensors.numpy import save_file
    hf, cfg, params = oracle
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({**D, "architectures": ["BertModel"]}, f)
    # Minimal wordpiece tokenizer for the test vocab.
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    vocab = {f"tok{i}": i for i in range(500)}
    vocab["[UNK]"] = 0
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))

    from ferrum_tpu.engine.embedding import BertEmbeddingEngine
    eng = BertEmbeddingEngine(str(tmp_path))
    vecs, total = eng.embed(["tok1 tok2 tok3", "tok7"])
    assert vecs.shape == (2, D["hidden_size"])
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0,
                               atol=1e-5)
    assert total == 4
