"""GGUF parsing/dequant/loader tests (ref: gguf_* tests in
ferrum-quantization; synthetic files, no network)."""

import numpy as np
import pytest

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.models.gguf import (
    GGML_F32, GGML_F16, GGML_Q4_K, config_from_gguf, hf_name,
    load_gguf_checkpoint, quantize_q4k_np, read_gguf, write_gguf,
    dequantize_tensor, GgufTensorInfo,
)


def test_q4k_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, 1024).astype(np.float32)
    raw = quantize_q4k_np(w)
    assert len(raw) == 4 * 144
    info = GgufTensorInfo("t", (1024,), GGML_Q4_K, 0)
    back = dequantize_tensor(raw, info)
    # 4-bit with 6-bit sub-scales: expect ~1-2% of dynamic range error.
    err = np.abs(back - w).max()
    assert err < 0.15 * np.abs(w).max(), err
    assert np.corrcoef(back, w)[0, 1] > 0.99


def test_file_roundtrip_and_metadata():
    import tempfile, os
    rng = np.random.default_rng(1)
    t1 = rng.normal(size=(8, 16)).astype(np.float32)
    t2 = rng.normal(size=(256,)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.gguf")
        write_gguf(path, {"general.architecture": "llama",
                          "llama.block_count": 2,
                          "general.alignment": 32,
                          "note": "hello"},
                   {"a.weight": (t1, GGML_F32),
                    "b.weight": (t2, GGML_Q4_K)})
        g = read_gguf(path)
        assert g.metadata["general.architecture"] == "llama"
        assert g.metadata["note"] == "hello"
        a = g.load_tensor("a.weight")
        np.testing.assert_allclose(a, t1, rtol=1e-6)
        b = g.load_tensor("b.weight")
        assert np.corrcoef(b, t2)[0, 1] > 0.99


def test_name_mapping():
    assert hf_name("token_embd.weight") == "model.embed_tokens.weight"
    assert hf_name("blk.3.attn_q.weight") == \
        "model.layers.3.self_attn.q_proj.weight"
    assert hf_name("blk.0.ffn_down.weight") == \
        "model.layers.0.mlp.down_proj.weight"
    assert hf_name("output.weight") == "lm_head.weight"
    assert hf_name("rope_freqs.weight") is None


def _tiny_gguf(path, quant=GGML_F32, extra_meta=None):
    """A complete tiny qwen3-family GGUF checkpoint."""
    rng = np.random.default_rng(2)
    H, L, NH, NKV, HD, I, V = 64, 2, 4, 2, 16, 128, 256
    meta = {
        "general.architecture": "qwen3",
        "qwen3.embedding_length": H,
        "qwen3.block_count": L,
        "qwen3.attention.head_count": NH,
        "qwen3.attention.head_count_kv": NKV,
        "qwen3.attention.key_length": HD,
        "qwen3.feed_forward_length": I,
        "qwen3.vocab_size": V,
        "qwen3.context_length": 512,
        "qwen3.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen3.rope.freq_base": 10000.0,
    }
    if extra_meta:
        meta.update(extra_meta)
    tensors = {"token_embd.weight": (
        rng.normal(0, 0.02, (V, H)).astype(np.float32), GGML_F32),
        "output_norm.weight": (np.ones(H, np.float32), GGML_F32)}
    for i in range(L):
        p = f"blk.{i}"
        # ggml stores [out, in] like HF
        tensors[f"{p}.attn_q.weight"] = (
            rng.normal(0, 0.02, (NH * HD, H)).astype(np.float32), quant)
        tensors[f"{p}.attn_k.weight"] = (
            rng.normal(0, 0.02, (NKV * HD, H)).astype(np.float32), quant)
        tensors[f"{p}.attn_v.weight"] = (
            rng.normal(0, 0.02, (NKV * HD, H)).astype(np.float32), quant)
        tensors[f"{p}.attn_output.weight"] = (
            rng.normal(0, 0.02, (H, NH * HD)).astype(np.float32), quant)
        tensors[f"{p}.attn_q_norm.weight"] = (np.ones(HD, np.float32),
                                              GGML_F32)
        tensors[f"{p}.attn_k_norm.weight"] = (np.ones(HD, np.float32),
                                              GGML_F32)
        tensors[f"{p}.attn_norm.weight"] = (np.ones(H, np.float32),
                                            GGML_F32)
        tensors[f"{p}.ffn_norm.weight"] = (np.ones(H, np.float32), GGML_F32)
        tensors[f"{p}.ffn_gate.weight"] = (
            rng.normal(0, 0.02, (I, H)).astype(np.float32), quant)
        tensors[f"{p}.ffn_up.weight"] = (
            rng.normal(0, 0.02, (I, H)).astype(np.float32), quant)
        tensors[f"{p}.ffn_down.weight"] = (
            rng.normal(0, 0.02, (H, I)).astype(np.float32), quant)
    write_gguf(path, meta, tensors)


def test_rope_scaling_metadata_mapped():
    """{arch}.rope.scaling.* must populate ModelConfig.rope_scaling like
    the HF path does (ADVICE r1 low: Llama-3.1-style GGUFs otherwise
    load with unscaled RoPE and degrade at long context)."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tiny.gguf")
        _tiny_gguf(path)
        g = read_gguf(path)
        assert config_from_gguf(g).rope_scaling is None  # no metadata

        path2 = os.path.join(d, "scaled.gguf")
        _tiny_gguf(path2, extra_meta={
            "qwen3.rope.scaling.type": "yarn",
            "qwen3.rope.scaling.factor": 4.0,
            "qwen3.rope.scaling.original_context_length": 128,
        })
        cfg = config_from_gguf(read_gguf(path2))
        rs = cfg.rope_scaling
        assert rs is not None
        assert rs.rope_type == "yarn" and rs.factor == 4.0
        assert rs.original_max_position_embeddings == 128


def test_load_gguf_model_and_generate():
    import tempfile, os
    import jax.numpy as jnp
    from ferrum_tpu.models.llama_family import PagedKvCache
    from tests.test_model_forward import prefill_whole, PAGE, NUM_BLOCKS

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tiny.gguf")
        _tiny_gguf(path)
        g = read_gguf(path)
        cfg = config_from_gguf(g)
        assert cfg.family == "qwen3"
        assert cfg.qk_norm and cfg.tie_word_embeddings
        ecfg = EngineConfig(dtype="f32")
        cfg2, params = load_gguf_checkpoint(path, ecfg)
        kv = PagedKvCache.create(cfg2, NUM_BLOCKS, PAGE, dtype=jnp.float32)
        h, _ = prefill_whole(params, cfg2, kv, list(range(10)), [0, 1, 2])
        assert np.isfinite(np.asarray(h)).all()
