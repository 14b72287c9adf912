"""Squeezed embeddings (int8 table + int4 untied lm_head) — the
single-chip 30B fit posture (docs/fit_30b_v5e.md; FERRUM_SQUEEZE_EMBED).

ref parity model: the reference keeps bf16 embeddings in its GPTQ lane
(crates/ferrum-quantization); the squeeze is a TPU-fit extension, so
these tests pin (a) numerical closeness to the bf16 table, (b) exactness
of the tied-logits rescale identity, (c) the engine running end-to-end
with the squeeze on.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.engine.builder import EngineBuilder
from ferrum_tpu.models.configs import ModelConfig
from ferrum_tpu.models.llama_family import (
    QuantEmbedding, embed_lookup, init_random_params, logits_from_hidden,
)
from ferrum_tpu.models.quantize import quantize_embedding
from ferrum_tpu.tokenizer import make_byte_tokenizer
from ferrum_tpu.types import InferenceRequest, SamplingParams


def _mc(tied=True, vocab=512, hidden=64):
    # hidden=128 gives the untied lm_head a group-128-quantizable input
    # dim; hidden=64 exercises the stays-dense fallback.
    return ModelConfig(
        family="qwen3", vocab_size=vocab, hidden_size=hidden, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=hidden // 4,
        intermediate_size=2 * hidden, qk_norm=True,
        tie_word_embeddings=tied, rope_theta=10000.0,
        eos_token_ids=(257,))


def test_lookup_close_to_bf16():
    params = init_random_params(_mc(), seed=0)
    qe = quantize_embedding(params.embed)
    toks = jnp.arange(0, 512, 7)
    a = embed_lookup(params.embed, toks).astype(jnp.float32)
    b = embed_lookup(qe, toks).astype(jnp.float32)
    # per-row absmax int8: error bound is scale/2 = amax/254 per element
    bound = np.asarray(qe.scale)[np.asarray(toks)] / 2 + 1e-6
    assert np.all(np.abs(np.asarray(a - b)) <= bound + 0.005)


def test_tied_logits_identity():
    """s_v (h . q_v) == h . (s_v q_v): the rescale must commute exactly
    (same contraction, scale applied per output column)."""
    params = init_random_params(_mc(), seed=1)
    qe = quantize_embedding(params.embed)
    h = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 64)),
                    jnp.float32)
    pt = dataclasses.replace(params, lm_head=None)
    lq = logits_from_hidden(dataclasses.replace(pt, embed=qe), _mc(), h)
    # manual dequant reference
    deq = (np.asarray(qe.q, np.float32) * np.asarray(qe.scale))
    ref = np.asarray(h, np.float32) @ deq.T
    np.testing.assert_allclose(np.asarray(lq), ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("tied", [True, False])
def test_engine_runs_squeezed(tied):
    cfg = EngineConfig(
        model="test", max_num_seqs=2, kv_num_blocks=32, kv_block_size=8,
        max_model_len=128, max_num_batched_tokens=64,
        prefill_chunk_size=32, dtype="f32", kv_dtype="f32", seed=0,
        squeeze_embeddings=True)
    mc = _mc(tied=tied, hidden=64 if tied else 128)
    params = init_random_params(mc, seed=0, dtype=jnp.float32)
    tok = make_byte_tokenizer(vocab_extra=512 - 258)
    eng = (EngineBuilder(cfg).with_model(mc, params)
           .with_tokenizer(tok).build())
    try:
        assert isinstance(eng.runner.params.embed, QuantEmbedding)
        if not tied:
            from ferrum_tpu.ops.quant import QuantLinearParams
            assert isinstance(eng.runner.params.lm_head, QuantLinearParams)
        r = eng.infer(InferenceRequest(
            prompt="squeeze", sampling=SamplingParams(max_tokens=6)))
        assert r.completion_tokens >= 1
        r2 = eng.infer(InferenceRequest(
            prompt="squeeze", sampling=SamplingParams(max_tokens=6)))
        assert r.token_ids == r2.token_ids
    finally:
        eng.stop()


def test_shard_params_handles_quant_embedding():
    """Vocab-sharded int8 table + scales over the TP axis (mesh.py)."""
    from ferrum_tpu.parallel.mesh import make_mesh, shard_params

    mc = _mc(tied=True)
    params = init_random_params(mc, seed=0)
    params = dataclasses.replace(params,
                                 embed=quantize_embedding(params.embed))
    mesh = make_mesh(tp=2)
    sp = shard_params(params, mc, mesh)
    assert isinstance(sp.embed, QuantEmbedding)
    toks = jnp.array([3, 9])
    a = embed_lookup(params.embed, toks).astype(jnp.float32)
    b = embed_lookup(sp.embed, toks).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
