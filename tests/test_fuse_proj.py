"""Build-time projection fusion (engine/builder.fuse_projections):
fused q|k|v / gate|up forward must match the split path bit-for-bit
on the reference (CPU) kernels."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest


def structural_copy(params):
    # tree_map rebuilds the dataclass containers (leaves shared), so the
    # in-place fusion pass cannot touch the copy.
    return jax.tree_util.tree_map(lambda x: x, params)

from ferrum_tpu.engine.builder import fuse_projections
from ferrum_tpu.models.configs import ModelConfig, MoeConfig
from ferrum_tpu.models.llama_family import init_random_params
from ferrum_tpu.models.quantize import quantize_model_params
from ferrum_tpu.ops.quant import QuantLinearParams


def moe_cfg():
    return ModelConfig(
        family="qwen3_moe", vocab_size=128, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        qk_norm=True, rms_norm_eps=1e-6, max_position_embeddings=256,
        tie_word_embeddings=True, bos_token_id=1, eos_token_ids=(2,),
        moe=MoeConfig(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=128, norm_topk_prob=True))


@pytest.mark.parametrize("quant", [False, True])
def test_fused_forward_matches_split(tiny_cfg, quant):
    from ferrum_tpu.models.llama_family import (
        encode_forward,
    )
    params = init_random_params(tiny_cfg, seed=0, dtype=jnp.float32)
    if quant:
        params = quantize_model_params(params, group_size=32, dtype=jnp.float32)
    split = structural_copy(params)
    fused = fuse_projections(params)
    params = split
    lp = fused.layers[0]
    assert lp.qkv is not None and lp.q is None
    assert lp.gate_up is not None and lp.gate is None
    toks = jnp.asarray(np.arange(9) % tiny_cfg.vocab_size, jnp.int32)
    tr = jnp.asarray(9, jnp.int32)
    a = np.asarray(encode_forward(params, tiny_cfg, toks, tr))
    b = np.asarray(encode_forward(fused, tiny_cfg, toks, tr))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_fused_moe_matches_split():
    # The moe site is off by default (multi-GB runtime OOM on large
    # MoE, engine/builder.fuse_projections); the capability remains
    # opt-in via cfg.fuse_sites and must stay correct.
    from ferrum_tpu.models.llama_family import encode_forward
    cfg = moe_cfg()
    params = init_random_params(cfg, seed=1, dtype=jnp.float32)
    params = quantize_model_params(params, group_size=32, dtype=jnp.float32)
    split = structural_copy(params)
    fused = fuse_projections(params, sites="qkv,gate_up,moe")
    params = split
    m = fused.layers[0].moe
    assert isinstance(m.gate_up, QuantLinearParams)
    assert m.gate is None and m.up is None
    assert m.gate_up.out_features == 2 * cfg.moe.moe_intermediate_size
    toks = jnp.asarray(np.arange(7) % cfg.vocab_size, jnp.int32)
    tr = jnp.asarray(7, jnp.int32)
    a = np.asarray(encode_forward(params, cfg, toks, tr))
    b = np.asarray(encode_forward(fused, cfg, toks, tr))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_engine_builds_with_fusion(tiny_cfg):
    """Default build path fuses (single chip) and still serves."""
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    params = init_random_params(tiny_cfg, seed=0, dtype=jnp.float32)
    cfg = EngineConfig.resolve(model="t", max_num_seqs=2,
                               max_model_len=128, kv_num_blocks=32,
                               kv_block_size=16)
    eng = EngineBuilder(cfg).with_model(tiny_cfg, params).build()
    try:
        assert eng.runner.params.layers[0].qkv is not None
        out = eng.infer(InferenceRequest(
            request_id="r1", prompt_token_ids=[1, 5, 9],
            sampling=SamplingParams(max_tokens=4, temperature=0.0)))
        assert len(out.token_ids) > 0
    finally:
        eng.stop()
