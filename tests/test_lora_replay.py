"""LoRA adapter loading/application + replay bundles
(ref: server_lora_startup.rs, replay_bundle.rs)."""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from ferrum_tpu.models.lora import apply_lora, load_lora_adapter
from ferrum_tpu.ops.linear import LoraLinearParams, apply_linear


def _write_adapter(d, r=4, alpha=8, in_f=64, out_f=64, layers=(0,)):
    from safetensors.numpy import save_file

    cfg = {"r": r, "lora_alpha": alpha,
           "target_modules": ["q_proj"], "peft_type": "LORA"}
    with open(os.path.join(d, "adapter_config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(0)
    tensors = {}
    for li in layers:
        p = f"base_model.model.model.layers.{li}.self_attn.q_proj"
        tensors[f"{p}.lora_A.weight"] = rng.normal(
            0, 0.1, (r, in_f)).astype(np.float32)
        tensors[f"{p}.lora_B.weight"] = rng.normal(
            0, 0.1, (out_f, r)).astype(np.float32)
    save_file(tensors, os.path.join(d, "adapter_model.safetensors"))
    return tensors


class TestLora:
    def test_load_and_apply_changes_output(self):
        from ferrum_tpu.models.configs import ModelConfig
        from ferrum_tpu.models.llama_family import init_random_params

        cfg = ModelConfig(family="qwen3", vocab_size=64, hidden_size=64,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          head_dim=16, intermediate_size=64, qk_norm=True,
                          tie_word_embeddings=True)
        params = init_random_params(cfg, 0, dtype=jnp.float32)
        with tempfile.TemporaryDirectory() as d:
            tensors = _write_adapter(d, layers=(0,))
            adapter, scale = load_lora_adapter(d)
            assert scale == 2.0
            assert (0, "q") in adapter
            p2 = apply_lora(params, adapter, scale, dtype=jnp.float32)
        assert isinstance(p2.layers[0].q, LoraLinearParams)
        assert not isinstance(p2.layers[1].q, LoraLinearParams)

        x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (3, 64)),
                        jnp.float32)
        base_y = apply_linear(params.layers[0].q, x)
        lora_y = apply_linear(p2.layers[0].q, x)
        a = tensors["base_model.model.model.layers.0.self_attn.q_proj"
                    ".lora_A.weight"]
        b = tensors["base_model.model.model.layers.0.self_attn.q_proj"
                    ".lora_B.weight"]
        want = np.asarray(base_y) + 2.0 * (np.asarray(x) @ a.T @ b.T)
        np.testing.assert_allclose(np.asarray(lora_y), want, rtol=1e-4,
                                   atol=1e-5)


class TestReplayBundle:
    def test_capture_replay_roundtrip(self):
        from ferrum_tpu.utils.replay import (
            capture_bundle, load_bundle, replay_bundle, save_bundle,
        )
        from tests.test_engine_e2e import tiny_engine, req

        eng = tiny_engine()
        try:
            r = req(prompt="replay target", max_tokens=6)
            res = eng.infer(r)
            bundle = capture_bundle(r, eng.cfg, "tiny",
                                    response_token_ids=res.token_ids)
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "bundle.json")
                save_bundle(bundle, path)
                loaded = load_bundle(path)
                assert loaded["request"]["sampling"]["max_tokens"] == 6
                out = replay_bundle(path, eng)
            # Greedy determinism → replay must reproduce exactly.
            assert out["matches_observed"], out
        finally:
            eng.stop()
