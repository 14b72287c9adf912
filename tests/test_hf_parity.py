"""Logit parity vs HuggingFace transformers (torch CPU) on tiny models.

The strongest correctness oracle available without network: instantiate
a tiny HF model with random weights, export its state dict into our
loader, and require near-bit logit agreement through the paged-KV path
(ref: qwen3_model_parity_test.rs / layer-dump compare harnesses,
SURVEY §4.6).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ferrum_tpu.models.configs import config_from_hf_dict
from ferrum_tpu.models.llama_family import (
    PagedKvCache, decode_forward, logits_from_hidden, prefill_forward,
)
from ferrum_tpu.models.loader import TensorSource, params_from_hf

PAGE = 8
NUM_BLOCKS = 32
from ferrum_tpu.models.llama_family import OOB_SENTINEL as OOB
CTX = 64
MAXP = CTX // PAGE


def state_dict_np(model):
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in model.state_dict().items()}


def run_ours(cfg, params, tokens):
    t = len(tokens)
    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    tpad = 16 * ((t + 15) // 16)
    toks = np.zeros(tpad, np.int32); toks[:t] = tokens
    pos = np.full(tpad, CTX + 99, np.int32); pos[:t] = np.arange(t)
    table = np.arange(MAXP, dtype=np.int32)
    flat = np.full(tpad, OOB, np.int32)
    flat[:t] = np.arange(t)
    h, _ = prefill_forward(params, cfg, kv, jnp.asarray(toks),
                           jnp.asarray(pos), jnp.asarray(table),
                           jnp.asarray(t, jnp.int32), jnp.asarray(flat),
                           ctx_pad=CTX)
    return np.asarray(logits_from_hidden(params, cfg, h[:t]))


def check_parity(hf_model, hf_cfg_dict, n_tokens=12, rtol=2e-4, atol=2e-4,
                 seed=0):
    cfg = config_from_hf_dict(hf_cfg_dict)
    sd = state_dict_np(hf_model)
    params = params_from_hf(cfg, TensorSource(sd), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.vocab_size, n_tokens).tolist()

    with torch.no_grad():
        want = hf_model(torch.tensor([tokens])).logits[0].float().numpy()
    got = run_ours(cfg, params, tokens)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    d = dict(architectures=["LlamaForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
             num_key_value_heads=2, intermediate_size=128,
             rms_norm_eps=1e-5, rope_theta=10000.0,
             max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    m = LlamaForCausalLM(LlamaConfig(**{k: v for k, v in d.items()
                                        if k != "architectures"})).eval()
    check_parity(m, d)


def test_llama31_rope_scaling_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    rs = dict(rope_type="llama3", factor=8.0, low_freq_factor=1.0,
              high_freq_factor=4.0, original_max_position_embeddings=64)
    d = dict(architectures=["LlamaForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, intermediate_size=128,
             rms_norm_eps=1e-5, rope_theta=10000.0, rope_scaling=rs,
             max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(1)
    m = LlamaForCausalLM(LlamaConfig(**{k: v for k, v in d.items()
                                        if k != "architectures"})).eval()
    check_parity(m, d, n_tokens=20)


def test_qwen3_parity():
    from transformers import Qwen3Config, Qwen3ForCausalLM
    d = dict(architectures=["Qwen3ForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
             num_key_value_heads=2, head_dim=16, intermediate_size=128,
             rms_norm_eps=1e-6, rope_theta=10000.0,
             max_position_embeddings=512, tie_word_embeddings=True)
    torch.manual_seed(2)
    m = Qwen3ForCausalLM(Qwen3Config(**{k: v for k, v in d.items()
                                        if k != "architectures"})).eval()
    check_parity(m, d)


def test_qwen2_bias_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    d = dict(architectures=["Qwen2ForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, intermediate_size=128,
             rms_norm_eps=1e-6, rope_theta=10000.0,
             max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(3)
    m = Qwen2ForCausalLM(Qwen2Config(**{k: v for k, v in d.items()
                                        if k != "architectures"})).eval()
    check_parity(m, d)


def test_mistral_sliding_window_parity():
    from transformers import MistralConfig, MistralForCausalLM
    d = dict(architectures=["MistralForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, intermediate_size=128,
             rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
             max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(4)
    m = MistralForCausalLM(MistralConfig(**{k: v for k, v in d.items()
                                            if k != "architectures"})).eval()
    check_parity(m, d, n_tokens=24)


def test_qwen3_moe_parity():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    d = dict(architectures=["Qwen3MoeForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, head_dim=16, intermediate_size=128,
             moe_intermediate_size=32, num_experts=8, num_experts_per_tok=2,
             norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
             rms_norm_eps=1e-6, rope_theta=10000.0,
             max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(5)
    m = Qwen3MoeForCausalLM(Qwen3MoeConfig(
        **{k: v for k, v in d.items() if k != "architectures"})).eval()
    check_parity(m, d, rtol=5e-4, atol=5e-4)


def test_decode_path_parity_with_hf_generate():
    """Greedy continuation through OUR decode path vs HF greedy generate."""
    from transformers import Qwen3Config, Qwen3ForCausalLM
    d = dict(architectures=["Qwen3ForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, head_dim=16, intermediate_size=128,
             rms_norm_eps=1e-6, rope_theta=10000.0,
             max_position_embeddings=512, tie_word_embeddings=True)
    torch.manual_seed(6)
    m = Qwen3ForCausalLM(Qwen3Config(**{k: v for k, v in d.items()
                                        if k != "architectures"})).eval()
    cfg = config_from_hf_dict(d)
    params = params_from_hf(cfg, TensorSource(state_dict_np(m)),
                            dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, 10).tolist()
    n_new = 8

    with torch.no_grad():
        out = m.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                         do_sample=False, use_cache=True,
                         pad_token_id=0)
    want = out[0, 10:].tolist()

    # Ours: prefill then token-by-token decode.
    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    t = len(prompt)
    tpad = 16
    toks = np.zeros(tpad, np.int32); toks[:t] = prompt
    pos = np.full(tpad, CTX + 99, np.int32); pos[:t] = np.arange(t)
    table = np.arange(MAXP, dtype=np.int32)
    flat = np.full(tpad, OOB, np.int32)
    flat[:t] = np.arange(t)
    h, kv = prefill_forward(params, cfg, kv, jnp.asarray(toks),
                            jnp.asarray(pos), jnp.asarray(table),
                            jnp.asarray(t, jnp.int32), jnp.asarray(flat),
                            ctx_pad=CTX)
    logits = np.asarray(logits_from_hidden(params, cfg, h[t - 1:t]))
    got = [int(np.argmax(logits))]
    s = 4
    for step in range(1, n_new):
        cur = t + step - 1  # position of the token being fed
        toks_d = np.zeros(s, np.int32); toks_d[0] = got[-1]
        pos_d = np.zeros(s, np.int32); pos_d[0] = cur
        tables = np.zeros((s, MAXP), np.int32); tables[0] = table
        lens = np.zeros(s, np.int32); lens[0] = cur + 1
        flat_d = np.full(s, OOB, np.int32)
        flat_d[0] = cur
        h, kv = decode_forward(params, cfg, kv, jnp.asarray(toks_d),
                               jnp.asarray(pos_d), jnp.asarray(tables),
                               jnp.asarray(lens), jnp.asarray(flat_d),
                               ctx_pad=CTX)
        lg = np.asarray(logits_from_hidden(params, cfg, h[:1]))
        got.append(int(np.argmax(lg)))
    assert got == want


def test_gemma3_parity():
    """Gemma3: sandwich norms, gemma-style (1+w) RMS, GeGLU, qk-norm,
    local/global layer_types, query_pre_attn_scalar, sqrt(H) embedding
    scaling (ref: registry.rs:34-38 gemma3 lane)."""
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    d = dict(architectures=["Gemma3ForCausalLM"], vocab_size=128,
             hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=16, intermediate_size=128,
             rms_norm_eps=1e-6, rope_theta=10000.0,
             rope_local_base_freq=10000.0, sliding_window=8,
             query_pre_attn_scalar=16.0,
             layer_types=["sliding_attention", "sliding_attention",
                          "sliding_attention", "full_attention"],
             max_position_embeddings=512, tie_word_embeddings=True)
    torch.manual_seed(8)
    m = Gemma3ForCausalLM(Gemma3TextConfig(
        **{k: v for k, v in d.items() if k != "architectures"})).eval()
    check_parity(m, d, n_tokens=24, rtol=6e-4, atol=6e-4)
