"""Per-bucket decode-window lengths (EngineConfig.decode_t_spec):
low-occupancy buckets run longer windows to amortize the fixed
per-dispatch cost (~16-19 ms on the tunneled chip) without adding
compiled variants — exactly one T per bucket (VERDICT r4 #6, c=1 TPOT).
"""

import sys
import threading
from pathlib import Path

import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_engine_e2e import tiny_engine  # noqa: E402

from ferrum_tpu.config import EngineConfig  # noqa: E402
from ferrum_tpu.engine.builder import EngineBuilder  # noqa: E402
from ferrum_tpu.models.configs import ModelConfig  # noqa: E402
from ferrum_tpu.models.llama_family import init_random_params  # noqa: E402
from ferrum_tpu.tokenizer import make_byte_tokenizer  # noqa: E402
from ferrum_tpu.types import InferenceRequest, SamplingParams  # noqa: E402


def test_t_for_bucket_parsing():
    cfg = EngineConfig(model="t", decode_multi_step=8,
                       decode_t_spec="1:32,8:16")
    assert cfg.t_for_bucket(1) == 32
    assert cfg.t_for_bucket(8) == 16
    assert cfg.t_for_bucket(4) == 8          # unlisted -> base
    cfg2 = EngineConfig(model="t", decode_multi_step=4)
    assert cfg2.t_for_bucket(1) == 4


def _spec_engine(**kw):
    cfg = EngineConfig(
        model="tspec", max_num_seqs=8, kv_num_blocks=128,
        kv_block_size=8, max_model_len=256, max_num_batched_tokens=128,
        prefill_chunk_size=32, enable_prefix_cache=False,
        decode_multi_step=4, decode_bucket_spec="1,4",
        decode_t_spec="1:8,4:4", dtype="f32", kv_dtype="f32", seed=0,
        **kw)
    mc = ModelConfig(
        family="qwen3", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        qk_norm=True, tie_word_embeddings=True, rope_theta=10000.0,
        eos_token_ids=(257,))
    params = init_random_params(mc, seed=0, dtype=jnp.float32)
    tok = make_byte_tokenizer(vocab_extra=512 - 258)
    return EngineBuilder(cfg).with_model(mc, params).with_tokenizer(
        tok).build()


@pytest.fixture(scope="module")
def spec_engine():
    eng = _spec_engine()
    yield eng
    eng.stop()


def req(prompt, mt=12):
    return InferenceRequest(prompt=prompt, sampling=SamplingParams(
        max_tokens=mt, temperature=0.0, ignore_eos=True))


def test_single_lane_uses_long_windows(spec_engine):
    r = spec_engine.infer(req("solo lane check", mt=20))
    assert len(r.token_ids) == 20
    keys = spec_engine.runner._decode_multi_fns.keys()
    # bucket 1 windows ran at T=8 (the spec), never at the base T=4
    assert any(k[1] == 8 and k[2] == 1 for k in keys)
    assert not any(k[1] == 4 and k[2] == 1 for k in keys)


def test_results_match_flat_engine(spec_engine):
    """Window length is a scheduling choice — greedy tokens must be
    identical to a flat-T engine on the same weights."""
    flat = tiny_engine(max_num_seqs=8, prefix_cache=False)
    try:
        for prompt in ("alpha", "window equivalence", "longer prompt " * 3):
            a = spec_engine.infer(req(prompt, mt=16))
            b = flat.infer(req(prompt, mt=16))
            assert a.token_ids == b.token_ids, prompt
    finally:
        flat.stop()


def test_concurrent_lanes_use_bucket_t(spec_engine):
    outs = {}

    def worker(i):
        outs[i] = spec_engine.infer(req(f"lane {i}", mt=10))

    ths = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert len(outs) == 4
    assert all(len(o.token_ids) == 10 for o in outs.values())
    keys = spec_engine.runner._decode_multi_fns.keys()
    # the 4-lane bucket ran at its own T=4
    assert any(k[1] == 4 and k[2] == 4 for k in keys)


def test_warm_surface_one_t_per_bucket(spec_engine):
    """warm_decode_buckets under a T spec warms exactly the spec'd
    (bucket, T) pairs — no adaptive doubled/halved variants."""
    spec_engine.runner.warm_prefill_siblings()
    keys = list(spec_engine.runner._decode_multi_fns.keys())
    pairs = {(k[2], k[1]) for k in keys}
    for bucket, t in pairs:
        assert t == spec_engine.cfg.t_for_bucket(bucket), (bucket, t)
