"""Sharded HBM fit plans (parallel/fit.py) — the 70B-class story
(ref: layer_split.rs 2x24GB planning; VERDICT r1 item #39)."""

from ferrum_tpu.models.configs import preset
from ferrum_tpu.parallel.fit import plan_fit


def plan(name, tp, **kw):
    return plan_fit(preset(name), name, tp=tp, **kw)


def test_8b_fits_one_chip():
    p = plan("llama-3.1-8b", 1, max_model_len=1024)
    assert p.fits and p.max_full_len_seqs >= 32
    assert p.weights_per_chip < 7 * 2**30


def test_30b_moe_needs_tp2():
    assert not plan("qwen3-30b-a3b", 1).fits      # ~16.5 GB > 12.5 usable
    p2 = plan("qwen3-30b-a3b", 2)
    assert p2.fits and p2.max_kv_tokens > 32 * 1024
    p4 = plan("qwen3-30b-a3b", 4)
    assert p4.max_kv_tokens > p2.max_kv_tokens


def test_15b_moe_single_chip_lane():
    p = plan("qwen3-15b-a3b", 1, max_model_len=1024)
    assert p.fits and p.max_full_len_seqs >= 32


def test_70b_story():
    """Llama-3.3-70B int4: no 1/2-chip fit; TP=4 fits with a usable KV
    pool; TP=8 serves 4k contexts at scale."""
    assert not plan("llama-3.3-70b", 1).fits
    assert not plan("llama-3.3-70b", 2).fits
    p4 = plan("llama-3.3-70b", 4)
    assert p4.fits, p4.as_dict()
    p8 = plan("llama-3.3-70b", 8)
    assert p8.fits and p8.max_full_len_seqs >= 16, p8.as_dict()


def test_int8_kv_doubles_tokens():
    a = plan("llama-3.1-8b", 1)
    b = plan("llama-3.1-8b", 1, kv_dtype="int8")
    assert b.max_kv_tokens > 1.7 * a.max_kv_tokens


def test_bf16_vs_int4_weights():
    q = plan("llama-3.3-70b", 8)
    d = plan("llama-3.3-70b", 8, quant="none")
    assert d.weights_per_chip > 3.4 * q.weights_per_chip
