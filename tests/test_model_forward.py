"""Model forward correctness on the paged-KV path (CPU, tiny configs).

Strategy (the reference's parity-ladder, SURVEY §4.5-4.6): the
whole-prompt prefill is the oracle; chunked prefill and step-by-step
decode must reproduce its hidden states/logits bit-closely.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ferrum_tpu.models.configs import ModelConfig, MoeConfig
from ferrum_tpu.models.llama_family import (
    PagedKvCache, decode_forward, init_random_params, logits_from_hidden,
    prefill_forward,
)

PAGE = 4
NUM_BLOCKS = 64
from ferrum_tpu.models.llama_family import OOB_SENTINEL as OOB
CTX = 64
MAXP = CTX // PAGE


def make_cache(cfg):
    return PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)


def prefill_whole(params, cfg, kv, tokens, block_ids):
    """Prefill all tokens in one chunk; returns (hidden, kv)."""
    t = len(tokens)
    tpad = 16 * ((t + 15) // 16)
    toks = np.zeros(tpad, np.int32)
    toks[:t] = tokens
    pos = np.full(tpad, CTX + 99, np.int32)
    pos[:t] = np.arange(t)
    table = np.zeros(MAXP, np.int32)
    table[:len(block_ids)] = block_ids
    flat = np.full(tpad, OOB, np.int32)
    flat[:t] = [block_ids[p // PAGE] * PAGE + p % PAGE for p in range(t)]
    h, kv = prefill_forward(
        params, cfg, kv, jnp.asarray(toks), jnp.asarray(pos),
        jnp.asarray(table), jnp.asarray(t, jnp.int32), jnp.asarray(flat),
        ctx_pad=CTX)
    return np.asarray(h[:t]), kv


@pytest.fixture(scope="module")
def setup(request):
    cfg = ModelConfig(
        family="qwen3", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        qk_norm=True, tie_word_embeddings=True, rope_theta=10000.0)
    params = init_random_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def test_chunked_prefill_matches_whole(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 128, 24).tolist()
    block_ids = list(range(6))

    h_whole, _ = prefill_whole(params, cfg, make_cache(cfg), tokens, block_ids)

    # Two chunks: 16 + 8.
    kv = make_cache(cfg)
    outs = []
    for start, n in ((0, 16), (16, 8)):
        toks = np.zeros(16, np.int32)
        toks[:n] = tokens[start:start + n]
        pos = np.full(16, CTX + 99, np.int32)
        pos[:n] = np.arange(start, start + n)
        table = np.zeros(MAXP, np.int32)
        table[:6] = block_ids
        flat = np.full(16, OOB, np.int32)
        flat[:n] = [block_ids[p // PAGE] * PAGE + p % PAGE
                    for p in range(start, start + n)]
        h, kv = prefill_forward(
            params, cfg, kv, jnp.asarray(toks), jnp.asarray(pos),
            jnp.asarray(table), jnp.asarray(start + n, jnp.int32),
            jnp.asarray(flat), ctx_pad=CTX)
        outs.append(np.asarray(h[:n]))
    h_chunked = np.concatenate(outs)
    np.testing.assert_allclose(h_chunked, h_whole, rtol=2e-5, atol=2e-5)


def test_decode_matches_prefill(setup):
    """Prefill N tokens, decode token N — logits must equal a whole
    (N+1)-token prefill's last-token logits."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 128, 13).tolist()
    nxt = int(rng.integers(0, 128))
    block_ids = list(range(4))

    h_all, _ = prefill_whole(params, cfg, make_cache(cfg),
                             tokens + [nxt], block_ids)
    want = np.asarray(logits_from_hidden(params, cfg, jnp.asarray(h_all[-1:])))

    kv = make_cache(cfg)
    _, kv = prefill_whole(params, cfg, kv, tokens, block_ids)

    s = 4  # decode batch slots; only slot 0 active
    toks = np.zeros(s, np.int32)
    toks[0] = nxt
    pos = np.zeros(s, np.int32)
    pos[0] = 13
    tables = np.zeros((s, MAXP), np.int32)
    tables[0, :4] = block_ids
    lens = np.zeros(s, np.int32)
    lens[0] = 14
    flat = np.full(s, OOB, np.int32)
    flat[0] = block_ids[13 // PAGE] * PAGE + 13 % PAGE
    h, kv = decode_forward(
        params, cfg, kv, jnp.asarray(toks), jnp.asarray(pos),
        jnp.asarray(tables), jnp.asarray(lens), jnp.asarray(flat),
        ctx_pad=16)
    got = np.asarray(logits_from_hidden(params, cfg, h[:1]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.argmax(got) == np.argmax(want)


def test_batched_decode_isolation(setup):
    """Two sequences decoding in the same batch produce the same logits
    as each decoding alone (no cross-slot leakage)."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    t1 = rng.integers(0, 128, 9).tolist()
    t2 = rng.integers(0, 128, 6).tolist()

    def solo(tokens, blocks, kv):
        _, kv = prefill_whole(params, cfg, kv, tokens, blocks)
        return kv

    kv = make_cache(cfg)
    b1, b2 = [0, 1, 2], [8, 9]
    kv = solo(t1, b1, kv)
    kv = solo(t2, b2, kv)

    def dec(slots_toks, slots_pos, tables, lens, flats, kvx):
        h, kvx = decode_forward(
            params, cfg, kvx, jnp.asarray(slots_toks), jnp.asarray(slots_pos),
            jnp.asarray(tables), jnp.asarray(lens), jnp.asarray(flats),
            ctx_pad=16)
        return np.asarray(logits_from_hidden(params, cfg, h)), kvx

    s = 4
    tables = np.zeros((s, MAXP), np.int32)
    tables[0, :3] = b1
    tables[1, :2] = b2
    toks = np.zeros(s, np.int32)
    toks[0], toks[1] = 100, 101
    pos = np.zeros(s, np.int32)
    pos[0], pos[1] = 9, 6
    lens = np.zeros(s, np.int32)
    lens[0], lens[1] = 10, 7
    flat = np.full(s, OOB, np.int32)
    flat[0] = b1[9 // PAGE] * PAGE + 1
    flat[1] = b2[6 // PAGE] * PAGE + 2
    both, _ = dec(toks, pos, tables, lens, flat, kv)

    # Solo slot 1 only.
    tables1 = np.zeros((s, MAXP), np.int32)
    tables1[0, :2] = b2
    toks1 = np.zeros(s, np.int32)
    toks1[0] = 101
    pos1 = np.zeros(s, np.int32)
    pos1[0] = 6
    lens1 = np.zeros(s, np.int32)
    lens1[0] = 7
    flat1 = np.full(s, OOB, np.int32)
    flat1[0] = b2[6 // PAGE] * PAGE + 2
    solo2, _ = dec(toks1, pos1, tables1, lens1, flat1, kv)
    np.testing.assert_allclose(both[1], solo2[0], rtol=2e-5, atol=2e-5)


def test_moe_model_forward_runs():
    cfg = ModelConfig(
        family="qwen3_moe", vocab_size=64, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        qk_norm=True, tie_word_embeddings=True,
        moe=MoeConfig(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=16))
    params = init_random_params(cfg, seed=0, dtype=jnp.float32)
    h, _ = prefill_whole(params, cfg, make_cache(cfg),
                         list(range(10)), [0, 1, 2])
    assert h.shape == (10, 32)
    assert np.isfinite(h).all()


def test_sliding_window_masks_history(setup):
    """Mistral-style sliding window: with window w, a decode at position
    p must ignore tokens < p+1-w. Verify by corrupting old KV."""
    cfg, params = setup
    import dataclasses
    cfg_sw = dataclasses.replace(cfg, sliding_window=4)
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 128, 10).tolist()
    blocks = [0, 1, 2]

    kv = make_cache(cfg_sw)
    _, kv = prefill_whole(params, cfg_sw, kv, tokens, blocks)

    def decode_with(kvx):
        s = 4
        toks = np.zeros(s, np.int32); toks[0] = 5
        pos = np.zeros(s, np.int32); pos[0] = 10
        tables = np.zeros((s, MAXP), np.int32); tables[0, :3] = blocks
        lens = np.zeros(s, np.int32); lens[0] = 11
        flat = np.full(s, OOB, np.int32)
        flat[0] = blocks[2] * PAGE + 2
        h, _ = decode_forward(params, cfg_sw, kvx, jnp.asarray(toks),
                              jnp.asarray(pos), jnp.asarray(tables),
                              jnp.asarray(lens), jnp.asarray(flat), ctx_pad=16)
        return np.asarray(h[0])

    clean = decode_with(kv)
    # Corrupt KV of positions 0..5 (outside window [7..10] for pos 10).
    k = np.array(kv.k)
    k[:, blocks[0], :, :] = 1e3   # positions 0..3
    k[:, blocks[1], :2, :] = 1e3  # positions 4..5
    kv_bad = PagedKvCache(k=jnp.asarray(k), v=kv.v, page=kv.page,
                          kv_heads=kv.kv_heads, head_dim=kv.head_dim)
    dirty = decode_with(kv_bad)
    np.testing.assert_allclose(clean, dirty, rtol=1e-6, atol=1e-6)


def test_batched_prefill_matches_sequential(setup):
    """prefill_forward_batched(B=3) must reproduce per-sequence
    prefill_forward exactly: hidden states and written KV pages."""
    from ferrum_tpu.models.llama_family import prefill_forward_batched

    cfg, params = setup
    rng = np.random.default_rng(7)
    lens = [10, 16, 5]
    seqs = [rng.integers(1, 100, n).tolist() for n in lens]
    # Disjoint block ranges per sequence.
    blocks = [list(range(1 + 8 * i, 1 + 8 * i + MAXP)) for i in range(3)]

    # Oracle: one prefill_forward per sequence into the same cache.
    kv_seq = make_cache(cfg)
    hs_seq = []
    for toks, bl in zip(seqs, blocks):
        h, kv_seq = prefill_whole(params, cfg, kv_seq, toks, bl)
        hs_seq.append(h)

    # Batched: all three chunks in one call.
    kv_b = make_cache(cfg)
    b, tpad = 3, 16
    tokens = np.zeros((b, tpad), np.int32)
    positions = np.full((b, tpad), CTX + 99, np.int32)
    tables = np.zeros((b, MAXP), np.int32)
    totals = np.zeros(b, np.int32)
    flats = np.full((b, tpad), OOB, np.int32)
    for i, (toks, bl) in enumerate(zip(seqs, blocks)):
        n = len(toks)
        tokens[i, :n] = toks
        positions[i, :n] = np.arange(n)
        tables[i, :len(bl)] = bl
        totals[i] = n
        flats[i, :n] = [bl[p // PAGE] * PAGE + p % PAGE for p in range(n)]
    h_b, kv_b = prefill_forward_batched(
        params, cfg, kv_b, jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(tables), jnp.asarray(totals), jnp.asarray(flats),
        ctx_pad=CTX)
    h_b = np.asarray(h_b)

    for i, n in enumerate(lens):
        np.testing.assert_allclose(h_b[i, :n], hs_seq[i],
                                   rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kv_b.k), np.asarray(kv_seq.k),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kv_b.v), np.asarray(kv_seq.v),
                               rtol=2e-5, atol=2e-5)
