"""70B-class sharded run on the virtual mesh (VERDICT r2 missing #3).

Builds a Llama-3.3-70B-shaped model — layer-truncated to 2 layers for
host RAM, true per-layer shapes: hidden 8192, 64 q / 8 kv heads at
head_dim 128, intermediate 28672 — as int4 QuantLinearParams, shards
it TP=4 per parallel/mesh.py (the placement parallel/fit.py proves
fits 4x16 GB v5e chips), and parity-checks decode + prefill against
single-device execution. Vocab is truncated (embeddings are not
per-layer shapes) to keep the CPU test fast.

ref: the reference demonstrates 70B-class serving via the 2-GPU layer
split (crates/ferrum-engine/src/layer_split.rs:1-60); here the story
is TP over ICI with XLA collectives.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ferrum_tpu.models.configs import preset
from ferrum_tpu.models.llama_family import (
    OOB_SENTINEL as OOB, PagedKvCache, decode_forward, logits_from_hidden,
    prefill_forward,
)
from ferrum_tpu.models.quantize import init_random_quant_params
from ferrum_tpu.parallel.mesh import make_mesh, shard_kv, shard_params

PAGE = 8
NUM_BLOCKS = 16
CTX = 32
MAXP = 8


# Heavyweight parity/cluster lane: opt-in via `pytest -m slow`
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def llama70b():
    cfg = dataclasses.replace(preset("llama-3.3-70b"),
                              num_layers=2, vocab_size=4096)
    params = init_random_quant_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def _decode(cfg, params, kv, s=4):
    toks = np.zeros(s, np.int32); toks[0] = 7; toks[1] = 9
    pos = np.zeros(s, np.int32); pos[0] = 3; pos[1] = 2
    tables = np.zeros((s, MAXP), np.int32)
    tables[0, 0] = 1
    tables[1, 0] = 2
    lens = np.zeros(s, np.int32); lens[0] = 4; lens[1] = 3
    flat = np.full(s, OOB, np.int32)
    flat[0] = 1 * PAGE + 3
    flat[1] = 2 * PAGE + 2
    h, kv2 = decode_forward(params, cfg, kv, jnp.asarray(toks),
                            jnp.asarray(pos), jnp.asarray(tables),
                            jnp.asarray(lens), jnp.asarray(flat),
                            ctx_pad=CTX)
    return np.asarray(logits_from_hidden(params, cfg, h)), kv2


def test_tp4_70b_decode_prefill_parity(llama70b):
    cfg, params = llama70b
    assert jax.device_count() >= 4

    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want, _ = _decode(cfg, params, kv)

    mesh = make_mesh(tp=4)
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(PagedKvCache.create(cfg, NUM_BLOCKS, PAGE,
                                       dtype=jnp.float32), mesh)
    got, kv2 = _decode(cfg, sp, skv)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # Prefill on the same sharded instance.
    tokens = list(range(10, 22))
    t = len(tokens)
    tpad = 16
    toks = np.zeros(tpad, np.int32); toks[:t] = tokens
    pos = np.full(tpad, CTX + 99, np.int32); pos[:t] = np.arange(t)
    table = np.zeros(MAXP, np.int32); table[:2] = [3, 4]
    flat = np.full(tpad, OOB, np.int32)
    flat[:t] = [[3, 4][p // PAGE] * PAGE + p % PAGE for p in range(t)]

    def prefill(p, kvx):
        h, _ = prefill_forward(p, cfg, kvx, jnp.asarray(toks),
                               jnp.asarray(pos), jnp.asarray(table),
                               jnp.asarray(t, jnp.int32), jnp.asarray(flat),
                               ctx_pad=CTX)
        return np.asarray(h[:t])

    kv_s = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want_p = prefill(params, kv_s)
    got_p = prefill(sp, shard_kv(
        PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32),
        mesh))
    np.testing.assert_allclose(got_p, want_p, rtol=2e-4, atol=2e-4)
