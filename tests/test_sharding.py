"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates that TP sharding (NamedSharding specs from parallel/mesh.py)
preserves numerics exactly vs single-device execution — the analog of
the reference's tp_sharding_test.rs, but executed on a real (virtual)
mesh instead of checking shard math alone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ferrum_tpu.models.configs import ModelConfig
from ferrum_tpu.models.llama_family import (
    PagedKvCache, decode_forward, init_random_params, logits_from_hidden,
    prefill_forward,
)
from ferrum_tpu.parallel.mesh import make_mesh, shard_kv, shard_params

PAGE = 8
NUM_BLOCKS = 16
from ferrum_tpu.models.llama_family import OOB_SENTINEL as OOB
CTX = 32
MAXP = 8


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        family="qwen3", vocab_size=128, hidden_size=64, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=16, intermediate_size=128,
        qk_norm=True, tie_word_embeddings=False, rope_theta=10000.0)
    params = init_random_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def run_decode(cfg, params, kv):
    s = 4
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


@pytest.mark.slow  # suite governance: <10 min default lane
def test_tp_decode_matches_single_device(setup):
    cfg, params = setup
    assert jax.device_count() >= 4

    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want, _ = run_decode(cfg, params, kv)

    for tp in (2, 4):
        mesh = make_mesh(tp=tp)
        sp = shard_params(params, cfg, mesh)
        skv = shard_kv(PagedKvCache.create(cfg, NUM_BLOCKS, PAGE,
                                           dtype=jnp.float32), mesh)
        got, kv2 = run_decode(cfg, sp, skv)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # KV writes must land identically.
        assert np.asarray(kv2.k).shape == (2, NUM_BLOCKS, PAGE, 64)


def test_tp_prefill_matches_single_device(setup):
    cfg, params = setup
    tokens = list(range(10, 22))
    t = len(tokens)

    def prefill(p, kvx):
        tpad = 16
        toks = np.zeros(tpad, np.int32); toks[:t] = tokens
        pos = np.full(tpad, CTX + 99, np.int32); pos[:t] = np.arange(t)
        table = np.zeros(MAXP, np.int32); table[:2] = [3, 4]
        flat = np.full(tpad, OOB, np.int32)
        flat[:t] = [[3, 4][p_ // PAGE] * PAGE + p_ % PAGE for p_ in range(t)]
        h, _ = prefill_forward(p, cfg, kvx, jnp.asarray(toks),
                               jnp.asarray(pos), jnp.asarray(table),
                               jnp.asarray(t, jnp.int32), jnp.asarray(flat),
                               ctx_pad=CTX)
        return np.asarray(h[:t])

    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want = prefill(params, kv)
    mesh = make_mesh(tp=2)
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(PagedKvCache.create(cfg, NUM_BLOCKS, PAGE,
                                       dtype=jnp.float32), mesh)
    got = prefill(sp, skv)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dp_x_tp_mesh_shapes(setup):
    cfg, params = setup
    mesh = make_mesh(tp=2, dp=2)
    assert mesh.shape == {"data": 2, "model": 2}
    sp = shard_params(params, cfg, mesh)
    # Column-sharded q: out dim split over 'model', replicated over 'data'.
    q = sp.layers[0].q.w
    assert q.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "model")), q.ndim)
