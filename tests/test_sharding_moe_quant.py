"""TP=2 *quantized* MoE flagship sharding parity on the virtual mesh.

The real Qwen3-30B-A3B serving path is int4 (GPTQ layout) with
two-level w4a8 fields and grouped expert stacks, and needs TP=2 for
HBM (NOTES_ROUND2 fit plan). This builds the REAL 30B config —
layer-truncated to 2 layers for CPU RAM, true per-layer shapes:
hidden 2048, 32 q / 4 kv heads at head_dim 128, 128 experts of
moe_intermediate 768 — with int4 QuantLinearParams everywhere
(incl. scales2/chan_scale) and parity-checks decode + prefill
against single-device execution under the production shardings
(parallel/mesh.py: column/row TP for attention, EP over the expert
dim for the stacks, KV heads over 'model').

ref: the reference demonstrates the 30B on 2 GPUs via NCCL TP
(crates/ferrum-engine/src/parallel/tensor_parallel.rs); here the
same placement is NamedSharding specs and XLA inserts the ICI
collectives.
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
from ferrum_tpu.ops.quant import QuantLinearParams
from ferrum_tpu.parallel.mesh import make_mesh, shard_kv, shard_params

PAGE = 8
NUM_BLOCKS = 16
CTX = 32
MAXP = 8


# Heavyweight parity/cluster lane: opt-in via `pytest -m slow`
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def flagship():
    cfg = dataclasses.replace(preset("qwen3-30b-a3b"), num_layers=2)
    # f32 norms/scales: parity tolerances reflect reduction-order
    # differences only, not bf16 rounding.
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


def _prefill(cfg, params, kv, tokens):
    t = len(tokens)
    tpad = 16
    toks = np.zeros(tpad, np.int32); toks[:t] = tokens
    pos = np.full(tpad, CTX + 99, np.int32); pos[:t] = np.arange(t)
    table = np.zeros(MAXP, np.int32); table[:2] = [3, 4]
    flat = np.full(tpad, OOB, np.int32)
    flat[:t] = [[3, 4][p // PAGE] * PAGE + p % PAGE for p in range(t)]
    h, kv2 = prefill_forward(params, cfg, kv, jnp.asarray(toks),
                             jnp.asarray(pos), jnp.asarray(table),
                             jnp.asarray(t, jnp.int32), jnp.asarray(flat),
                             ctx_pad=CTX)
    return np.asarray(h[:t]), kv2


def test_tp2_quant_moe_decode_parity(flagship):
    cfg, params = flagship
    assert jax.device_count() >= 2

    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want, kv_w = _decode(cfg, params, kv)

    mesh = make_mesh(tp=2)
    sp = shard_params(params, cfg, mesh)
    # The expert stacks (incl. two-level fields) must shard over the
    # expert dim; attention q column-parallel; KV heads over 'model'.
    m0 = sp.layers[0].moe
    assert isinstance(m0.gate, QuantLinearParams)
    espec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("model", None, None))
    for arr in (m0.gate.qweight, m0.gate.scales, m0.gate.scales2,
                m0.down.qweight, m0.down.chan_scale):
        assert arr.sharding.is_equivalent_to(espec, arr.ndim), arr.shape
    skv = shard_kv(PagedKvCache.create(cfg, NUM_BLOCKS, PAGE,
                                       dtype=jnp.float32), mesh)
    got, kv2 = _decode(cfg, sp, skv)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # KV writes land identically (row 1*PAGE+3 of block 1, layer 0).
    np.testing.assert_allclose(
        np.asarray(kv2.k)[0, 1, 3], np.asarray(kv_w.k)[0, 1, 3],
        rtol=1e-5, atol=1e-5)


def test_tp2_quant_moe_prefill_parity(flagship):
    cfg, params = flagship
    tokens = list(range(10, 22))

    kv = PagedKvCache.create(cfg, NUM_BLOCKS, PAGE, dtype=jnp.float32)
    want, _ = _prefill(cfg, params, kv, tokens)

    mesh = make_mesh(tp=2)
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(PagedKvCache.create(cfg, NUM_BLOCKS, PAGE,
                                       dtype=jnp.float32), mesh)
    got, _ = _prefill(cfg, sp, skv, tokens)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
