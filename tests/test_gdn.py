"""Gated-DeltaNet mixer parity vs transformers' Qwen3Next eager path.

The HF torch fallback (torch_chunk_gated_delta_rule /
torch_recurrent_gated_delta_rule + torch_causal_conv1d_update) is the
public oracle for the reference's gated_delta_rule.cu kernels; our jnp
implementation must reproduce it bit-for-bit up to f32 accumulation
order."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from ferrum_tpu.models.configs import GdnConfig, ModelConfig
from ferrum_tpu.models.gdn import (
    GdnLayerParams, gdn_decode_step, gdn_prefill_chunk, init_gdn_layer,
)
from ferrum_tpu.ops.linear import DenseLinearParams

HK, HV, DK, DV, K = 2, 4, 8, 12, 4
H = 32

CFG = ModelConfig(
    family="qwen3_next", hidden_size=H, rms_norm_eps=1e-6,
    gdn=GdnConfig(num_key_heads=HK, num_value_heads=HV,
                  key_head_dim=DK, value_head_dim=DV, conv_kernel_dim=K),
    layer_types=("linear_attention",))


def hf_module():
    from transformers.models.qwen3_next.configuration_qwen3_next import (
        Qwen3NextConfig,
    )
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        Qwen3NextGatedDeltaNet, torch_chunk_gated_delta_rule,
        torch_recurrent_gated_delta_rule,
    )
    cfg = Qwen3NextConfig(
        hidden_size=H, linear_num_key_heads=HK, linear_num_value_heads=HV,
        linear_key_head_dim=DK, linear_value_head_dim=DV,
        linear_conv_kernel_dim=K, rms_norm_eps=1e-6, hidden_act="silu")
    torch.manual_seed(0)
    mod = Qwen3NextGatedDeltaNet(cfg, layer_idx=0).float().eval()
    # Force the torch fallbacks (no causal-conv1d / fla deps here).
    mod.chunk_gated_delta_rule = torch_chunk_gated_delta_rule
    mod.recurrent_gated_delta_rule = torch_recurrent_gated_delta_rule
    return mod


def params_from_hf(mod) -> GdnLayerParams:
    t = lambda w: jnp.asarray(w.detach().numpy())  # noqa: E731
    return GdnLayerParams(
        in_qkvz=DenseLinearParams(w=t(mod.in_proj_qkvz.weight).T,
                                  bias=None),
        in_ba=DenseLinearParams(w=t(mod.in_proj_ba.weight).T, bias=None),
        conv_w=t(mod.conv1d.weight)[:, 0, :],
        a_log=t(mod.A_log),
        dt_bias=t(mod.dt_bias),
        norm_w=t(mod.norm.weight),
        out=DenseLinearParams(w=t(mod.out_proj.weight).T, bias=None),
    )


@pytest.fixture(scope="module")
def oracle():
    mod = hf_module()
    return mod, params_from_hf(mod)


def test_prefill_matches_hf(oracle):
    mod, p = oracle
    rng = np.random.default_rng(0)
    T = 10
    x = rng.normal(0, 1, (1, T, H)).astype(np.float32)
    with torch.no_grad():
        want = mod(torch.from_numpy(x)).numpy()

    conv0 = jnp.zeros((1, 2 * HK * DK + HV * DV, K - 1), jnp.float32)
    delta0 = jnp.zeros((1, HV, DK, DV), jnp.float32)
    got, conv1, delta1 = gdn_prefill_chunk(
        CFG, p, jnp.asarray(x), conv0, delta0,
        jnp.ones((1, T), bool))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4,
                               rtol=2e-3)


def test_decode_continuation_matches_hf_full_forward(oracle):
    """prefill(T) + n decode steps == HF forward over T+n tokens."""
    mod, p = oracle
    rng = np.random.default_rng(1)
    T, n = 7, 5
    x_all = rng.normal(0, 1, (1, T + n, H)).astype(np.float32)
    with torch.no_grad():
        want = mod(torch.from_numpy(x_all)).numpy()

    conv = jnp.zeros((1, 2 * HK * DK + HV * DV, K - 1), jnp.float32)
    delta = jnp.zeros((1, HV, DK, DV), jnp.float32)
    got_pre, conv, delta = gdn_prefill_chunk(
        CFG, p, jnp.asarray(x_all[:, :T]), conv, delta,
        jnp.ones((1, T), bool))
    np.testing.assert_allclose(np.asarray(got_pre), want[:, :T],
                               atol=2e-4, rtol=2e-3)
    for i in range(n):
        out, conv, delta = gdn_decode_step(
            CFG, p, jnp.asarray(x_all[:, T + i]), conv, delta,
            jnp.ones((1,), bool))
        np.testing.assert_allclose(np.asarray(out), want[:, T + i],
                                   atol=3e-4, rtol=3e-3,
                                   err_msg=f"step {i}")


@pytest.mark.slow  # suite governance: <10 min default lane
def test_padded_batched_prefill_matches_per_row(oracle):
    """Rows with different real lengths in one padded chunk produce the
    same outputs/states as per-row unpadded runs; pad steps don't touch
    state."""
    _, p = oracle
    rng = np.random.default_rng(2)
    lens = [5, 9, 2]
    tpad = 9
    xs = [rng.normal(0, 1, (1, n, H)).astype(np.float32) for n in lens]

    conv_b = jnp.zeros((3, 2 * HK * DK + HV * DV, K - 1), jnp.float32)
    delta_b = jnp.zeros((3, HV, DK, DV), jnp.float32)
    xb = np.zeros((3, tpad, H), np.float32)
    valid = np.zeros((3, tpad), bool)
    for i, (x, n) in enumerate(zip(xs, lens)):
        xb[i, :n] = x[0]
        valid[i, :n] = True
        xb[i, n:] = 99.0  # poison pads
    got, conv_b2, delta_b2 = gdn_prefill_chunk(
        CFG, p, jnp.asarray(xb), conv_b, delta_b, jnp.asarray(valid))

    for i, (x, n) in enumerate(zip(xs, lens)):
        conv0 = jnp.zeros((1, 2 * HK * DK + HV * DV, K - 1), jnp.float32)
        delta0 = jnp.zeros((1, HV, DK, DV), jnp.float32)
        want, conv1, delta1 = gdn_prefill_chunk(
            CFG, p, jnp.asarray(x), conv0, delta0, jnp.ones((1, n), bool))
        np.testing.assert_allclose(np.asarray(got[i, :n]),
                                   np.asarray(want[0]), atol=1e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(conv_b2[i]),
                                   np.asarray(conv1[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(delta_b2[i]),
                                   np.asarray(delta1[0]), atol=1e-4)


def test_inactive_decode_slot_keeps_state(oracle):
    _, p = oracle
    rng = np.random.default_rng(3)
    conv = jnp.asarray(rng.normal(
        0, 1, (2, 2 * HK * DK + HV * DV, K - 1)).astype(np.float32))
    delta = jnp.asarray(rng.normal(
        0, 1, (2, HV, DK, DV)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (2, H)).astype(np.float32))
    _, conv2, delta2 = gdn_decode_step(
        CFG, p, x, conv, delta, jnp.asarray([True, False]))
    assert not np.allclose(np.asarray(conv2[0]), np.asarray(conv[0]))
    np.testing.assert_array_equal(np.asarray(conv2[1]),
                                  np.asarray(conv[1]))
    np.testing.assert_array_equal(np.asarray(delta2[1]),
                                  np.asarray(delta[1]))


def test_init_random_shapes():
    p = init_gdn_layer(CFG, np.random.default_rng(0), dtype=jnp.float32)
    conv_dim = 2 * HK * DK + HV * DV
    assert p.conv_w.shape == (conv_dim, K)
    assert p.a_log.shape == (HV,)
    x = jnp.ones((3, H), jnp.float32)
    out, c2, d2 = gdn_decode_step(
        CFG, p, x, jnp.zeros((3, conv_dim, K - 1), jnp.float32),
        jnp.zeros((3, HV, DK, DV), jnp.float32), jnp.ones(3, bool))
    assert out.shape == (3, H)


def test_blocked_prefill_matches_sequential_scan(oracle):
    """The WY-form blocked recurrence (_gdn_prefill_blocked) reproduces
    the per-position sequential scan across multiple blocks, a carried-in
    nonzero state, and trailing pads (outputs compared on valid tokens;
    carried states everywhere)."""
    from ferrum_tpu.models.gdn import (
        _gdn_prefill_blocked, _gdn_prefill_sequential,
    )
    _, p = oracle
    rng = np.random.default_rng(7)
    bsz, tpad = 3, 24
    lens = [24, 17, 9]
    conv_dim = 2 * HK * DK + HV * DV
    conv0 = jnp.asarray(rng.normal(
        0, 1, (bsz, conv_dim, K - 1)).astype(np.float32))
    delta0 = jnp.asarray(rng.normal(
        0, 0.5, (bsz, HV, DK, DV)).astype(np.float32))
    xb = rng.normal(0, 1, (bsz, tpad, H)).astype(np.float32)
    valid = np.zeros((bsz, tpad), bool)
    for i, n in enumerate(lens):
        valid[i, :n] = True
        xb[i, n:] = 99.0  # poison pads
    x = jnp.asarray(xb)
    v = jnp.asarray(valid)

    want, conv_s, delta_s = _gdn_prefill_sequential(
        CFG, p, x, conv0, delta0, v)
    for block in (4, 8, 24):
        got, conv_b, delta_b = _gdn_prefill_blocked(
            CFG, p, x, conv0, delta0, v, block)
        for i, n in enumerate(lens):
            np.testing.assert_allclose(
                np.asarray(got[i, :n]), np.asarray(want[i, :n]),
                atol=2e-4, rtol=2e-3, err_msg=f"block={block} row={i}")
        np.testing.assert_allclose(np.asarray(conv_b),
                                   np.asarray(conv_s), atol=1e-5)
        np.testing.assert_allclose(np.asarray(delta_b),
                                   np.asarray(delta_s), atol=1e-4,
                                   rtol=1e-3)


def test_prefill_chunk_dispatch_fallback():
    """Non-divisible T or block=0 falls back to the sequential path."""
    p = init_gdn_layer(CFG, np.random.default_rng(0), dtype=jnp.float32)
    conv_dim = 2 * HK * DK + HV * DV
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1, (1, 10, H)).astype(np.float32))
    conv0 = jnp.zeros((1, conv_dim, K - 1), jnp.float32)
    delta0 = jnp.zeros((1, HV, DK, DV), jnp.float32)
    v = jnp.ones((1, 10), bool)
    base, c0, d0 = gdn_prefill_chunk(CFG, p, x, conv0, delta0, v, block=0)
    # block=7 does not divide 10 -> sequential; block=5 -> blocked.
    for blk in (7, 5, 10):
        out, c2, d2 = gdn_prefill_chunk(CFG, p, x, conv0, delta0, v,
                                        block=blk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d0),
                                   atol=1e-4, rtol=1e-3)
