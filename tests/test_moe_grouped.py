"""Grouped int4 expert GEMM parity (ops/pallas/quant_matmul.py
`_quant_grouped_2d`) — the Marlin-MoE analog
(ref: crates/ferrum-kernels/kernels/vllm_marlin_moe/ops.cu).

Kernels run in interpreter mode on CPU (the `_eq` pattern); the same
parity runs compiled on TPU via tools/tpu_kernel_check.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ferrum_tpu.ops.quant import (
    QuantLinearParams, dequantize, quantize_weight_np,
)


def make_stack(e, in_f, out_f, seed=0, dtype=jnp.bfloat16):
    # bf16 scales as in production checkpoints: the kernel's in-VMEM
    # bf16 dequant then rounds identically to the f32 oracle.
    rng = np.random.default_rng(seed)
    qws, scs, zs = [], [], []
    for _ in range(e):
        w = rng.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
        qw, sc, z = quantize_weight_np(w, group_size=128, symmetric=False)
        qws.append(qw)
        scs.append(sc)
        zs.append(z)
    return QuantLinearParams(
        qweight=jnp.asarray(np.stack(qws)),
        scales=jnp.asarray(np.stack(scs), dtype),
        zeros=jnp.asarray(np.stack(zs)), bias=None,
        in_features=in_f, out_features=out_f, group_size=128)


def ragged_oracle(x, p, group_sizes):
    # bf16 dequant mirrors the kernel's in-VMEM dequant dtype.
    w = jax.vmap(lambda qw, s, z: dequantize(
        QuantLinearParams(qweight=qw, scales=s, zeros=z, bias=None,
                          in_features=p.in_features,
                          out_features=p.out_features,
                          group_size=p.group_size), dtype=jnp.bfloat16))(
        p.qweight, p.scales, p.zeros)
    return jax.lax.ragged_dot(x.astype(jnp.float32),
                              w.astype(jnp.float32), group_sizes,
                              preferred_element_type=jnp.float32)


def run_grouped_interpret(x, p, group_sizes, **kw):
    from ferrum_tpu.ops.pallas import quant_matmul as qm

    orig = qm.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    qm.pl.pallas_call = patched
    try:
        with jax.disable_jit():
            return qm._quant_grouped_2d(x, p, group_sizes, **kw)
    finally:
        qm.pl.pallas_call = orig


@pytest.mark.parametrize("sizes", [
    # (A rows per expert) — covers boundary-straddling groups, empty
    # groups, multi-tile groups and a trailing padded region.
    (32, 32, 32, 32),            # tile-aligned
    (7, 50, 0, 71),              # straddle + empty
    (0, 0, 128, 0),              # single active expert
    (1, 1, 1, 125),              # skewed
])
def test_grouped_int4_matches_ragged_oracle(sizes):
    e, in_f, out_f = len(sizes), 256, 256
    a = 128
    assert sum(sizes) <= a
    p = make_stack(e, in_f, out_f, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (a, in_f)), jnp.float32)
    gs = jnp.asarray(np.asarray(sizes, np.int32))

    got = run_grouped_interpret(x, p, gs, bm=32)
    assert got is not None
    want = np.asarray(ragged_oracle(x, p, gs))
    real = sum(sizes)
    # bf16 in-kernel dequant: tolerance at bf16 granularity (structural
    # bugs — masking/metadata/accumulation — show up as O(1) errors).
    np.testing.assert_allclose(np.asarray(got)[:real], want[:real],
                               rtol=2e-2, atol=1e-2)


def test_grouped_int4_multi_n_tiles():
    """N > bn forces the n-grid dim; every n-tile re-walks the logical
    tiles."""
    sizes = (40, 24, 64)
    p = make_stack(len(sizes), 256, 512, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (128, 256)), jnp.float32)
    gs = jnp.asarray(np.asarray(sizes, np.int32))
    got = run_grouped_interpret(x, p, gs, bm=32, bn=256)
    want = np.asarray(ragged_oracle(x, p, gs))
    np.testing.assert_allclose(np.asarray(got)[:128], want[:128],
                               rtol=2e-2, atol=1e-2)


def test_moe_mlp_uses_padded_grouped_path():
    """moe_mlp with quantized experts matches the one-hot oracle on an
    un-aligned token count (pads internally)."""
    from ferrum_tpu.models.configs import ModelConfig, MoeConfig
    from ferrum_tpu.models.llama_family import MoeLayerParams
    from ferrum_tpu.ops.linear import DenseLinearParams
    from ferrum_tpu.ops.moe import moe_mlp, moe_mlp_ref

    h, inter, e, k = 128, 256, 4, 2
    cfg = ModelConfig(
        family="qwen3_moe", vocab_size=64, hidden_size=h, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=64, intermediate_size=inter,
        moe=MoeConfig(num_experts=e, num_experts_per_tok=k,
                      moe_intermediate_size=inter, norm_topk_prob=True))
    rng = np.random.default_rng(5)
    router = DenseLinearParams(
        w=jnp.asarray(rng.normal(0, 0.5, (h, e)), jnp.float32), bias=None)
    p = MoeLayerParams(router=router,
                       gate=make_stack(e, h, inter, seed=6),
                       up=make_stack(e, h, inter, seed=7),
                       down=make_stack(e, inter, h, seed=8))
    x = jnp.asarray(rng.normal(0, 1, (13, h)), jnp.float32)
    got = np.asarray(moe_mlp(x, p, cfg))
    # oracle needs dense stacks
    dense = MoeLayerParams(
        router=router,
        gate=jax.vmap(lambda qw, s, z: dequantize(QuantLinearParams(
            qweight=qw, scales=s, zeros=z, bias=None, in_features=h,
            out_features=inter, group_size=128), jnp.float32))(
            p.gate.qweight, p.gate.scales, p.gate.zeros),
        up=jax.vmap(lambda qw, s, z: dequantize(QuantLinearParams(
            qweight=qw, scales=s, zeros=z, bias=None, in_features=h,
            out_features=inter, group_size=128), jnp.float32))(
            p.up.qweight, p.up.scales, p.up.zeros),
        down=jax.vmap(lambda qw, s, z: dequantize(QuantLinearParams(
            qweight=qw, scales=s, zeros=z, bias=None, in_features=inter,
            out_features=h, group_size=128), jnp.float32))(
            p.down.qweight, p.down.scales, p.down.zeros))
    want = np.asarray(moe_mlp_ref(x, dense, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def _fake_gptq(in_f, out_f, group, rng):
    """AutoGPTQ-convention tensors for a known int4 weight (same recipe
    as tests/test_quant.py::TestGptqRepack)."""
    q = rng.integers(0, 16, (in_f, out_f)).astype(np.uint32)
    scales = rng.uniform(0.01, 0.02, (in_f // group, out_f)
                         ).astype(np.float32)
    zeros = rng.integers(1, 15, (in_f // group, out_f)).astype(np.int32)
    qw = np.zeros((in_f // 8, out_f), np.uint32)
    for j in range(8):
        qw |= q[j::8] << (4 * j)
    qz = np.zeros((in_f // group, out_f // 8), np.uint32)
    for j in range(8):
        qz |= ((zeros[:, j::8] - 1).astype(np.uint32)) << (4 * j)
    want = (q.astype(np.float32) - zeros[np.arange(in_f) // group]) \
        * scales[np.arange(in_f) // group]
    return qw.astype(np.int32), qz.astype(np.int32), scales, want


def test_loader_stacks_gptq_moe_experts():
    """GPTQ MoE checkpoints load into stacked QuantLinearParams (round-1
    gap: ferrum_tpu/models/loader.py read experts dense-only, so GPTQ
    Qwen3-30B-A3B could not load; ref: StackedExpertLinear,
    crates/ferrum-quantization/src/gptq.rs:154)."""
    from ferrum_tpu.models.configs import ModelConfig, MoeConfig
    from ferrum_tpu.models.loader import TensorSource, params_from_hf

    h, inter, e = 256, 256, 2
    cfg = ModelConfig(
        family="qwen3_moe", vocab_size=64, hidden_size=h, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=128, intermediate_size=inter,
        qk_norm=True, tie_word_embeddings=True,
        moe=MoeConfig(num_experts=e, num_experts_per_tok=2,
                      moe_intermediate_size=inter, norm_topk_prob=True))
    rng = np.random.default_rng(9)
    sd = {
        "model.embed_tokens.weight": rng.normal(0, 1, (64, h)).astype(
            np.float32),
        "model.norm.weight": np.ones(h, np.float32),
        "model.layers.0.input_layernorm.weight": np.ones(h, np.float32),
        "model.layers.0.post_attention_layernorm.weight":
            np.ones(h, np.float32),
        "model.layers.0.self_attn.q_norm.weight": np.ones(128, np.float32),
        "model.layers.0.self_attn.k_norm.weight": np.ones(128, np.float32),
        "model.layers.0.mlp.gate.weight": rng.normal(
            0, 1, (e, h)).astype(np.float32),
    }
    for nm, (i, o) in (("q_proj", (h, 256)), ("k_proj", (h, 128)),
                       ("v_proj", (h, 128)), ("o_proj", (256, h))):
        sd[f"model.layers.0.self_attn.{nm}.weight"] = rng.normal(
            0, 0.05, (o, i)).astype(np.float32)
    wants = {}
    for ex in range(e):
        for proj, (i, o) in (("gate_proj", (h, inter)),
                             ("up_proj", (h, inter)),
                             ("down_proj", (inter, h))):
            qw, qz, sc, want = _fake_gptq(i, o, 128, rng)
            pre = f"model.layers.0.mlp.experts.{ex}.{proj}"
            sd[f"{pre}.qweight"] = qw
            sd[f"{pre}.qzeros"] = qz
            sd[f"{pre}.scales"] = sc
            wants[(ex, proj)] = want

    params = params_from_hf(cfg, TensorSource(sd), dtype=jnp.float32)
    moe = params.layers[0].moe
    assert isinstance(moe.gate, QuantLinearParams)
    assert moe.gate.qweight.shape == (e, h // 2, inter)
    for ex in range(e):
        got = np.asarray(dequantize(QuantLinearParams(
            qweight=moe.gate.qweight[ex], scales=moe.gate.scales[ex],
            zeros=moe.gate.zeros[ex], bias=None, in_features=h,
            out_features=inter, group_size=moe.gate.group_size),
            jnp.float32))
        np.testing.assert_allclose(got, wants[(ex, "gate_proj")],
                                   rtol=1e-5, atol=1e-6)


def run_grouped_tl_interpret(xq, xs, p, group_sizes, out_dtype, **kw):
    from ferrum_tpu.ops.pallas import quant_matmul as qm

    orig = qm.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    qm.pl.pallas_call = patched
    try:
        with jax.disable_jit():
            return qm._quant_grouped_w4a8tl_2d(xq, xs, p, group_sizes,
                                               out_dtype, **kw)
    finally:
        qm.pl.pallas_call = orig


@pytest.mark.parametrize("sizes", [
    (32, 32, 32, 32),            # tile-aligned
    (7, 50, 0, 71),              # straddle + empty
    (0, 0, 128, 0),              # single active expert
])
def test_grouped_w4a8tl_matches_integer_oracle(sizes):
    """Two-level grouped kernel == per-expert jnp TL oracle
    (quant_matmul_w4a8tl_ref applied segment-wise): exact integer
    arithmetic means tight tolerances."""
    from ferrum_tpu.ops.quant import (
        quant_matmul_w4a8tl_ref, requantize_two_level,
    )

    e, in_f, out_f = len(sizes), 256, 256
    a = 128
    p = requantize_two_level(make_stack(e, in_f, out_f, seed=11))
    assert p.scales2 is not None and p.qweight.shape == (e, in_f // 2, out_f)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (a, in_f)), jnp.float32)
    gs = jnp.asarray(np.asarray(sizes, np.int32))

    from ferrum_tpu.ops.pallas.quant_matmul import quantize_activation_rows
    xq, xs = quantize_activation_rows(x)
    got = run_grouped_tl_interpret(xq, xs, p, gs, jnp.float32, bm=32)
    assert got is not None
    got = np.asarray(got)

    # segment-wise oracle over the same quantized activations
    start = 0
    for ex, sz in enumerate(sizes):
        if sz == 0:
            continue
        pe = QuantLinearParams(
            qweight=p.qweight[ex], scales=p.scales[ex], zeros=p.zeros[ex],
            bias=None, in_features=in_f, out_features=out_f,
            group_size=128, scales2=p.scales2[ex],
            chan_scale=p.chan_scale[ex])
        want = np.asarray(quant_matmul_w4a8tl_ref(
            x[start:start + sz], pe))
        np.testing.assert_allclose(got[start:start + sz], want,
                                   rtol=5e-3, atol=5e-3)
        start += sz


def run_bmm_interpret(xq3, xs3, p, out_dtype, **kw):
    from ferrum_tpu.ops.pallas import quant_matmul as qm

    orig = qm.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    qm.pl.pallas_call = patched
    try:
        with jax.disable_jit():
            return qm.quant_bmm_all_experts(xq3, xs3, p, out_dtype, **kw)
    finally:
        qm.pl.pallas_call = orig


@pytest.mark.parametrize("shared", [True, False])
def test_bmm_all_experts_matches_tl_oracle(shared):
    """All-experts batched kernel == per-expert jnp TL oracle, for both
    the shared-activation form (gate/up) and per-expert rows (down)."""
    from ferrum_tpu.ops.quant import (
        quant_matmul_w4a8tl_ref, requantize_two_level,
    )
    from ferrum_tpu.ops.pallas.quant_matmul import quantize_activation_rows

    e, in_f, out_f, t = 4, 256, 256, 32
    p = requantize_two_level(make_stack(e, in_f, out_f, seed=21))
    rng = np.random.default_rng(22)
    if shared:
        x = jnp.asarray(rng.normal(0, 1, (t, in_f)), jnp.float32)
        xq, xs = quantize_activation_rows(x)
        xq3, xs3 = xq[None], xs[None]
    else:
        x = jnp.asarray(rng.normal(0, 1, (e, t, in_f)), jnp.float32)
        xq, xs = quantize_activation_rows(x.reshape(e * t, in_f))
        xq3, xs3 = xq.reshape(e, t, in_f), xs.reshape(e, t, 1)
    got = run_bmm_interpret(xq3, xs3, p, jnp.float32)
    assert got is not None
    got = np.asarray(got)
    assert got.shape == (e, t, out_f)
    for ex in range(e):
        pe = QuantLinearParams(
            qweight=p.qweight[ex], scales=p.scales[ex], zeros=p.zeros[ex],
            bias=None, in_features=in_f, out_features=out_f,
            group_size=128, scales2=p.scales2[ex],
            chan_scale=p.chan_scale[ex])
        xe = x if shared else x[ex]
        want = np.asarray(quant_matmul_w4a8tl_ref(xe, pe))
        np.testing.assert_allclose(got[ex], want, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("shared", [True, False])
def test_bmm_all_experts_mxu_matches_tl_kernel(shared):
    """MXU-assisted-unpack bmm kernel == the widening-unpack bmm kernel
    bit-for-bit (same integer algebra, different unpack route)."""
    from ferrum_tpu.ops.pallas import quant_matmul as qm
    from ferrum_tpu.ops.quant import requantize_two_level
    from ferrum_tpu.ops.pallas.quant_matmul import quantize_activation_rows

    e, in_f, out_f, t = 4, 256, 256, 32
    p = requantize_two_level(make_stack(e, in_f, out_f, seed=31))
    rng = np.random.default_rng(32)
    if shared:
        x = jnp.asarray(rng.normal(0, 1, (t, in_f)), jnp.float32)
        xq, xs = quantize_activation_rows(x)
        xq3, xs3 = xq[None], xs[None]
    else:
        x = jnp.asarray(rng.normal(0, 1, (e, t, in_f)), jnp.float32)
        xq, xs = quantize_activation_rows(x.reshape(e * t, in_f))
        xq3, xs3 = xq.reshape(e, t, in_f), xs.reshape(e, t, 1)
    base = run_bmm_interpret(xq3, xs3, p, jnp.float32)
    qm.set_w4a8_gd("mxu")
    try:
        got = run_bmm_interpret(xq3, xs3, p, jnp.float32)
    finally:
        qm.set_w4a8_gd("off")
    assert got is not None and base is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_moe_dense_decode_matches_float_oracle():
    """moe_mlp_dense_decode (all-experts, interpret-mode kernels) tracks
    the dense float oracle within int4+int8-activation tolerance."""
    from dataclasses import dataclass, field

    from ferrum_tpu.models.configs import MoeConfig
    from ferrum_tpu.models.llama_family import MoeLayerParams
    from ferrum_tpu.ops.linear import DenseLinearParams
    from ferrum_tpu.ops.moe import moe_mlp_dense_decode, moe_mlp_ref
    from ferrum_tpu.ops.quant import dequantize, requantize_two_level
    from ferrum_tpu.ops.pallas import quant_matmul as qm

    e, h, inter, t, k = 4, 256, 256, 16, 2
    gate = requantize_two_level(make_stack(e, h, inter, seed=31))
    up = requantize_two_level(make_stack(e, h, inter, seed=32))
    down = requantize_two_level(make_stack(e, inter, h, seed=33))
    rng = np.random.default_rng(34)
    router = DenseLinearParams(
        w=jnp.asarray(rng.normal(0, 0.5, (h, e)), jnp.float32), bias=None)

    @dataclass
    class Cfg:
        hidden_size: int = h
        moe: MoeConfig = field(default_factory=lambda: MoeConfig(
            num_experts=e, num_experts_per_tok=k,
            moe_intermediate_size=inter, norm_topk_prob=True))

    pq = MoeLayerParams(router=router, gate=gate, up=up, down=down)

    def dense_of(stack):
        return jax.vmap(lambda qw, s, z: dequantize(
            QuantLinearParams(qweight=qw, scales=s, zeros=z, bias=None,
                              in_features=stack.in_features,
                              out_features=stack.out_features,
                              group_size=128), dtype=jnp.float32))(
            stack.qweight, stack.scales, stack.zeros)

    pd = MoeLayerParams(router=router, gate=dense_of(gate),
                        up=dense_of(up), down=dense_of(down))

    x = jnp.asarray(rng.normal(0, 1, (t, h)), jnp.float32)

    orig = qm.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    qm.pl.pallas_call = patched
    try:
        with jax.disable_jit():
            got = moe_mlp_dense_decode(x, pq, Cfg())
    finally:
        qm.pl.pallas_call = orig
    assert got is not None
    want = moe_mlp_ref(x, pd, Cfg())
    scale = np.abs(np.asarray(want)).max()
    err = np.abs(np.asarray(got) - np.asarray(want)).max() / scale
    assert err < 3e-2, err


def test_moe_gather_decode_matches_ref():
    """Routed-experts-only decode path (t·topk < E): gathers the k
    routed experts' packed stacks and reuses the all-experts bmm —
    must match the one-hot float oracle. This is the single-stream
    decode path (the sort path walks the full expert grid)."""
    from ferrum_tpu.models.configs import ModelConfig, MoeConfig
    from ferrum_tpu.models.llama_family import MoeLayerParams
    from ferrum_tpu.ops.linear import DenseLinearParams
    from ferrum_tpu.ops.moe import moe_mlp_gather_decode, moe_mlp_ref
    from ferrum_tpu.ops.pallas import quant_matmul as qm
    from ferrum_tpu.ops.quant import requantize_two_level
    import dataclasses

    h, inter, e, k = 256, 256, 8, 2
    cfg = ModelConfig(
        family="qwen3_moe", vocab_size=64, hidden_size=h, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=128,
        intermediate_size=inter,
        moe=MoeConfig(num_experts=e, num_experts_per_tok=k,
                      moe_intermediate_size=inter, norm_topk_prob=True))
    rng = np.random.default_rng(40)
    router = DenseLinearParams(
        w=jnp.asarray(rng.normal(0, 0.5, (h, e)), jnp.float32), bias=None)
    gate = requantize_two_level(make_stack(e, h, inter, seed=41))
    up = requantize_two_level(make_stack(e, h, inter, seed=42))
    down = requantize_two_level(make_stack(e, inter, h, seed=43))
    gate_up = dataclasses.replace(
        gate,
        qweight=jnp.concatenate([gate.qweight, up.qweight], axis=-1),
        scales=jnp.concatenate([gate.scales, up.scales], axis=-1),
        zeros=jnp.concatenate([gate.zeros, up.zeros], axis=-1),
        scales2=jnp.concatenate([gate.scales2, up.scales2], axis=-1),
        chan_scale=jnp.concatenate([gate.chan_scale, up.chan_scale],
                                   axis=-1),
        out_features=2 * inter)
    p = MoeLayerParams(router=router, gate=gate, up=up, down=down,
                       gate_up=gate_up)

    def dq(stack, in_f, out_f):
        return jax.vmap(lambda qw, s, z: dequantize(QuantLinearParams(
            qweight=qw, scales=s, zeros=z, bias=None, in_features=in_f,
            out_features=out_f, group_size=128), jnp.float32))(
            stack.qweight, stack.scales, stack.zeros)

    dense = MoeLayerParams(router=router, gate=dq(gate, h, inter),
                           up=dq(up, h, inter), down=dq(down, inter, h))

    orig = qm.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    for t in (1, 3):
        x = jnp.asarray(rng.normal(0, 1, (t, h)), jnp.float32)
        qm.pl.pallas_call = patched
        try:
            with jax.disable_jit():
                got = moe_mlp_gather_decode(x, p, cfg)
        finally:
            qm.pl.pallas_call = orig
        assert got is not None, "gather path unexpectedly unsupported"
        want = np.asarray(moe_mlp_ref(x, dense, cfg))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=6e-2, atol=3e-2)


def test_tl2d_mcache_matches_tl_oracle():
    """m-innermost prep-cached prefill kernel == the jnp TL oracle at a
    multi-m-tile, multi-k-step shape (the geometry where the weight
    prep caching actually kicks in)."""
    from ferrum_tpu.ops.quant import (
        make_quant_linear, quant_matmul_w4a8tl_ref, requantize_two_level,
    )
    from ferrum_tpu.ops.pallas import quant_matmul as qm

    in_f, out_f, m = 512, 256, 96          # 3 m-tiles at bm=32, 2 k-steps
    rng = np.random.default_rng(50)
    w = rng.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
    p = requantize_two_level(
        make_quant_linear(w, group_size=128, dtype=jnp.bfloat16))
    x = jnp.asarray(rng.normal(0, 1, (m, in_f)), jnp.float32)
    xq, xs = qm.quantize_activation_rows(x)

    orig = qm.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    qm.pl.pallas_call = patched
    try:
        with jax.disable_jit():
            got = qm._quant_matmul_w4a8tl_2d_mcache(
                xq, xs, p, jnp.float32, bkb=128, bn=128, bm=32)
    finally:
        qm.pl.pallas_call = orig
    assert got is not None
    want = np.asarray(quant_matmul_w4a8tl_ref(x, p))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3,
                               atol=5e-3)
