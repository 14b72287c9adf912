#!/usr/bin/env python
"""Compiled-on-TPU kernel parity + microbench (run manually on hardware).

CI runs the same parity asserts in interpreter mode
(tests/test_pallas_kernels.py); this script is the hardware leg:
compiled Mosaic kernels vs jnp reference, plus bandwidth accounting
against speed-of-light.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


# check_decode_attention removed with ops/pallas/paged_attention.py
# (the kernel failed its own A/B bar 7.7x at ctx 2048 — gates/perf
# r5 attn-ab artifact; XLA gather+flash is the paged path).


def check_hbm_roofline():
    """Reference: achievable HBM bandwidth via big-array reduction."""
    x = jnp.ones((1024, 1024, 512), jnp.bfloat16)  # 1 GiB
    f = jax.jit(lambda x: jnp.sum(x, axis=(0, 1)))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"HBM roofline (1GiB sum): {dt*1e3:.2f} ms -> "
          f"{x.nbytes/dt/1e9:.0f} GB/s")


def check_grouped_matmul():
    """Compiled parity + microbench of the streamed grouped int4 GEMM
    (Marlin-MoE analog) at Qwen3-30B-A3B expert shapes."""
    from tests.test_moe_grouped import make_stack, ragged_oracle
    from ferrum_tpu.ops.pallas.quant_matmul import _quant_grouped_2d

    rng = np.random.default_rng(0)
    # parity: modest stack, skewed groups incl. empty
    e, in_f, out_f, a = 8, 512, 512, 256
    sizes = np.array([40, 0, 7, 64, 1, 80, 33, 31], np.int32)
    p = make_stack(e, in_f, out_f, seed=1)
    x = jnp.asarray(rng.normal(0, 1, (a, in_f)), jnp.bfloat16)
    gs = jnp.asarray(sizes)
    got = np.asarray(jax.jit(
        lambda x, gs: _quant_grouped_2d(x, p, gs))(x, gs), np.float32)
    want = np.asarray(ragged_oracle(x, p, gs), np.float32)
    real = int(sizes.sum())
    err = np.abs(got[:real] - want[:real]).max()
    rel = err / max(np.abs(want[:real]).max(), 1e-9)
    print(f"grouped int4 parity: max abs {err:.4f} rel {rel:.4f}")
    assert rel < 2e-2, "grouped kernel parity failure"

    # microbench at flagship shape: E=128, k=2048, n=768 (gate/up proj),
    # decode A=256 (c=32 × top-8). Chained with fresh inputs + readback;
    # slope between two scan lengths cancels the dispatch RTT.
    import time
    e, k, n = 128, 2048, 768
    pbig = make_stack(e, k, n, seed=2)
    uniform = jnp.full((e,), 2, jnp.int32)   # 256 rows over 128 experts

    def total(iters, x):
        @jax.jit
        def chain(x):
            def body(x, _):
                y = _quant_grouped_2d(x, pbig, uniform)
                return x * jnp.bfloat16(0.99) + jnp.pad(
                    y, ((0, 0), (0, k - n))) * jnp.bfloat16(1e-3), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        np.asarray(chain(x))
        ts = []
        for _ in range(3):
            x = x * jnp.bfloat16(1.0001)
            t0 = time.perf_counter()
            np.asarray(chain(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    x = jnp.asarray(rng.normal(0, 1, (256, k)), jnp.bfloat16)
    t1, t2 = total(8, x), total(64, x)
    dt = (t2 - t1) / 56
    stream = pbig.qweight.nbytes / dt / 1e9
    print(f"grouped int4 E=128 2048x768 A=256: {dt*1e3:.3f} ms/call, "
          f"packed stream {stream:.0f} GB/s "
          f"(all-expert traffic {pbig.qweight.nbytes/1e6:.0f} MB)")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    import os
    cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "roofline"):
        check_hbm_roofline()
    if which in ("all", "grouped"):
        check_grouped_matmul()
