#!/usr/bin/env python
"""Lane-gather strategies for the hoisted decode ctx windows, on chip.

The decode window hoists per-lane KV ctx out of the scan:
    pool [num_slots, max_ctx, F] --(lane->slot map)--> [s_pad, ctx, F]
XLA's row gather measured ~2.4x the cost of a plain slice (bench_lane_
sweep r3). This sweeps alternatives at bench shapes so the window can
pick the fastest per bucket:

  slice    pool[:s_pad, :ctx]              (lower bound / ident case)
  gather   pool[lanes, :ctx]               (current mid-bucket path)
  dynslice stack of per-lane lax.dynamic_slice rows
  onehot   einsum('ls,scf->lcf', one_hot(lanes), pool[:, :ctx])

Methodology: chained scan slope (axon transport dedup/RTT safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

NUM_SLOTS = 32
MAX_CTX = 1024
F = 1024          # kv_heads * head_dim (8 * 128)
CTX = 512
L = 4             # layers folded into the chain per iteration


def variants(lanes):
    s_pad = lanes.shape[0]

    def v_slice(pool, lanes):
        return pool[:s_pad, :CTX]

    def v_gather(pool, lanes):
        return pool[lanes, :CTX]

    def v_dynslice(pool, lanes):
        rows = [jax.lax.dynamic_index_in_dim(pool, lanes[i], 0,
                                             keepdims=False)[:CTX]
                for i in range(s_pad)]
        return jnp.stack(rows)

    def v_onehot(pool, lanes):
        sel = jax.nn.one_hot(lanes, NUM_SLOTS, dtype=pool.dtype)
        return jnp.einsum("ls,scf->lcf", sel, pool[:, :CTX])

    return {"slice": v_slice, "gather": v_gather,
            "dynslice": v_dynslice, "onehot": v_onehot}


def slope_time(fn, pools, lanes, n1=8, n2=32):
    def total(iters):
        @jax.jit
        def chain(pools, x):
            def body(x, _):
                acc = x
                for pool in pools:
                    w = fn(pool, lanes)          # [s_pad, CTX, F]
                    acc = acc + jnp.sum(w[:, :: CTX // 4], axis=(1, 2))
                return acc * jnp.bfloat16(0.5), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x

        xs = [jnp.asarray(np.random.default_rng(i).normal(
            0, 1, (lanes.shape[0],)), jnp.bfloat16) for i in range(3)]
        np.asarray(chain(pools, xs[0]))
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            np.asarray(chain(pools, x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = total(n1), total(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    pools = [jnp.asarray(rng.normal(0, 1, (NUM_SLOTS, MAX_CTX, F)),
                         jnp.bfloat16) for _ in range(L)]
    sweep = [int(x) for x in os.environ.get(
        "SWEEP", "1,2,4,8,16,32").split(",")]
    for s_pad in sweep:
        lanes = jnp.asarray(
            rng.choice(NUM_SLOTS, s_pad, replace=False).astype(np.int32))
        for name, fn in variants(lanes).items():
            if name == "slice" and s_pad > NUM_SLOTS:
                continue
            try:
                dt = slope_time(fn, pools, lanes)
            except Exception as e:
                print(f"s_pad={s_pad:3d} {name:9s} FAIL "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                continue
            bytes_moved = L * s_pad * CTX * F * 2   # one read of the ctx
            print(f"s_pad={s_pad:3d} {name:9s} {dt*1e6:8.1f} us  "
                  f"{bytes_moved/dt/1e9:7.0f} GB/s(read)", flush=True)


if __name__ == "__main__":
    main()
