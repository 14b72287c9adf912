#!/usr/bin/env python
"""Nibble-unpack micro-shootout: what does the VPU charge per packed byte?

The int4 dequant+matmul kernels are VPU-bound, not HBM-bound
(NOTES_ROUND3/4): op-count model says tl2d ~12 VPU ops/packed byte
(~320 GB/s at ~3.85 Tops), gd ~8 (~480), and 819 GB/s HBM needs <= ~4.7.
The int32 widening (`astype(jnp.int32)` before `&`/`>>`) is the
suspected tax. Variants (identical [bkb, bn] packed-byte stream, two
full-depth int8 dots per tile so the MXU side is constant):

  widen     current production unpack: astype(i32) -> &0xF / >>4 -> i8
  i8and     int8-native: lo = b & 0x0F (bitwise on int8 lanes);
            hi = shift_right_logical(b as u8, 4) -> i8. If Mosaic
            compiles this without internal widening, ops/byte ~halves.
  nodot     widen unpack, NO matmul (sum-reduce) — pure VPU ceiling
  raw       no unpack at all: dot against the raw bytes twice — the
            byte-stream + MXU floor (wrong math; speed reference only)

Run on the real chip: python tools/bench_unpack.py  (ITERS=512 default)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
except Exception:
    pass

RNG = np.random.default_rng(0)


def chain_time(fn, x0, n_iters: int):
    """Seconds/iteration via two chain lengths; fresh values per timed
    call (the tunnel dedupes repeated identical dispatches)."""

    def chained(x, n):
        def body(c, _):
            y = fn(c)
            c2 = (c + y[:, : x.shape[1]].astype(c.dtype)
                  if y.shape[1] >= x.shape[1]
                  else c.at[:, : y.shape[1]].add(y.astype(c.dtype)))
            return c2, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    f_short = jax.jit(functools.partial(chained, n=n_iters // 4))
    f_long = jax.jit(functools.partial(chained, n=n_iters))

    def bump(x, i):  # eager: fresh VALUES per timed call
        return x + jnp.asarray(i * 1e-3, x.dtype)
    for f in (f_short, f_long):
        np.asarray(f(x0))
    samples = []
    for rep in range(2):
        xs_ = bump(x0, 2 + 2 * rep)
        xl_ = bump(x0, 3 + 2 * rep)
        t0 = time.perf_counter()
        np.asarray(f_short(xs_))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f_long(xl_))
        t_l = time.perf_counter() - t0
        samples.append((t_l - t_s) / (n_iters - n_iters // 4))
    return min(samples)


def make_variant(kind: str, m: int, k: int, n: int, bkb: int, bn: int):
    """Returns f(x_bf16[m, k]) -> [m, n] bf16 streaming the packed
    [k/2, n] byte array with the chosen unpack flavor."""
    kb = k // 2
    qw = jnp.asarray(RNG.integers(0, 256, (kb, n), dtype=np.uint8)
                     .astype(np.int8))

    def kernel(x_ref, qw_ref, o_ref, acc_ref, *, n_k_steps):
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = qw_ref[:]
        if kind == "widen":
            qi = b.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.int8)
            hi = ((qi >> 4) & 0xF).astype(jnp.int8)
        elif kind == "i8and":
            lo = b & jnp.int8(0x0F)
            hi = jax.lax.shift_right_logical(
                b.astype(jnp.uint8), jnp.uint8(4)).astype(jnp.int8)
        elif kind == "i8and_lo":
            # isolate: int8-native AND for lo only (hi widens as today)
            lo = b & jnp.int8(0x0F)
            hi = ((b.astype(jnp.int32) >> 4) & 0xF).astype(jnp.int8)
        elif kind == "u8shift":
            # isolate: u8 logical shift for hi only (lo widens as today)
            lo = (b.astype(jnp.int32) & 0xF).astype(jnp.int8)
            hi = jax.lax.shift_right_logical(
                b.astype(jnp.uint8), jnp.uint8(4)).astype(jnp.int8)
        elif kind == "i16w":
            # half-width widening: do the bit ops in int16 lanes
            qi = b.astype(jnp.int16)
            lo = (qi & jnp.int16(0xF)).astype(jnp.int8)
            hi = ((qi >> jnp.int16(4)) & jnp.int16(0xF)).astype(jnp.int8)
        elif kind == "mxu":
            # MXU-assisted unpack: ONLY the lo nibble is extracted on
            # the VPU (int8-native AND, 1 op/byte — the one formulation
            # Mosaic compiles fast, see i8and_lo). The hi-plane dot is
            # recovered on the MXU from a dot against the raw bytes:
            # with b' = b ^ 0x80 stored offline (so b'_signed = b_u8
            # - 128), dot(x, hi) = (dot(x, b') + 128*sum(x)
            # - dot(x, lo)) >> 4 — exact in int32.
            lo = b & jnp.int8(0x0F)
            xl = x_ref[:, : lo.shape[0]]
            xh = x_ref[:, lo.shape[0]:]
            sxh = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
            A = jax.lax.dot(xl, lo, preferred_element_type=jnp.int32)
            C = jax.lax.dot(xh, lo, preferred_element_type=jnp.int32)
            D = jax.lax.dot(xh, b, preferred_element_type=jnp.int32)
            hi_dot = (D + 128 * sxh - C) >> 4
            acc_ref[:] += A + hi_dot

            @pl.when(kk == n_k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
            return
        elif kind == "mxu_t":
            # same, but NO offline re-pack: handle the sign of the raw
            # int8 byte via a 4th dot against the top-bit mask
            # (t = b < 0): dot(x, b_u8) = dot(x, b_s) + 256*dot(x, t)
            lo = b & jnp.int8(0x0F)
            t = (b < 0).astype(jnp.int8)
            xl = x_ref[:, : lo.shape[0]]
            xh = x_ref[:, lo.shape[0]:]
            A = jax.lax.dot(xl, lo, preferred_element_type=jnp.int32)
            C = jax.lax.dot(xh, lo, preferred_element_type=jnp.int32)
            D = jax.lax.dot(xh, b, preferred_element_type=jnp.int32)
            T = jax.lax.dot(xh, t, preferred_element_type=jnp.int32)
            hi_dot = (D + 256 * T - C) >> 4
            acc_ref[:] += A + hi_dot

            @pl.when(kk == n_k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
            return
        elif kind == "mxu_u8":
            # sign handled by the MXU itself if mixed i8 x u8 dots lower
            lo = b & jnp.int8(0x0F)
            bu = b.astype(jnp.uint8)
            xl = x_ref[:, : lo.shape[0]]
            xh = x_ref[:, lo.shape[0]:]
            A = jax.lax.dot(xl, lo, preferred_element_type=jnp.int32)
            C = jax.lax.dot(xh, lo, preferred_element_type=jnp.int32)
            D = jax.lax.dot_general(
                xh, bu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            hi_dot = (D - C) >> 4
            acc_ref[:] += A + hi_dot

            @pl.when(kk == n_k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
            return
        elif kind == "raw":
            lo = b
            hi = b
        elif kind == "nodot":
            qi = b.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.int8)
            hi = ((qi >> 4) & 0xF).astype(jnp.int8)
            # keep both planes live without MXU work
            acc_ref[0, :] += (lo.astype(jnp.int32).sum(axis=0)
                              + hi.astype(jnp.int32).sum(axis=0))

            @pl.when(kk == n_k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
            return
        xl = x_ref[:, : lo.shape[0]]
        xh = x_ref[:, lo.shape[0]:]
        acc_ref[:] += jax.lax.dot(xl, lo,
                                  preferred_element_type=jnp.int32)
        acc_ref[:] += jax.lax.dot(xh, hi,
                                  preferred_element_type=jnp.int32)

        @pl.when(kk == n_k_steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    n_k = kb // bkb

    def f(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127
                      ).astype(jnp.int8)
        kern = functools.partial(kernel, n_k_steps=n_k)
        out = pl.pallas_call(
            kern,
            grid=(n // bn, n_k),
            in_specs=[
                pl.BlockSpec((m, 2 * bkb), lambda j, kk: (0, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bkb, bn), lambda j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xq, qw)
        return (out.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

    return f


def main() -> None:
    m = int(os.environ.get("M", "64"))
    k = int(os.environ.get("K", "4096"))
    n = int(os.environ.get("N", "14336"))
    iters = int(os.environ.get("ITERS", "512"))
    bkb = int(os.environ.get("BKB", "512"))
    bn = int(os.environ.get("BN", "512"))
    nbytes = k * n // 2

    x0 = jnp.asarray(RNG.normal(0, 1, (m, k)), jnp.bfloat16)
    print(f"m={m} k={k} n={n} packed={nbytes / 2**20:.1f} MiB "
          f"bkb={bkb} bn={bn} iters={iters}", flush=True)
    kinds = os.environ.get(
        "KINDS", "raw,widen,i8and_lo,u8shift,i16w,nodot").split(",")
    for kind in kinds:
        try:
            t = chain_time(make_variant(kind, m, k, n, bkb, bn), x0, iters)
            print(f"  {kind:7s} {t * 1e3:7.3f} ms/call  "
                  f"{nbytes / t / 2**30:7.1f} GiB/s packed-byte stream",
                  flush=True)
        except Exception as e:
            print(f"  {kind:7s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
