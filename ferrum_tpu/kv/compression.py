"""KV-cache compression strategies (prototype family).

TPU-native analog of the reference's `CompressionStrategy` +
Int4/Fp8 strategies (crates/ferrum-kv/src/cache/compression.rs:7,77,167
— a prototype layer over raw block bytes, not wired into serving).
Parity note: in THIS framework the int8 strategy IS production-wired —
`--kv-dtype int8` stores scaled int8 blocks with dequant inside
attention (models/llama_family.py PagedKvCache; ref:
int8_paged_decode_attention.cu). The strategies here are the offline/
offload family: compress whole KV blocks (e.g. for host offload of
evicted prefix-cache blocks), with per-(token, head) scaling matching
the wired int8 layout so int8-compressed blocks can be re-uploaded
verbatim.

Strategies operate on [tokens, heads, head_dim] block arrays (numpy,
host side — compression is an off-device concern).

Serving wire-up (r4): `HostOffloadTier` below is the opt-in second
tier of the paged PrefixCache — evicted prefix blocks spill here
compressed and restore on a later hash-chain hit
(FERRUM_PREFIX_OFFLOAD_MB; engine/engine.py, kv/prefix_cache.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class CompressedBlock:
    """Compressed block container (ref: CompressedData,
    compression.rs:23-35)."""

    data: np.ndarray                 # packed payload
    scale: Optional[np.ndarray]      # per-(token, head) f32 scales
    original_dtype: str
    original_shape: tuple
    algorithm: str
    params: Dict[str, int] = field(default_factory=dict)

    @property
    def nbytes(self) -> int:
        n = self.data.nbytes
        if self.scale is not None:
            n += self.scale.nbytes
        return n


class CompressionStrategy:
    """compress/decompress + ratio + name (compression.rs:7-20)."""

    name = "none"

    def compress(self, block: np.ndarray) -> CompressedBlock:
        raise NotImplementedError

    def decompress(self, c: CompressedBlock) -> np.ndarray:
        raise NotImplementedError

    def compression_ratio(self) -> float:
        return 1.0


class NoCompression(CompressionStrategy):
    name = "none"

    def compress(self, block: np.ndarray) -> CompressedBlock:
        return CompressedBlock(
            data=np.ascontiguousarray(block), scale=None,
            original_dtype=str(block.dtype),
            original_shape=block.shape, algorithm=self.name)

    def decompress(self, c: CompressedBlock) -> np.ndarray:
        return c.data

    def compression_ratio(self) -> float:
        return 1.0


def _rowhead_scale(block: np.ndarray, qmax: float) -> np.ndarray:
    amax = np.abs(block.astype(np.float32)).max(axis=-1)  # [T, H]
    return np.maximum(amax, 1e-8) / qmax


class Int8Compression(CompressionStrategy):
    """Symmetric per-(token, head) int8 — the SAME layout as the wired
    int8 KV cache, so decompress-free re-upload is possible."""

    name = "int8"

    def compress(self, block: np.ndarray) -> CompressedBlock:
        scale = _rowhead_scale(block, 127.0)
        q = np.clip(np.round(block.astype(np.float32)
                             / scale[..., None]), -127, 127)
        return CompressedBlock(
            data=q.astype(np.int8), scale=scale.astype(np.float32),
            original_dtype=str(block.dtype),
            original_shape=block.shape, algorithm=self.name,
            params={"quantization_bits": 8})

    def decompress(self, c: CompressedBlock) -> np.ndarray:
        out = c.data.astype(np.float32) * c.scale[..., None]
        return out.astype(c.original_dtype)

    def compression_ratio(self) -> float:
        return 2.0       # bf16 → int8 (+ small scale overhead)


class Int4Compression(CompressionStrategy):
    """Symmetric per-(token, head) int4, two values per byte packed
    along head_dim (ref: Int4Compression, compression.rs:77)."""

    name = "int4"

    def compress(self, block: np.ndarray) -> CompressedBlock:
        assert block.shape[-1] % 2 == 0, "head_dim must be even"
        scale = _rowhead_scale(block, 7.0)
        q = np.clip(np.round(block.astype(np.float32)
                             / scale[..., None]), -7, 7) + 8
        q = q.astype(np.uint8)
        lo, hi = q[..., 0::2], q[..., 1::2]
        return CompressedBlock(
            data=(lo | (hi << 4)), scale=scale.astype(np.float32),
            original_dtype=str(block.dtype),
            original_shape=block.shape, algorithm=self.name,
            params={"quantization_bits": 4})

    def decompress(self, c: CompressedBlock) -> np.ndarray:
        lo = (c.data & 0xF).astype(np.int32) - 8
        hi = (c.data >> 4).astype(np.int32) - 8
        q = np.empty(c.original_shape, np.float32)
        q[..., 0::2] = lo
        q[..., 1::2] = hi
        return (q * c.scale[..., None]).astype(c.original_dtype)

    def compression_ratio(self) -> float:
        return 4.0


class Fp8Compression(CompressionStrategy):
    """E4M3-style fp8 via round-trip through a 256-entry table
    (ref: Fp8Compression, compression.rs:167). Per-(token, head) scale
    normalizes into fp8's dynamic range."""

    name = "fp8"

    def __init__(self):
        # e4m3: 1 sign, 4 exp (bias 7), 3 mantissa; max finite 448
        codes = np.arange(256, dtype=np.uint8)
        sign = np.where(codes & 0x80, -1.0, 1.0)
        exp = ((codes >> 3) & 0xF).astype(np.int32)
        man = (codes & 0x7).astype(np.float32)
        val = np.where(exp == 0,
                       man * 2.0 ** -9,                      # subnormal
                       (1.0 + man / 8.0) * 2.0 ** (exp - 7.0))
        val = sign * val
        # e4m3 reserves exp=15, man=7 for nan
        val[(exp == 15) & (codes & 0x7 == 7)] = np.nan
        self._table = val.astype(np.float32)
        # encoder: for magnitudes, nearest table entry (positive half)
        pos = self._table[:128].copy()
        pos[np.isnan(pos)] = np.inf
        self._pos = pos

    def compress(self, block: np.ndarray) -> CompressedBlock:
        scale = _rowhead_scale(block, 448.0)
        x = block.astype(np.float32) / scale[..., None]
        mag = np.abs(x)
        idx = np.searchsorted(np.sort(self._pos), mag).clip(0, 126)
        order = np.argsort(self._pos)
        cand = order[idx]
        cand_lo = order[np.maximum(idx - 1, 0)]
        take_lo = (np.abs(self._pos[cand_lo] - mag)
                   <= np.abs(self._pos[cand] - mag))
        code = np.where(take_lo, cand_lo, cand).astype(np.uint8)
        code = np.where(x < 0, code | 0x80, code)
        return CompressedBlock(
            data=code, scale=scale.astype(np.float32),
            original_dtype=str(block.dtype),
            original_shape=block.shape, algorithm=self.name,
            params={"quantization_bits": 8})

    def decompress(self, c: CompressedBlock) -> np.ndarray:
        out = self._table[c.data] * c.scale[..., None]
        return out.astype(c.original_dtype)

    def compression_ratio(self) -> float:
        return 2.0


STRATEGIES = {
    "none": NoCompression,
    "int8": Int8Compression,
    "int4": Int4Compression,
    "fp8": Fp8Compression,
}


def make_strategy(name: str) -> CompressionStrategy:
    if name not in STRATEGIES:
        raise ValueError(f"unknown compression strategy {name!r} "
                         f"(have {sorted(STRATEGIES)})")
    return STRATEGIES[name]()


# ---------------------------------------------------------------------------
# Host offload tier: compressed prefix blocks in host RAM
# ---------------------------------------------------------------------------

@dataclass
class OffloadStats:
    saves: int = 0
    restores: int = 0
    drops: int = 0                   # capacity evictions
    bytes_held: int = 0


class HostOffloadTier:
    """Second-tier prefix cache in host memory (opt-in; the vLLM swap-
    space analog, serving the paged PrefixCache).

    Evicted prefix blocks are compressed host-side instead of being
    destroyed; a later prompt whose hash chain extends into the tier
    restores blocks into freshly allocated device blocks. LRU within a
    byte budget. Device↔host transfers cost a tunnel round trip on
    remote TPUs, which is why the tier is opt-in
    (FERRUM_PREFIX_OFFLOAD_MB) — on directly attached hosts the ~0.1 ms
    PCIe copy is a bargain against a recomputed prefill.

    Entries are keyed by the SAME hash chain the device cache uses, so
    match/insert logic is shared; the payload is the full per-hash KV
    block group [(k, v) (+ int8 scales)] as produced by
    runner.read_kv_block."""

    def __init__(self, capacity_bytes: int,
                 strategy: Optional[CompressionStrategy] = None):
        import collections
        self.capacity_bytes = int(capacity_bytes)
        self.strategy = strategy or Int8Compression()
        self._blocks: "collections.OrderedDict[int, tuple]" = \
            collections.OrderedDict()
        self.stats = OffloadStats()

    def __contains__(self, h: int) -> bool:
        return h in self._blocks

    def put(self, h: int, arrays: tuple) -> None:
        """Store one evicted block group keyed by its chain hash.
        `arrays` = (k, v[, k_scale, v_scale]) numpy arrays."""
        if h in self._blocks:
            self._touch(h)
            return
        comp = []
        for a in arrays:
            if a is None:
                comp.append(None)
            elif a.dtype == np.float32 and a.ndim < 4:
                # int8-KV scale planes: tiny, keep raw.
                comp.append(CompressedBlock(
                    data=np.ascontiguousarray(a), scale=None,
                    original_dtype=str(a.dtype), original_shape=a.shape,
                    algorithm="none"))
            else:
                comp.append(self.strategy.compress(a))
        size = sum(c.nbytes for c in comp if c is not None)
        while (self._blocks
               and self.stats.bytes_held + size > self.capacity_bytes):
            _, (old, old_size) = self._blocks.popitem(last=False)
            self.stats.bytes_held -= old_size
            self.stats.drops += 1
        if size > self.capacity_bytes:
            return                   # single block exceeds the budget
        self._blocks[h] = (tuple(comp), size)
        self.stats.bytes_held += size
        self.stats.saves += 1

    def get(self, h: int) -> Optional[tuple]:
        """Restore a block group: decompressed numpy arrays, or None."""
        entry = self._blocks.get(h)
        if entry is None:
            return None
        self._touch(h)
        comp, _ = entry
        out = []
        for c in comp:
            if c is None:
                out.append(None)
            elif c.algorithm == "none":
                out.append(c.data)
            else:
                out.append(self.strategy.decompress(c))
        self.stats.restores += 1
        return tuple(out)

    def _touch(self, h: int) -> None:
        self._blocks.move_to_end(h)

    def __len__(self) -> int:
        return len(self._blocks)
