"""Block-hash-chain prefix cache over the paged pool.

TPU-native analog of the reference's paged prefix reuse
(crates/ferrum-models/src/models/qwen3_moe/prefix_cache.rs and
common/paged_pool.rs `block_hash_chain`) plus the engine-level hit/miss
stats (crates/ferrum-kv/src/cache/prefix.rs:113).

Each FULL block of a sequence's prompt is keyed by the hash chain
hash(parent_hash, tokens_in_block). On admission, the longest chain of
cached full blocks is adopted copy-on-write (refcount shares), and the
prefill starts after the reused prefix.

Eviction policy family (ref: ferrum-kv/src/managers/eviction.rs
LRUEviction/FIFOEviction/ClockEviction): only blocks whose sole owner
is the cache (refcount 1) are reclaimable.
  lru   — reclaim least-recently-matched first (default)
  fifo  — reclaim oldest-inserted first (match order ignored)
  clock — second-chance: a referenced bit set on match spares the block
          one sweep
"""

from __future__ import annotations

import collections
import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from .block_pool import BlockPool


def _hash_chain(parent: int, tokens: Sequence[int]) -> int:
    h = hashlib.blake2b(digest_size=8)
    h.update(parent.to_bytes(8, "little", signed=False))
    for t in tokens:
        h.update(int(t).to_bytes(4, "little", signed=False))
    return int.from_bytes(h.digest(), "little")


@dataclass
class PrefixCacheStats:
    hits: int = 0
    misses: int = 0
    saved_prefill_tokens: int = 0
    cached_blocks: int = 0
    evictions: int = 0


class PrefixCache:
    """Cache of full prompt blocks keyed by token hash chain, with a
    pluggable eviction policy (lru | fifo | clock)."""

    def __init__(self, pool: BlockPool, enabled: bool = True,
                 policy: str = "lru", offload=None, block_io=None):
        if policy not in ("lru", "fifo", "clock"):
            raise ValueError(f"unknown eviction policy {policy!r}")
        self.pool = pool
        self.enabled = enabled
        self.policy = policy
        # Optional host offload tier (kv/compression.HostOffloadTier):
        # evicted blocks spill compressed to host RAM and restore on a
        # later chain hit. block_io = (read_block, write_block) device
        # accessors (runner.read_kv_block / write_kv_block).
        self.offload = offload
        self._read_block = block_io[0] if block_io else None
        self._write_block = block_io[1] if block_io else None
        # hash → physical block id (cache holds one refcount on each).
        # Order = insertion order (fifo/clock) or recency (lru).
        self._by_hash: "collections.OrderedDict[int, int]" = collections.OrderedDict()
        self._hash_of_block: Dict[int, int] = {}
        self._referenced: Dict[int, bool] = {}     # clock second-chance
        self.stats = PrefixCacheStats()

    def match_prefix(self, tokens: Sequence[int]) -> Tuple[List[int], int]:
        """Longest cached block chain for a prompt.

        Returns (block_ids, covered_tokens). Never covers the entire
        prompt: at least one token is left to prefill so the engine has
        a last-token hidden state to sample from (matches the reference,
        which reuses KV but recomputes the final token's logits).
        """
        if not self.enabled:
            return [], 0
        page = self.pool.page_size
        usable = len(tokens) - 1  # leave >= 1 token to prefill
        blocks: List[int] = []
        parent = 0
        covered = 0
        for start in range(0, usable - page + 1, page):
            chunk = tokens[start:start + page]
            h = _hash_chain(parent, chunk)
            b = self._by_hash.get(h)
            if b is None and self.offload is not None and h in self.offload:
                b = self._restore_from_offload(h)
            if b is None:
                break
            if self.policy == "lru":
                self._by_hash.move_to_end(h)
            elif self.policy == "clock":
                self._referenced[h] = True
            blocks.append(b)
            covered += page
            parent = h
        if covered:
            self.stats.hits += 1
            self.stats.saved_prefill_tokens += covered
        else:
            self.stats.misses += 1
        return blocks, covered

    def insert(self, tokens: Sequence[int], block_ids: Sequence[int]) -> None:
        """Register a sequence's FULL prompt blocks after prefill.

        The cache takes one refcount share on each newly registered
        block so it survives sequence release (freed on eviction).
        """
        if not self.enabled:
            return
        page = self.pool.page_size
        parent = 0
        for i, start in enumerate(range(0, len(tokens) - page + 1, page)):
            chunk = tokens[start:start + page]
            h = _hash_chain(parent, chunk)
            parent = h
            if h in self._by_hash:
                if self.policy == "lru":
                    self._by_hash.move_to_end(h)
                elif self.policy == "clock":
                    self._referenced[h] = True
                continue
            b = block_ids[i]
            self.pool.share(b)
            self._by_hash[h] = b
            self._hash_of_block[b] = h
        self.stats.cached_blocks = len(self._by_hash)

    def evict(self, min_free_target: int) -> int:
        """Evict cached blocks until pool free count >= target, per the
        configured policy. Only blocks whose sole owner is the cache
        are reclaimed (refcount 1); shared blocks stay."""
        freed = 0
        if not self._by_hash:
            return 0
        if self.policy == "clock":
            # Up to two sweeps: first clears referenced bits (second
            # chance), second reclaims.
            for _sweep in range(2):
                for h in list(self._by_hash.keys()):
                    if self.pool.num_free >= min_free_target:
                        break
                    if self._referenced.pop(h, False):
                        continue            # spared this sweep
                    freed += self._reclaim(h)
                if self.pool.num_free >= min_free_target:
                    break
        else:
            # lru: order = recency (oldest first). fifo: insertion order.
            for h in list(self._by_hash.keys()):
                if self.pool.num_free >= min_free_target:
                    break
                freed += self._reclaim(h)
        self.stats.cached_blocks = len(self._by_hash)
        return freed

    def _reclaim(self, h: int) -> int:
        b = self._by_hash[h]
        if self.pool.refcount(b) != 1:
            return 0
        if self.offload is not None and self._read_block is not None \
                and h not in self.offload:
            # Spill to the host tier before the device block dies.
            self.offload.put(h, self._read_block(b))
        del self._by_hash[h]
        del self._hash_of_block[b]
        self._referenced.pop(h, None)
        self.pool.free(b)
        self.stats.evictions += 1
        return 1

    def _restore_from_offload(self, h: int):
        """Bring an offloaded block back on-device (no eviction cascade:
        only when the pool has a free block right now)."""
        if self._write_block is None or self.pool.num_free == 0:
            return None
        arrays = self.offload.get(h)
        if arrays is None:
            return None
        b = self.pool.allocate(1)[0]  # cache holds the sole refcount
        self._write_block(b, arrays)
        self._by_hash[h] = b
        self._hash_of_block[b] = h
        self.stats.cached_blocks = len(self._by_hash)
        return b

    def clear(self) -> None:
        for h, b in list(self._by_hash.items()):
            self.pool.free(b)
        self._by_hash.clear()
        self._hash_of_block.clear()
        self.stats.cached_blocks = 0
