"""Host-side KV pool / prefix cache / scheduler unit tests.

Models the reference's scheduler + kv crates' inline tests
(continuous.rs:3301, pool.rs tests) — hardware-free.
"""

import pytest

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.kv.block_pool import BlockPool, SequenceBlocks
from ferrum_tpu.kv.prefix_cache import PrefixCache
from ferrum_tpu.scheduler.continuous import ContinuousBatchScheduler
from ferrum_tpu.scheduler.sequence import Phase, Sequence
from ferrum_tpu.types import CapacityError, InferenceRequest, SamplingParams


def mkseq(n_prompt=10, max_tokens=8, priority=0):
    req = InferenceRequest(
        prompt_token_ids=list(range(3, 3 + n_prompt)),
        sampling=SamplingParams(max_tokens=max_tokens), priority=priority)
    return Sequence(req, req.prompt_token_ids)


class TestBlockPool:
    def test_alloc_free_roundtrip(self):
        pool = BlockPool(num_blocks=8, page_size=4)
        a = pool.allocate(3)
        assert pool.num_free == 5
        for b in a:
            pool.free(b)
        assert pool.num_free == 8

    def test_exhaustion_raises(self):
        pool = BlockPool(num_blocks=2, page_size=4)
        pool.allocate(2)
        with pytest.raises(CapacityError):
            pool.allocate(1)

    def test_cow_refcount(self):
        pool = BlockPool(num_blocks=4, page_size=4)
        (b,) = pool.allocate(1)
        pool.share(b)
        pool.free(b)
        assert pool.num_free == 3  # still held by the share
        pool.free(b)
        assert pool.num_free == 4

    def test_sequence_blocks_flat_slot(self):
        pool = BlockPool(num_blocks=8, page_size=4)
        sb = SequenceBlocks(pool)
        sb.ensure_capacity(10)  # 3 blocks
        assert len(sb.blocks) == 3
        assert sb.flat_slot(0) == sb.blocks[0] * 4
        assert sb.flat_slot(5) == sb.blocks[1] * 4 + 1
        sb.release()
        assert pool.num_free == 8


class TestPrefixCache:
    def test_hit_after_insert(self):
        pool = BlockPool(num_blocks=16, page_size=4)
        pc = PrefixCache(pool)
        sb = SequenceBlocks(pool)
        tokens = list(range(100, 112))  # 12 tokens = 3 full blocks
        sb.ensure_capacity(12)
        pc.insert(tokens, sb.blocks)
        blocks, covered = pc.match_prefix(tokens + [999])
        assert covered == 12
        assert blocks == sb.blocks
        # identical prompt: never covers the whole thing (last token left)
        blocks2, covered2 = pc.match_prefix(tokens)
        assert covered2 == 8  # only 2 blocks usable (12-1=11 → 2 full blocks)

    def test_divergent_prompt_partial_hit(self):
        pool = BlockPool(num_blocks=16, page_size=4)
        pc = PrefixCache(pool)
        sb = SequenceBlocks(pool)
        tokens = list(range(100, 112))
        sb.ensure_capacity(12)
        pc.insert(tokens, sb.blocks)
        other = tokens[:8] + [1, 2, 3, 4, 5]
        blocks, covered = pc.match_prefix(other)
        assert covered == 8

    def test_eviction_respects_refcount(self):
        pool = BlockPool(num_blocks=4, page_size=4)
        pc = PrefixCache(pool)
        sb = SequenceBlocks(pool)
        sb.ensure_capacity(8)
        pc.insert(list(range(8)), sb.blocks)
        # blocks still owned by seq too → nothing evictable frees pool
        pc.evict(min_free_target=4)
        assert pool.num_free == 2
        sb.release()  # now cache is sole owner
        pc.evict(min_free_target=4)
        assert pool.num_free == 4

    def _filled(self, policy, n_chains=3):
        """Cache with n_chains one-block chains inserted in order,
        sole-owned by the cache (evictable)."""
        pool = BlockPool(num_blocks=16, page_size=4)
        pc = PrefixCache(pool, policy=policy)
        chains = []
        for i in range(n_chains):
            sb = SequenceBlocks(pool)
            sb.ensure_capacity(4)
            toks = list(range(100 * (i + 1), 100 * (i + 1) + 4))
            pc.insert(toks, sb.blocks)
            chains.append((toks, sb.blocks[0]))
            sb.release()
        return pool, pc, chains

    def test_lru_evicts_least_recently_matched(self):
        pool, pc, chains = self._filled("lru")
        # Touch chain 0 → chain 1 becomes the LRU victim.
        pc.match_prefix(chains[0][0] + [9])
        pc.evict(min_free_target=pool.num_free + 1)
        assert pc.match_prefix(chains[0][0] + [9])[1] == 4
        assert pc.match_prefix(chains[1][0] + [9])[1] == 0

    def test_fifo_evicts_insertion_order_despite_access(self):
        pool, pc, chains = self._filled("fifo")
        # Touch chain 0 repeatedly; FIFO still evicts it first.
        pc.match_prefix(chains[0][0] + [9])
        pc.match_prefix(chains[0][0] + [9])
        pc.evict(min_free_target=pool.num_free + 1)
        assert pc.match_prefix(chains[0][0] + [9])[1] == 0
        assert pc.match_prefix(chains[1][0] + [9])[1] == 4

    def test_clock_second_chance(self):
        pool, pc, chains = self._filled("clock")
        # Referenced bit on chain 0 spares it one sweep: chain 1 goes.
        pc.match_prefix(chains[0][0] + [9])
        pc.evict(min_free_target=pool.num_free + 1)
        assert pc.match_prefix(chains[0][0] + [9])[1] == 4
        assert pc.match_prefix(chains[1][0] + [9])[1] == 0
        # Second eviction: chain 0's bit was re-set by the match above,
        # chain 2 (unreferenced) goes first.
        pc.evict(min_free_target=pool.num_free + 1)
        assert pc.match_prefix(chains[0][0] + [9])[1] == 4
        assert pc.match_prefix(chains[2][0] + [9])[1] == 0

    def test_unknown_policy_rejected(self):
        pool = BlockPool(num_blocks=4, page_size=4)
        with pytest.raises(ValueError):
            PrefixCache(pool, policy="mru")


class TestContinuousScheduler:
    def make(self, max_num_seqs=4, blocks=32, budget=64, chunk=8,
             policy="continuous", prefix=False):
        cfg = EngineConfig(max_num_seqs=max_num_seqs, kv_num_blocks=blocks,
                           kv_block_size=4, max_num_batched_tokens=budget,
                           prefill_chunk_size=chunk, max_model_len=128,
                           decode_multi_step=1)
        pool = BlockPool(blocks, cfg.kv_block_size)
        pc = PrefixCache(pool) if prefix else None
        return ContinuousBatchScheduler(cfg, pool, pc, policy=policy), pool

    def run_prefill(self, sched, batch):
        for c in batch.prefill_chunks:
            sched.note_prefill_done(c)

    def test_admission_and_chunking(self):
        sched, _ = self.make(chunk=8)
        seq = mkseq(n_prompt=20)
        sched.submit(seq)
        b1 = sched.next_batch()
        assert len(b1.prefill_chunks) == 1
        assert len(b1.prefill_chunks[0].tokens) == 8
        assert not b1.prefill_chunks[0].is_last
        self.run_prefill(sched, b1)
        b2 = sched.next_batch()
        self.run_prefill(sched, b2)
        b3 = sched.next_batch()
        assert b3.prefill_chunks[0].is_last
        assert len(b3.prefill_chunks[0].tokens) == 4
        self.run_prefill(sched, b3)
        assert seq.phase == Phase.DECODING
        b4 = sched.next_batch()
        assert b4.decode_seqs == [seq]

    def test_token_budget_mixes_decode_and_prefill(self):
        sched, _ = self.make(budget=10, chunk=8)
        s1 = mkseq(n_prompt=6)
        sched.submit(s1)
        b = sched.next_batch()
        self.run_prefill(sched, b)
        s2 = mkseq(n_prompt=20)
        sched.submit(s2)
        b = sched.next_batch()
        # 1 decode token + 8-token chunk <= 10 budget
        assert len(b.decode_seqs) == 1
        assert len(b.prefill_chunks) == 1
        assert len(b.prefill_chunks[0].tokens) <= 9

    def test_slots_bound_admission(self):
        sched, _ = self.make(max_num_seqs=2)
        for _ in range(4):
            sched.submit(mkseq(n_prompt=4))
        b = sched.next_batch()
        assert len(b.admitted) == 2
        assert len(sched.waiting) == 2

    def test_preemption_recompute_on_kv_pressure(self):
        # 8 blocks of 4 → 32 token capacity total.
        sched, pool = self.make(max_num_seqs=4, blocks=8, budget=64, chunk=8)
        s1, s2 = mkseq(n_prompt=12, max_tokens=20), mkseq(n_prompt=12, max_tokens=20)
        sched.submit(s1)
        sched.submit(s2)
        for _ in range(3):
            b = sched.next_batch()
            self.run_prefill(sched, b)
        assert s1.phase == Phase.DECODING and s2.phase == Phase.DECODING
        # Grow both until the pool can't hold a new block for s1's decode.
        preempted_seen = False
        for step in range(30):
            b = sched.next_batch()
            if b.preempted:
                preempted_seen = True
                victim = b.preempted[0]
                # Victim lost its KV and restarts from scratch; it is either
                # still waiting or already re-admitted for recompute in the
                # same iteration (capacity-deferred recompute re-admission).
                assert victim.preempt_count == 1
                if victim in sched.waiting:
                    assert victim.phase == Phase.PREEMPTED
                    assert victim.prefilled == 0
                else:
                    assert victim.phase == Phase.PREFILLING
                    assert victim in b.admitted
                break
            for s in b.decode_seqs:
                s.output_tokens.append(7)
            self.run_prefill(sched, b)
        assert preempted_seen

    def test_recompute_prefills_prompt_plus_outputs(self):
        """After a preemption with generated tokens, the recompute prefill
        must cover prompt AND outputs (ADVICE r1 high: decode would read
        zero/stale KV for the lost output positions otherwise)."""
        sched, pool = self.make(max_num_seqs=2, blocks=32, budget=64,
                                chunk=8)
        seq = mkseq(n_prompt=8, max_tokens=16)
        sched.submit(seq)
        b = sched.next_batch()
        self.run_prefill(sched, b)
        assert seq.phase == Phase.DECODING
        # Simulate 5 decoded tokens, then preempt.
        seq.output_tokens.extend([7, 8, 9, 10, 11])
        b2 = sched.next_batch()
        victim = sched._preempt_victim(b2, exclude=None)
        assert victim is seq and seq.recompute
        assert seq.prefill_target == seq.prompt_tokens + seq.output_tokens
        assert seq.prefilled == 0
        # Re-admission chunks over the 13-token target (8+5), not just
        # the 8-token prompt.
        got = []
        for _ in range(4):
            b3 = sched.next_batch()
            for c in b3.prefill_chunks:
                got.extend(c.tokens)
                if c.is_last:
                    assert c.start + len(c.tokens) == 13
            self.run_prefill(sched, b3)
            if seq.phase == Phase.DECODING:
                break
        assert got == seq.prompt_tokens + seq.output_tokens
        assert seq.phase == Phase.DECODING
        assert not seq.recompute
        # Decode resumes at the position after the last generated token.
        assert seq.next_position() == 12

    def test_finish_releases_resources(self):
        sched, pool = self.make()
        seq = mkseq(n_prompt=8)
        sched.submit(seq)
        b = sched.next_batch()
        self.run_prefill(sched, b)
        free_before = pool.num_free
        sched.finish(seq)
        assert pool.num_free > free_before
        assert seq.phase == Phase.FINISHED
        assert len(sched._free_slots) == sched.cfg.max_num_seqs

    def test_priority_policy_orders_waiting(self):
        sched, _ = self.make(max_num_seqs=1, policy="priority")
        lo = mkseq(n_prompt=4, priority=0)
        hi = mkseq(n_prompt=4, priority=5)
        sched.submit(lo)
        sched.submit(hi)
        b = sched.next_batch()
        assert b.admitted == [hi]

    def test_prefix_cache_reuse_skips_prefill(self):
        sched, pool = self.make(prefix=True, chunk=8, blocks=32)
        tokens = list(range(50, 66))  # 16 tokens = 4 blocks
        req1 = InferenceRequest(prompt_token_ids=tokens,
                                sampling=SamplingParams(max_tokens=4))
        s1 = Sequence(req1, tokens)
        sched.submit(s1)
        while s1.phase != Phase.DECODING:
            self.run_prefill(sched, sched.next_batch())
        sched.finish(s1)
        # Second identical prompt: only the tail should need prefill
        # (ref: prefix_cache_test asserts prefill_count()==1 on 2nd prompt).
        s2 = Sequence(InferenceRequest(prompt_token_ids=tokens,
                                       sampling=SamplingParams(max_tokens=4)),
                      tokens)
        sched.submit(s2)
        b = sched.next_batch()
        assert s2.prefix_reused_tokens == 12  # 3 of 4 blocks (last token kept)
        assert len(b.prefill_chunks[0].tokens) == 4
        assert b.prefill_chunks[0].is_last
