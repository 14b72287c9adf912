"""Speculative decoding: ONE fused device program per round.

Engine-integrated analog of the reference's speculative serving loop
(crates/ferrum-engine/src/continuous_engine.rs:3354 `new_with_speculation`,
continuous_engine/inner/decode.rs:386, speculative.rs:151) — redesigned
for TPU dispatch economics. The reference drafts on one stream, scores
on another, and verifies on the host; here the WHOLE round is one XLA
program:

  1. draft phase: K+1 chained decode steps of the draft model
     (lax.scan) — proposes d_1..d_K and writes the draft KV for all
     inputs (the +1 step writes d_K's KV so the next round needs no
     catch-up pass);
  2. verify phase: the target model scores all K+1 positions
     [t_last, d_1..d_K] in ONE forward (prefill_forward_batched with
     row-granular KV appends) — the weight stream is paid once per
     round instead of once per token;
  3. accept/reject ON DEVICE: Leviathan rejection sampling
     (accept d_i w.p. min(1, p_i/q_i); residual resample on first
     rejection; bonus token on full acceptance) with per-slot PRNG
     keys. Only the [S, K+1] token ids + [S] accept counts return to
     the host.

Rounds CHAIN on device exactly like decode windows: the carry
(next token, next position) feeds round R+1 before round R's results
are fetched, hiding the tunnel RTT.

Guarantees: the emitted distribution equals target-only sampling
(tests/test_speculative.py distributional suite + greedy bit-equality
in tests/test_spec_engine.py). Approximation: repetition-penalty counts
and the min-tokens EOS mask are frozen at round start (≤ K+1 tokens of
staleness — same class of approximation as the fused decode window).

KV rollback is free: rejected positions' KV rows are simply
overwritten next round (positions only ever move forward through the
same block tables).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import ModelConfig
from ..models.llama_family import (
    OOB_SENTINEL, ModelParams, PagedKvCache, decode_forward,
    logits_from_hidden, prefill_forward_batched,
)
from ..sampling.device import (
    SlotSamplingParams, guided_advance, guided_mask_rows, processed_probs,
    sample_step,
)
from ..scheduler.sequence import Sequence
from .speculative import SpeculativeStats

PAD_TOKEN = -1


@dataclass
class SpecWindow:
    """An in-flight speculative round (results not yet fetched)."""

    seqs: List["Sequence"]
    covered: frozenset
    out_toks: "jax.Array"          # int32 [S, K+1]; PAD past accept count
    n_out: "jax.Array"             # int32 [S] valid tokens (1..K+1)
    carry_tok: "jax.Array"         # int32 [S] next input token
    carry_pos: "jax.Array"         # int32 [S] its position
    num_steps: int                 # K+1 (max tokens per slot per round)
    deferred: List["Sequence"] = field(default_factory=list)


class SpecDecoder:
    """Owns the draft model state + the fused spec-round programs.

    Wraps a ModelRunner (target); the draft shares the target's block
    tables (same page size / pool geometry), so one allocation covers
    both caches.
    """

    def __init__(self, runner, draft_cfg: ModelConfig,
                 draft_params: ModelParams, k: int):
        self.runner = runner
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params
        self.k = int(k)
        kv = runner.kv
        self.draft_kv = PagedKvCache.create(
            draft_cfg, kv.num_blocks, kv.page,
            dtype=kv.k.dtype)
        self._fns: Dict[Tuple, "jax.stages.Wrapped"] = {}
        self.stats = SpeculativeStats()
        self.device_time = 0.0

    # ------------------------------------------------------------------
    def _get_fn(self, ctx_pad: int, greedy: bool,
                guided: bool = False, grows: int = 0):
        key = (ctx_pad, greedy, guided, grows)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        r = self.runner
        mc_t, mc_d = r.model_cfg, self.draft_cfg
        attn_impl = r.attn_impl
        eos_ids = mc_t.eos_token_ids
        page = r.page
        K = self.k
        num_slots = r.num_slots
        vocab = mc_t.vocab_size

        def spec_round(params_t, params_d, kv_t, kv_d, counts, keys,
                       packed, carry_tok, carry_pos, tables, samp,
                       gstates, ginit, gtrans, gmask, gtokcp):
            # packed int32 [5, S]: tokens, positions, pos_limit,
            # active_slots (== num_slots for dead lanes), use_carry.
            # Guided (spec × FSM composition): the draft samples under
            # the FSM mask advanced along its own proposals, and the
            # target's verify distribution is masked per position with
            # the state reached after the previous (proposed) tokens.
            # Leviathan accept/reject over the MASKED p and q preserves
            # the masked target distribution exactly — same output law
            # as the non-speculative guided window.
            use_carry = packed[4] == 1
            tok0 = jnp.where(use_carry, carry_tok, packed[0])
            pos0 = jnp.where(use_carry, carry_pos, packed[1])
            pos_limit = packed[2]
            active = packed[3]
            s = tok0.shape[0]
            if guided:
                # Drain queued FSM resets (slot space), then gather the
                # per-lane start state (dead lanes → FREE row 0 via
                # clip; their outputs are discarded anyway).
                gstates = jnp.where(ginit >= 0, ginit, gstates)
                st0 = gstates[jnp.clip(active, 0, num_slots - 1)]
                st0 = jnp.where(active < num_slots, st0, 0)
            else:
                st0 = jnp.zeros(s, jnp.int32)
            temps = samp["temps"]
            sp_draft = SlotSamplingParams(
                temps, samp["top_ks"], samp["top_ps"],
                jnp.ones_like(samp["pens"]),
                jnp.zeros(s, bool))
            sp_target = SlotSamplingParams(
                temps, samp["top_ks"], samp["top_ps"], samp["pens"],
                jnp.zeros(s, bool))

            def flat_for(pos):
                page_idx = pos // page
                block = jnp.take_along_axis(
                    tables, jnp.clip(page_idx, 0, tables.shape[1] - 1)
                    [:, None], axis=1)[:, 0]
                flat = block * page + pos % page
                return jnp.where((pos < pos_limit) & (active < s),
                                 flat, OOB_SENTINEL)

            # --- 1. draft: K+1 chained steps (the +1 writes d_K's KV) ---
            def dbody(carry, _):
                tok, pos, kv_d, keys, st = carry
                h, kv_d = decode_forward(
                    params_d, mc_d, kv_d, tok, pos, tables, pos + 1,
                    flat_for(pos), ctx_pad=ctx_pad, attn_impl=attn_impl)
                logits = logits_from_hidden(params_d, mc_d, h)
                mask = guided_mask_rows(gmask, st, vocab) if guided \
                    else None
                nxt, keys = sample_step(logits, sp_draft, counts, keys,
                                        (), greedy_only=greedy,
                                        allowed_mask=mask)
                if greedy:
                    q = jnp.zeros((s, 0), jnp.float32)  # unused
                else:
                    q = processed_probs(logits, sp_draft, counts, (),
                                        allowed_mask=mask)
                st2 = guided_advance(gtrans, gtokcp, st, nxt) if guided \
                    else st
                # ys carries the PRE-advance state: position i's verify
                # mask needs the state after proposals d_1..d_i.
                return (nxt, pos + 1, kv_d, keys, st2), (nxt, q, st)

            (_, _, kv_d, keys, _), (d_toks, q_full, st_steps) = \
                jax.lax.scan(dbody, (tok0, pos0, kv_d, keys, st0),
                             None, length=K + 1)
            # d_toks [K+1, S]: d_1..d_{K+1}; only d_1..d_K are proposals.
            drafts = d_toks[:K]                       # [K, S]

            # --- 2. verify: target scores K+1 positions in one pass ---
            offs = jnp.arange(K + 1, dtype=jnp.int32)
            tokens_t = jnp.concatenate(
                [tok0[:, None], drafts.T], axis=1)    # [S, K+1]
            positions_t = pos0[:, None] + offs[None, :]
            flats_t = jax.vmap(flat_for, in_axes=1, out_axes=1)(
                positions_t)
            h, kv_t = prefill_forward_batched(
                params_t, mc_t, kv_t, tokens_t, positions_t, tables,
                pos0 + K + 1, flats_t, ctx_pad=ctx_pad,
                attn_impl=attn_impl, append="rows")   # [S, K+1, H]
            logits_t = logits_from_hidden(
                params_t, mc_t, h.reshape(s * (K + 1), -1)
            ).reshape(s, K + 1, vocab)

            # --- 3. accept/reject on device ---
            if guided:
                # Per-position FSM masks: position i's candidates are
                # constrained by the state after d_1..d_i (st_steps[i]).
                mask_skv = jax.vmap(
                    lambda st: guided_mask_rows(gmask, st, vocab),
                    in_axes=0, out_axes=1)(st_steps)  # [S, K+1, V]
                logits_t = jnp.where(mask_skv, logits_t, -jnp.inf)
            if greedy:
                tgt = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
                accept = tgt[:, :K] == drafts.T               # [S, K]
                acc_prefix = jnp.cumprod(
                    accept.astype(jnp.int32), axis=1)
                n = jnp.sum(acc_prefix, axis=1)               # [S]
                # Rejection correction AND full-acceptance bonus are both
                # the target argmax at position n.
                extra = jnp.take_along_axis(
                    tgt, n[:, None], axis=1)[:, 0]
            else:
                p_full = jax.vmap(
                    lambda lg: processed_probs(lg, sp_target, counts,
                                               eos_ids),
                    in_axes=1, out_axes=1)(logits_t)  # [S, K+1, V]
                d_sk = drafts.T                               # [S, K]
                p_d = jnp.take_along_axis(
                    p_full[:, :K], d_sk[:, :, None], axis=2)[:, :, 0]
                # q distributions for steps 0..K-1 (those produced the
                # K proposals); step K's q belongs to the unused d_{K+1}.
                q_skv = jnp.moveaxis(q_full, 0, 1)[:, :K]     # [S, K, V]
                q_d = jnp.take_along_axis(
                    q_skv, d_sk[:, :, None], axis=2)[:, :, 0]
                typed = jax.vmap(jax.random.wrap_key_data)(keys)
                ks = jax.vmap(lambda kk: tuple(jax.random.split(kk, 3)))(
                    typed)
                u = jax.vmap(lambda kk: jax.random.uniform(kk, (K,)))(
                    ks[0])                                    # [S, K]
                accept = u * q_d < p_d
                acc_prefix = jnp.cumprod(
                    accept.astype(jnp.int32), axis=1)
                n = jnp.sum(acc_prefix, axis=1)
                # Residual distribution at the first rejected position;
                # on full acceptance row n == K selects the bonus
                # distribution p_full[K] with q == 0.
                q_pad = jnp.concatenate(
                    [q_skv, jnp.zeros((s, 1, vocab))], axis=1)
                p_n = jnp.take_along_axis(
                    p_full, n[:, None, None], axis=1)[:, 0]   # [S, V]
                q_n = jnp.take_along_axis(
                    q_pad, n[:, None, None], axis=1)[:, 0]
                res = jnp.maximum(p_n - q_n, 0.0)
                # Degenerate residual (p ≈ q): fall back to p itself.
                res = jnp.where(
                    jnp.sum(res, axis=-1, keepdims=True) > 1e-9,
                    res, p_n)
                g = jax.vmap(
                    lambda kk: jax.random.gumbel(kk, (vocab,)))(ks[1])
                extra = jnp.argmax(
                    jnp.where(res > 0, jnp.log(res), -jnp.inf) + g,
                    axis=-1).astype(jnp.int32)
                keys = jax.vmap(jax.random.key_data)(ks[2])

            # out[:, i] = d_{i+1} while i < n, the corrected/bonus token
            # at i == n, PAD beyond.
            d_cols = jnp.concatenate(
                [drafts.T, jnp.zeros((s, 1), jnp.int32)], axis=1)
            pos_i = offs[None, :]
            out = jnp.where(pos_i < n[:, None], d_cols,
                            jnp.where(pos_i == n[:, None],
                                      extra[:, None], PAD_TOKEN))

            # --- 4. state: counts for accepted tokens; carry ---
            valid = pos_i <= n[:, None]
            safe = jnp.where(valid, out, vocab)
            slot_rows = jnp.broadcast_to(active[:, None], safe.shape)
            counts = counts.at[slot_rows, safe].add(1, mode="drop")
            n_out = n + 1
            carry_tok2 = extra
            carry_pos2 = pos0 + n_out
            if guided:
                # Advance the slot FSM state along the ACCEPTED tokens
                # (d_1..d_{n-1} match the draft path, position n is the
                # corrected/bonus token), then scatter back slot-space.
                def gbody(st, j):
                    tokj = jnp.clip(out[:, j], 0, vocab - 1)
                    stepped = guided_advance(gtrans, gtokcp, st, tokj)
                    return jnp.where(j < n_out, stepped, st), None
                st_fin, _ = jax.lax.scan(gbody, st0, offs)
                gstates = gstates.at[active].set(st_fin, mode="drop")
            return (out, n_out, carry_tok2, carry_pos2,
                    kv_t, kv_d, counts, keys, gstates)

        fn = jax.jit(spec_round, donate_argnums=(2, 3, 4, 5, 11))
        self._fns[key] = fn
        self.runner.compilations += 1
        return fn

    # ------------------------------------------------------------------
    def start_round(self, seqs: List[Sequence],
                    prev: Optional[SpecWindow] = None) -> SpecWindow:
        """Dispatch one speculative round without waiting for results."""
        r = self.runner
        s = r.num_slots
        K = self.k
        packed = np.zeros((5, s), np.int32)
        packed[3] = s                                 # dead-lane sentinel
        max_len = 2
        for seq in seqs:
            sl = seq.slot
            rid = seq.request.request_id
            if prev is not None and rid in prev.covered:
                packed[4, sl] = 1                     # device carry
                pos_hint = seq.total_tokens - 1 + 2 * (K + 1)
            else:
                packed[0, sl] = seq.all_tokens[-1]
                packed[1, sl] = seq.next_position()
                pos_hint = packed[1, sl] + (K + 1)
            packed[2, sl] = len(seq.blocks.blocks) * r.page
            packed[3, sl] = sl
            max_len = max(max_len, pos_hint)
        r._sync_tables(seqs)

        ctx_pad = r.ctx_bucket(int(max_len) + K + 1)
        greedy = bool(all(r._temps[seq.slot] == 0 for seq in seqs))
        guided = any(getattr(seq, "guided_fsm_offset", None) is not None
                     for seq in seqs)
        if guided:
            gtrans, gmask, grows = r._guided_tables()
            ginit = jnp.asarray(r._ginit_row())
            gtokcp = r._gtokcp_dev
        else:
            gtrans, gmask, grows = r._gdummy()
            ginit = r._gdummy_init
            gtokcp = r._gdummy_tokcp
        fn = self._get_fn(ctx_pad, greedy, guided, grows)
        if prev is not None:
            carry_tok, carry_pos = prev.carry_tok, prev.carry_pos
        else:
            carry_tok = jnp.zeros(s, jnp.int32)
            carry_pos = jnp.zeros(s, jnp.int32)
        t0 = time.perf_counter()
        (out, n_out, ct, cp, r.kv, self.draft_kv, r.counts, r.keys,
         r._gstates) = fn(
            r.params, self.draft_params, r.kv, self.draft_kv,
            r.counts, r.keys, jnp.asarray(packed), carry_tok, carry_pos,
            r._tables_dev, r.samp, r._gstates, ginit, gtrans, gmask,
            gtokcp)
        self.device_time += time.perf_counter() - t0
        return SpecWindow(
            seqs=list(seqs),
            covered=frozenset(seq.request.request_id for seq in seqs),
            out_toks=out, n_out=n_out, carry_tok=ct, carry_pos=cp,
            num_steps=K + 1)

    def sync_round(self, window: SpecWindow) -> Dict[str, List[int]]:
        """Fetch a round's accepted tokens (one blocking sync)."""
        t0 = time.perf_counter()
        toks = np.asarray(window.out_toks)            # [S, K+1]
        ns = np.asarray(window.n_out)                 # [S]
        self.runner.decode_sync_time += time.perf_counter() - t0
        out: Dict[str, List[int]] = {}
        for seq in window.seqs:
            sl = seq.slot
            n = int(ns[sl])
            out[seq.request.request_id] = toks[sl, :n].tolist()
            self.stats.proposals += 1
            self.stats.drafted_tokens += self.k
            self.stats.accepted_tokens += n - 1
        return out
