"""On-device batched sampling (runs inside the compiled decode step).

TPU-native analog of the reference's logits-processor chain + GPU argmax
fast path (ferrum-interfaces/src/sampler.rs:142-383, traits.rs:1534
argmax-rows incl. the sparse repetition-penalty variant): temperature,
repetition penalty, top-k, top-p and the final draw all execute on
device over the whole slot batch, so greedy decoding never reads logits
back to the host.

Per-slot parameter arrays select behavior branchlessly:
  temperature == 0  → greedy argmax (penalties still apply)
  top_k == 0        → disabled; top_p == 1.0 → disabled

Exactness: the sampled path draws from the top `TOPK_CAP` logits
(static). With top_k <= cap this is exact; pure top-p sampling is
truncated to the cap's probability mass (documented approximation; the
host sampler in sampling/host.py is the exact oracle used by tests and
by the guided-decoding path).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

TOPK_CAP = 256


class SlotSamplingParams(NamedTuple):
    """Per-slot device arrays, assembled by the engine at admission."""

    temperature: jnp.ndarray        # f32 [S]
    top_k: jnp.ndarray              # int32 [S] (0 = off)
    top_p: jnp.ndarray              # f32 [S] (1.0 = off)
    repetition_penalty: jnp.ndarray  # f32 [S] (1.0 = off)
    min_tokens_active: jnp.ndarray  # bool [S] — suppress EOS while True


def apply_repetition_penalty(logits: jnp.ndarray, counts: jnp.ndarray,
                             penalty: jnp.ndarray) -> jnp.ndarray:
    """HF/vLLM convention: for seen tokens, positive logits are divided
    by p, negative multiplied by p (ref: RepetitionPenaltyProcessor)."""
    seen = counts > 0
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def sample_step(
    logits: jnp.ndarray,            # f32 [S, V]
    params: SlotSamplingParams,
    counts: jnp.ndarray,            # int32/uint8 [S, V] token-seen counts
    keys: jnp.ndarray,              # uint32 [S, 2] per-slot PRNG keys
    eos_ids: Tuple[int, ...],
    greedy_only: bool = False,
    allowed_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens int32 [S], new_keys uint32 [S,2]).

    greedy_only (static): all slots are temperature==0 — skip the
    top-k/top-p machinery entirely (a top_k over a 150k vocab is far
    more expensive than the argmax; the runner picks this variant when
    the whole batch is greedy — the FERRUM_GREEDY_ARGMAX fast path).

    allowed_mask (bool [S, V], optional): guided-decoding hard mask
    applied before everything else (device-FSM path; rows of slots
    without guidance are all-True).
    """
    s, v = logits.shape
    if allowed_mask is not None:
        logits = jnp.where(allowed_mask, logits, -jnp.inf)
    logits = apply_repetition_penalty(logits, counts,
                                      params.repetition_penalty)
    if eos_ids:
        eos = jnp.zeros((v,), bool).at[jnp.asarray(eos_ids)].set(True)
        logits = jnp.where(params.min_tokens_active[:, None] & eos[None, :],
                           -jnp.inf, logits)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        return greedy_tok, keys

    # --- sampled path over top-cap candidates ---
    temp = jnp.maximum(params.temperature, 1e-5)[:, None]
    k_cap = min(TOPK_CAP, v)
    vals, idx = jax.lax.top_k(logits / temp, k_cap)      # [S, cap] desc
    rank = jax.lax.broadcasted_iota(jnp.int32, (s, k_cap), 1)
    k_eff = jnp.where(params.top_k[:, None] > 0,
                      params.top_k[:, None], k_cap)
    vals = jnp.where(rank < k_eff, vals, -jnp.inf)
    probs = jax.nn.softmax(vals, axis=-1)
    # top-p: keep tokens while cumulative prob before them < top_p
    # (always keep rank 0).
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep = (cum_before < params.top_p[:, None]) | (rank == 0)
    vals = jnp.where(keep, vals, -jnp.inf)

    typed_keys = jax.vmap(jax.random.wrap_key_data)(keys)
    draw_key, next_key = jax.vmap(lambda k: tuple(jax.random.split(k)))(
        typed_keys)
    gumbel = jax.vmap(
        lambda k, sh=(k_cap,): jax.random.gumbel(k, sh))(draw_key)
    choice = jnp.argmax(vals + gumbel, axis=-1)
    sampled_tok = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    tokens = jnp.where(params.temperature <= 0.0, greedy_tok,
                       sampled_tok.astype(jnp.int32))
    new_keys = jax.vmap(jax.random.key_data)(next_key)
    return tokens, new_keys


def processed_probs(
    logits: jnp.ndarray,            # f32 [S, V]
    params: SlotSamplingParams,
    counts: jnp.ndarray,            # int32 [S, V]
    eos_ids: Tuple[int, ...],
    allowed_mask: Optional[jnp.ndarray] = None,   # bool [S, V] (guided)
) -> jnp.ndarray:
    """Full-vocab post-processing distribution per slot — the exact
    distribution `sample_step` draws from (guided mask → penalty →
    min-tokens EOS mask → temperature → top-k/top-p truncation), as
    probabilities [S, V].

    Used by speculative verification (engine/speculative.py): the
    accept/reject ratio and the residual resample must use the TRUE
    target distribution for the scheme's output to equal target-only
    sampling. Greedy slots (temperature == 0) get a one-hot at argmax.
    """
    s, v = logits.shape
    if allowed_mask is not None:
        logits = jnp.where(allowed_mask, logits, -jnp.inf)
    logits = apply_repetition_penalty(logits, counts,
                                      params.repetition_penalty)
    if eos_ids:
        eos = jnp.zeros((v,), bool).at[jnp.asarray(eos_ids)].set(True)
        logits = jnp.where(params.min_tokens_active[:, None] & eos[None, :],
                           -jnp.inf, logits)
    greedy_tok = jnp.argmax(logits, axis=-1)
    onehot = jax.nn.one_hot(greedy_tok, v, dtype=jnp.float32)

    temp = jnp.maximum(params.temperature, 1e-5)[:, None]
    scaled = logits / temp
    k_cap = min(TOPK_CAP, v)
    vals, idx = jax.lax.top_k(scaled, k_cap)
    rank = jax.lax.broadcasted_iota(jnp.int32, (s, k_cap), 1)
    k_eff = jnp.where(params.top_k[:, None] > 0,
                      params.top_k[:, None], k_cap)
    vals = jnp.where(rank < k_eff, vals, -jnp.inf)
    p_cap = jax.nn.softmax(vals, axis=-1)
    cum_before = jnp.cumsum(p_cap, axis=-1) - p_cap
    keep = (cum_before < params.top_p[:, None]) | (rank == 0)
    vals = jnp.where(keep, vals, -jnp.inf)
    p_cap = jax.nn.softmax(vals, axis=-1)
    # Scatter the capped top-k probs back to full vocab.
    full = jnp.zeros((s, v), jnp.float32)
    full = jax.vmap(lambda f, i, p: f.at[i].set(p))(full, idx, p_cap)
    return jnp.where(params.temperature[:, None] <= 0.0, onehot, full)


def guided_mask_rows(mask_words: jnp.ndarray,   # uint32 [R, W] packed bits
                     states: jnp.ndarray,       # int32 [S] per-slot FSM state
                     vocab: int) -> jnp.ndarray:
    """Gather + unpack each slot's packed guided vocab mask → bool [S, V].
    Row 0 of the table is the FREE state (all ones) used by unguided
    slots, so applying this in a mixed batch is a no-op for them."""
    rows = mask_words[states]                             # [S, W]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (rows[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(states.shape[0], -1)[:, :vocab] != 0


def guided_advance(trans: jnp.ndarray,       # int32 [R, 258] char table
                   token_cps: jnp.ndarray,   # int32 [V, Lmax]
                   states: jnp.ndarray,      # int32 [S]
                   tokens: jnp.ndarray) -> jnp.ndarray:
    """Fold the sampled tokens' codepoints through the transition table
    (device analog of RegexGuidedProcessor.advance). PAD columns keep
    the state, so EOS/special tokens (empty decode) are no-ops; the FREE
    state self-loops for unguided slots."""
    cps = token_cps[tokens]                               # [S, Lmax]

    def body(st, cp):
        return trans[st, cp], None

    st, _ = jax.lax.scan(body, states, cps.T)
    return st


def update_counts(counts: jnp.ndarray, slot_ids: jnp.ndarray,
                  tokens: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add observed tokens into the per-slot seen-count buffer.

    slot_ids/tokens: int32 [N]; out-of-range slot_ids (padding) dropped.
    """
    return counts.at[slot_ids, tokens].add(1, mode="drop")


def reset_slot_counts(counts: jnp.ndarray, slot: int) -> jnp.ndarray:
    return counts.at[slot].set(0)
