"""Speculative decoding verification math (ref: spec_decode_test.rs +
the lossless-distribution property of rejection sampling)."""

import numpy as np
import pytest

from ferrum_tpu.engine.speculative import verify_speculation


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_greedy_matching_draft_accepts_all():
    v, k = 16, 4
    rng = np.random.default_rng(0)
    target = softmax(rng.normal(size=(k + 1, v)))
    draft_tokens = target[:k].argmax(-1)
    res = verify_speculation(draft_tokens, target[:k], target, rng,
                             greedy=True)
    assert res.num_draft_accepted == k
    assert res.used_bonus
    assert res.accepted_tokens[:k] == list(draft_tokens)
    assert res.accepted_tokens[k] == int(target[k].argmax())


def test_greedy_mismatch_corrects_at_first_divergence():
    v, k = 16, 4
    rng = np.random.default_rng(1)
    target = softmax(rng.normal(size=(k + 1, v)))
    draft_tokens = target[:k].argmax(-1).copy()
    draft_tokens[2] = (draft_tokens[2] + 1) % v  # diverge at step 2
    res = verify_speculation(draft_tokens, target[:k], target, rng,
                             greedy=True)
    assert res.num_draft_accepted == 2
    assert not res.used_bonus
    assert res.accepted_tokens[-1] == int(target[2].argmax())
    assert len(res.accepted_tokens) == 3


def test_distribution_losslessness():
    """The first emitted token's distribution must equal the target
    distribution regardless of the draft (the core spec-decoding
    guarantee)."""
    v = 8
    rng = np.random.default_rng(2)
    target = softmax(rng.normal(size=(2, v)) * 1.5)
    draft = softmax(rng.normal(size=(1, v)) * 1.5)

    counts = np.zeros(v)
    n = 40000
    for i in range(n):
        dt = np.array([rng.choice(v, p=draft[0])])
        res = verify_speculation(dt, draft, target, rng)
        counts[res.accepted_tokens[0]] += 1
    emp = counts / n
    np.testing.assert_allclose(emp, target[0], atol=0.015)


def test_acceptance_rate_improves_with_draft_quality():
    v, k = 12, 3
    rng = np.random.default_rng(3)
    target = softmax(rng.normal(size=(k + 1, v)) * 2)

    def run(draft_probs, trials=2000):
        acc = 0
        for _ in range(trials):
            dt = np.array([rng.choice(v, p=draft_probs[i])
                           for i in range(k)])
            res = verify_speculation(dt, draft_probs, target, rng)
            acc += res.num_draft_accepted
        return acc / (trials * k)

    good = run(target[:k])                       # draft == target
    bad = run(np.full((k, v), 1.0 / v))          # uniform draft
    assert good > bad
    assert good > 0.9
