"""Sampling utilities vs the reference semantics (models/utils.py:46-88)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.ops import best_beam_index, top_k_top_p_filter, topk_sampling
from valle2_tpu.ops.masks import NEG_INF


class TestTopKTopP:
    def test_top_k_keeps_k_highest(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(4, 100))
        out = np.asarray(top_k_top_p_filter(logits, top_k=10))
        for row, orig in zip(out, np.asarray(logits)):
            kept = row > NEG_INF / 2
            assert kept.sum() == 10
            np.testing.assert_array_equal(np.sort(np.where(kept)[0]),
                                          np.sort(np.argsort(orig)[-10:]))

    def test_top_p_mass(self):
        # Peaked distribution: top_p=0.9 keeps only tokens covering 0.9 mass (+1).
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(top_k_top_p_filter(logits, top_p=0.9))
        kept = out[0] > NEG_INF / 2
        np.testing.assert_array_equal(kept, [True, True, True, False])

    def test_top_p_always_keeps_best(self):
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        out = np.asarray(top_k_top_p_filter(logits, top_p=0.01))
        assert (out[0] > NEG_INF / 2).sum() == 1

    def test_matches_torch_reference_filtering(self):
        """Mirror of the (removed) transformers top_k_top_p_filtering semantics."""
        import torch
        rs = np.random.RandomState(1)
        logits = rs.randn(3, 50).astype(np.float32)
        got = np.asarray(top_k_top_p_filter(jnp.asarray(logits), top_k=8, top_p=0.8))

        t = torch.from_numpy(logits.copy())
        # top-k: filter logits < kth value
        kth = torch.topk(t, 8)[0][..., -1, None]
        t[t < kth] = -float('inf')
        # top-p on the filtered logits, shift-right keep-first
        sorted_logits, sorted_idx = torch.sort(t, descending=True)
        cum = torch.softmax(sorted_logits, dim=-1).cumsum(dim=-1)
        remove = cum > 0.8
        remove[..., 1:] = remove[..., :-1].clone()
        remove[..., 0] = False
        for row in range(3):
            t[row, sorted_idx[row][remove[row]]] = -float('inf')
        want_kept = t.numpy() > -1e29
        np.testing.assert_array_equal(got > NEG_INF / 2, want_kept)


class TestTopkSampling:
    def test_greedy_is_argmax(self):
        logits = jnp.asarray(np.random.RandomState(2).randn(5, 30))
        samples, lp = topk_sampling(jax.random.key(0), logits, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(samples),
                                      np.asarray(logits).argmax(-1))
        assert np.all(np.asarray(lp) <= 0)

    def test_samples_within_topk(self):
        logits = jnp.asarray(np.random.RandomState(3).randn(64, 100))
        samples, _ = topk_sampling(jax.random.key(1), logits, top_k=5, temperature=1.0)
        topk_sets = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
        for s, allowed in zip(np.asarray(samples), topk_sets):
            assert s in allowed

    def test_logprob_is_log_softmax_of_filtered(self):
        logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
        samples, lp = topk_sampling(jax.random.key(2), logits, top_k=2, temperature=1.0)
        filtered = np.array([2.0, 1.0, -np.inf, -np.inf])
        expected = filtered - np.log(np.exp(2.0) + np.exp(1.0))
        assert abs(float(lp[0]) - expected[int(samples[0])]) < 1e-4


class TestBestBeam:
    def test_picks_length_penalized_max(self):
        eos = 99
        codes = jnp.asarray([[1, 2, eos, eos], [1, 2, 3, 4]])
        # beam 0: len 2, beam 1: len 4
        lp = jnp.asarray([-1.0, -1.5])
        # avg: -0.5 vs -0.375 → beam 1
        assert int(best_beam_index(codes, lp, eos, 1.0)) == 1
        # stronger penalty flips it: len^2 → -0.25 vs -0.09375 → still beam 1
        assert int(best_beam_index(codes, lp, eos, 2.0)) == 1
        lp2 = jnp.asarray([-1.0, -4.0])
        assert int(best_beam_index(codes, lp2, eos, 1.0)) == 0
