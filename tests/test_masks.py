"""Mask builders vs the reference's golden tensors.

Golden values transcribed from /root/reference/tests/test_models_utils.py:7-59 and the
merge_masks unmasked-cell counts from /root/reference/tests/test_modules.py:33-79.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.ops import build_attn_mask, build_pad_mask, merge_masks


def test_attn_mask_golden_5_5():
    # Reference golden tensor for x_len=5, y_len=5 (test_models_utils.py:7-34):
    # token rows: tokens visible, audio masked; audio rows: tokens visible + causal audio.
    got = np.asarray(build_attn_mask(5, 5))
    expected = np.zeros((10, 10), dtype=bool)
    expected[:5, 5:] = True                      # tokens cannot see audio
    for q in range(5, 10):
        expected[q, q + 1:] = True               # audio causal
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('x_len,y_len', [(1, 1), (3, 7), (8, 2), (16, 16)])
def test_attn_mask_structure(x_len, y_len):
    m = np.asarray(build_attn_mask(x_len, y_len))
    assert m.shape == (x_len + y_len, x_len + y_len)
    # Token block: fully visible to itself, blind to audio.
    assert not m[:x_len, :x_len].any()
    assert m[:x_len, x_len:].all()
    # Audio block: all tokens visible; strictly-upper-triangular masked.
    assert not m[x_len:, :x_len].any()
    audio = m[x_len:, x_len:]
    np.testing.assert_array_equal(audio, np.triu(np.ones((y_len, y_len), bool), k=1))
    # Every query row attends to at least one key.
    assert (~m).any(axis=1).all()


def test_pad_mask_golden():
    # Reference test_models_utils.py:37-59: lens -> True on padded positions.
    lens = jnp.array([2, 4, 3])
    got = np.asarray(build_pad_mask(lens, 4))
    expected = np.array([
        [False, False, True, True],
        [False, False, False, False],
        [False, False, True, False * 1 == 1],
    ])
    expected[2] = [False, False, False, True]
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('s,pad_lens,expected_masked_per_row', [
    # causal 4x4, no padding: row q has (3-q) masked keys
    (4, None, None),
])
def test_merge_masks_counts(s, pad_lens, expected_masked_per_row):
    causal = jnp.triu(jnp.ones((s, s), bool), k=1)
    merged = merge_masks(causal, None, batch_size=2)
    assert merged.shape == (2, 1, s, s)
    # Unmasked count for causal s x s = s*(s+1)/2 per batch/head.
    assert (~np.asarray(merged)).sum() == 2 * 1 * s * (s + 1) // 2


def test_merge_masks_with_padding():
    s = 4
    causal = jnp.triu(jnp.ones((s, s), bool), k=1)
    pad = build_pad_mask(jnp.array([2, 4]), s)
    merged = np.asarray(merge_masks(causal, pad, batch_size=2))
    # Batch 0: keys 2,3 masked everywhere in addition to causal.
    assert merged[0, 0, :, 2:].all()
    # Batch 1: pure causal.
    np.testing.assert_array_equal(merged[1, 0], np.triu(np.ones((s, s), bool), k=1))
