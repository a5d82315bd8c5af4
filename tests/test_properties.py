"""Property-based tests (hypothesis): invariants that hold for ANY input, not
just the golden cases — frontend total-ness, sampling support membership,
quantization error bounds.

Shapes are fixed inside each property (one jit compile per test, values drawn
per example) so the suite stays fast on one CPU core."""

import re

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from valle2_tpu.data.frontend import PhonemeTokenizer, normalize_text
from valle2_tpu.ops.sampling import topk_sampling
from valle2_tpu.quantize import int8_matmul, quantize_linear

TOK = PhonemeTokenizer()        # built once; construction scans the lexicon


class TestFrontendProperties:
    @given(st.text(max_size=120))
    @settings(max_examples=150, deadline=None)
    def test_tokenizer_total_and_in_vocab(self, text):
        """Any text tokenizes without raising, to ids inside the vocab."""
        ids = TOK(text)
        assert ids.dtype == np.int32
        if len(ids):
            assert int(ids.min()) >= 0
            assert int(ids.max()) < TOK.vocab_size

    @given(st.text(alphabet=st.characters(codec='ascii'), max_size=120))
    @settings(max_examples=150, deadline=None)
    def test_normalize_consumes_ascii_digits(self, text):
        """No ASCII digit survives normalization (g2p_en normalize_numbers
        contract: digits become words, never silently dropped)."""
        out = normalize_text(text)
        assert not re.search(r'[0-9]', out), out

    @given(st.integers(min_value=0, max_value=10 ** 15 - 1))
    @settings(max_examples=300, deadline=None)
    def test_int_to_words_total_and_wordy(self, n):
        from valle2_tpu.data.frontend import _int_to_words
        words = _int_to_words(n)
        assert words and re.fullmatch(r'[a-z ]+', words)


class TestSamplingProperties:
    # allow_subnormal=False throughout: XLA flushes subnormals to zero on
    # device, so a host-side comparison against the unflushed value reports a
    # phantom violation (e.g. -3.2e-39 ties a 0.0 threshold on device).
    @given(hnp.arrays(np.float32, (4, 64),
                      elements=st.floats(-30, 30, width=32, allow_subnormal=False)))
    @settings(max_examples=60, deadline=None)
    def test_samples_come_from_topk_support(self, logits):
        """With top_p=1, every sample is one of the top-k logits of its row."""
        k = 8
        samples, logprobs = topk_sampling(jax.random.key(0),
                                          jnp.asarray(logits), top_k=k,
                                          tok_p=1.0, temperature=1.0)
        samples = np.asarray(samples)
        for r in range(logits.shape[0]):
            topk = set(np.argsort(logits[r])[-k:].tolist())
            # Ties at the k-th value make membership ambiguous by index; accept
            # any index whose VALUE is >= the k-th largest value.
            kth = np.sort(logits[r])[-k]
            assert samples[r] in topk or logits[r][samples[r]] >= kth
        assert np.all(np.asarray(logprobs) <= 1e-6)   # log-probabilities

    @given(hnp.arrays(np.float32, (3, 32),
                      elements=st.floats(-30, 30, width=32, allow_subnormal=False)),
           st.integers(0, 2 ** 31 - 1))
    @settings(max_examples=60, deadline=None)
    def test_temperature_zero_is_argmax(self, logits, seed):
        samples, _ = topk_sampling(jax.random.key(seed), jnp.asarray(logits),
                                   top_k=50, tok_p=1.0, temperature=0.0)
        want = logits.argmax(axis=-1)
        got = np.asarray(samples)
        # Greedy must be rng-independent; ties may legitimately pick either
        # index, so compare by VALUE.
        np.testing.assert_array_equal(
            logits[np.arange(len(want)), want],
            logits[np.arange(len(got)), got])


class TestQuantizeProperties:
    @given(hnp.arrays(np.float32, (6, 32),
                      elements=st.floats(-4, 4, width=32, allow_subnormal=False)),
           hnp.arrays(np.float32, (32, 16),
                      elements=st.floats(-4, 4, width=32, allow_subnormal=False)))
    @settings(max_examples=40, deadline=None)
    def test_int8_matmul_error_envelope(self, x, w):
        """|int8_matmul - x@w| <= sum of the worst-case weight and activation
        rounding contributions (per row/channel scales, half-step each)."""
        qp = quantize_linear({'w': jnp.asarray(w)})
        got = np.asarray(int8_matmul(jnp.asarray(x), qp['q'], qp['scale']))
        want = x @ w
        sw = np.asarray(qp['scale'])                       # (out,)
        sx = np.maximum(np.max(np.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
        d = x.shape[-1]
        # err <= 0.5*sx*sum|w_col| (activation rounding) + 0.5*sw*sum|x_row|
        #        + 0.25*d*sx*sw (cross term), plus tiny float slack.
        bound = (0.5 * sx * np.abs(w).sum(0)[None, :]
                 + 0.5 * np.abs(x).sum(-1, keepdims=True) * sw[None, :]
                 + 0.25 * d * sx * sw[None, :] + 1e-4)
        assert (np.abs(got - want) <= bound).all()
