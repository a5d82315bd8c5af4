"""Long-form synthesis: sentence segmentation + per-sentence streaming with
optional prompt chaining.

``max_audio_len`` bounds ONE AR decode; ``synthesize_longform`` makes total
output length unbounded by segmenting text into sentences and streaming each
through the chunked decode.  carry='prompt' must reproduce per-sentence
``synthesize_streaming`` exactly (greedy); carry='chain' conditions each
sentence on the previous one's refined codes.  (No reference counterpart:
the reference's generate is one bounded host loop,
/root/reference/valle/models/valle_ar.py:92-180.)
"""

import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.data.frontend import split_sentences
from valle2_tpu.tts import ValleTTS


def tiny_cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                max_audio_len=12, num_beams=1, dropout=0.0, temperature=0.0,
                bucket_sizes=(32, 64, 128))
    base.update(kw)
    return ConfigValle(**base)


class TestSplitSentences:
    def test_basic(self):
        assert split_sentences('Hello there. How are you? Fine!') == \
            ['Hello there.', 'How are you?', 'Fine!']

    def test_abbreviations_do_not_split(self):
        assert split_sentences('Mr. Smith met Dr. Jones. They left.') == \
            ['Mr. Smith met Dr. Jones.', 'They left.']
        assert split_sentences('Use tools, e.g. a hammer. Then stop.') == \
            ['Use tools, e.g. a hammer.', 'Then stop.']

    def test_initials_do_not_split(self):
        assert split_sentences('J. K. Rowling wrote it. Read it.') == \
            ['J. K. Rowling wrote it.', 'Read it.']

    def test_decimals_do_not_split(self):
        assert split_sentences('It costs 3.5 dollars. Pay up.') == \
            ['It costs 3.5 dollars.', 'Pay up.']

    def test_no_final_punctuation_is_one_sentence(self):
        assert split_sentences('no punctuation here') == \
            ['no punctuation here']

    def test_empty_and_whitespace(self):
        assert split_sentences('') == []
        assert split_sentences('   \n\t ') == []

    def test_whitespace_normalized(self):
        assert split_sentences('a  b.\n\nc   d.') == ['a b.', 'c d.']

    def test_runon_hard_split_at_clause_boundary(self):
        words = ['w%d' % i for i in range(20)]
        words[9] = 'w9,'                     # clause boundary inside the cap
        out = split_sentences(' '.join(words), max_words=12)
        assert out[0].endswith('w9,')        # preferred the comma over the cap
        assert len(out) == 2
        assert ' '.join(' '.join(out).split()) == ' '.join(words)

    def test_runon_hard_split_at_cap_without_clause(self):
        words = ['w%d' % i for i in range(25)]
        out = split_sentences(' '.join(words), max_words=10)
        assert all(len(s.split()) <= 10 for s in out)
        assert ' '.join(' '.join(out).split()) == ' '.join(words)

    def test_multiple_terminal_punctuation(self):
        assert split_sentences('Really?! Yes. ') == ['Really?!', 'Yes.']


class TestLongform:
    def _prompt(self, seed=5):
        rs = np.random.RandomState(seed)
        return rs.randint(0, 70, (6,)), rs.randint(0, 1024, (7, 8))

    def test_validates_eagerly(self):
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt()
        with pytest.raises(ValueError, match='carry'):
            tts.synthesize_longform('x.', pt, pc, carry='loop')
        with pytest.raises(ValueError, match='chunk_frames'):
            tts.synthesize_longform('x.', pt, pc, chunk_frames=0)
        with pytest.raises(ValueError, match='lookahead'):
            tts.synthesize_longform('x.', pt, pc, lookahead_frames=-1)

    def test_empty_text_yields_nothing(self):
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt()
        assert list(tts.synthesize_longform('  ', pt, pc)) == []

    def test_prompt_mode_single_sentence_matches_streaming(self):
        """Greedy: one-sentence long-form == synthesize_streaming bit-for-bit
        (same decode, same NAR refinements, rng unused at temperature 0)."""
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt()
        want = list(tts.synthesize_streaming('hello there.', pt, pc,
                                             chunk_frames=3,
                                             lookahead_frames=2))
        got = list(tts.synthesize_longform('hello there.', pt, pc,
                                           chunk_frames=3,
                                           lookahead_frames=2))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_prompt_mode_is_per_sentence_streaming(self):
        """Greedy multi-sentence long-form == the concatenation of each
        sentence streamed alone with the original prompt."""
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt(6)
        text = 'go on. stop now.'
        want = []
        for sent in split_sentences(text):
            want.extend(tts.synthesize_streaming(sent, pt, pc, chunk_frames=3,
                                                 lookahead_frames=2))
        got = list(tts.synthesize_longform(text, pt, pc, chunk_frames=3,
                                           lookahead_frames=2))
        np.testing.assert_array_equal(np.concatenate(got),
                                      np.concatenate(want))

    def test_chain_mode_conditions_on_previous_sentence(self):
        """carry='chain' must actually change the second sentence's decode
        (different acoustic prompt ⇒ different codes for a random-init model),
        while the FIRST sentence stays identical to prompt mode."""
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt(7)
        text = 'go on. stop now.'
        prompt_chunks = list(tts.synthesize_longform(
            text, pt, pc, carry='prompt', chunk_frames=3, lookahead_frames=0))
        chain_chunks = list(tts.synthesize_longform(
            text, pt, pc, carry='chain', chunk_frames=3, lookahead_frames=0))
        # First chunk = first sentence's first emission: chain hasn't kicked
        # in yet, so it is bit-identical.
        np.testing.assert_array_equal(prompt_chunks[0], chain_chunks[0])
        a, b = np.concatenate(prompt_chunks), np.concatenate(chain_chunks)
        assert a.shape != b.shape or not np.array_equal(a, b)

    def test_chain_cap_falls_back_to_prompt_mode(self):
        """max_chain_frames below any chained length ⇒ chain == prompt mode
        exactly (the fallback path is the original prompt)."""
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt(8)
        text = 'go on. stop now.'
        want = list(tts.synthesize_longform(text, pt, pc, carry='prompt',
                                            chunk_frames=4))
        got = list(tts.synthesize_longform(text, pt, pc, carry='chain',
                                           max_chain_frames=0, chunk_frames=4))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_output_is_finite_audio(self):
        tts = ValleTTS(tiny_cfg())
        pt, pc = self._prompt(9)
        chunks = list(tts.synthesize_longform('one two. three four. five.',
                                              pt, pc, carry='chain'))
        total = np.concatenate(chunks)
        assert total.dtype == np.float32
        assert total.size % 320 == 0
        assert np.isfinite(total).all()


class TestHubLongform:
    """Pipelined long-form through the continuous-batching hub
    (StreamHub.open_longform): sentence i+1 decodes in the shared loop while
    sentence i streams.  Parity surface: output == synthesize_longform
    (carry='prompt') — bit-exact with batched_nar=False, float32 round-off
    with the batched-NAR default."""

    def _prompt(self, seed=21):
        rs = np.random.RandomState(seed)
        return rs.randint(0, 70, (5,)), rs.randint(0, 1024, (6, 8))

    @pytest.fixture(scope='class')
    def tts(self):
        return ValleTTS(tiny_cfg())

    @staticmethod
    def _collect(gen):
        out = [np.asarray(c) for c in gen]
        return np.concatenate(out) if out else np.zeros((0,), np.float32)

    @pytest.mark.parametrize('batched', [True, False])
    def test_equals_solo_longform(self, tts, batched):
        from valle2_tpu.stream_hub import StreamHub
        pt, pc = self._prompt()
        text = 'go on. stop now. once more.'
        want = self._collect(tts.synthesize_longform(
            text, pt, pc, carry='prompt', chunk_frames=4, lookahead_frames=2))
        hub = StreamHub(tts, n_slots=3, chunk_frames=4, batched_nar=batched)
        try:
            got = self._collect(hub.open_longform(text, pt, pc,
                                                  lookahead_frames=2))
            assert got.shape == want.shape
            if batched:
                # Identical refined codes; the joint-batch codec decode
                # reassociates float32 reductions.
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
            else:
                np.testing.assert_array_equal(got, want)
            # At 3 slots / max_inflight=2 at least one later sentence decoded
            # concurrently with an earlier one still streaming.
            assert hub.longform_prefetched >= 1
            assert hub.live_sessions() == 0
        finally:
            hub.stop()

    def test_oversize_sentence_streams_solo(self, tts):
        """A sentence too big for the hub geometry falls back to solo
        streaming — output still equals synthesize_longform exactly."""
        from valle2_tpu.stream_hub import StreamHub
        pt, pc = self._prompt(22)
        # Middle sentence phonemizes well past ttm=16 - len(pt); the short
        # ones fit.
        text = ('go on. the quick brown fox jumps over the lazy sleeping '
                'yellow dog tonight. stop now.')
        want = self._collect(tts.synthesize_longform(
            text, pt, pc, carry='prompt', chunk_frames=4, lookahead_frames=2))
        hub = StreamHub(tts, n_slots=2, chunk_frames=4, batched_nar=False,
                        ttm=16, pm=16)
        try:
            got = self._collect(hub.open_longform(text, pt, pc,
                                                  lookahead_frames=2))
            np.testing.assert_array_equal(got, want)
        finally:
            hub.stop()

    def test_hub_full_mid_stream_falls_back_to_solo(self, tts):
        """Rows busy with other traffic when a later sentence's turn comes:
        it streams solo instead of blocking; output unchanged."""
        from valle2_tpu.stream_hub import HubFull, StreamHub
        pt, pc = self._prompt(23)
        text = 'go on. stop now. once more.'
        want = self._collect(tts.synthesize_longform(
            text, pt, pc, carry='prompt', chunk_frames=4, lookahead_frames=2))
        hub = StreamHub(tts, n_slots=2, chunk_frames=4, batched_nar=False)
        try:
            orig_open = hub.open
            opens = []

            def stingy_open(*a, **k):
                opens.append(a[0] if a else k.get('text'))
                if len(opens) > 1:          # only sentence 0 gets a row
                    raise HubFull('rows held by other sessions')
                return orig_open(*a, **k)

            hub.open = stingy_open
            got = self._collect(hub.open_longform(text, pt, pc,
                                                  lookahead_frames=2))
            np.testing.assert_array_equal(got, want)
            assert len(opens) > 1           # the fallback path actually ran
        finally:
            hub.stop()

    def test_first_sentence_hub_full_raises(self, tts):
        """No row for sentence 0 at call time → HubFull propagates (the
        serve-layer 429 contract)."""
        from valle2_tpu.stream_hub import HubFull, StreamHub
        pt, pc = self._prompt(24)
        hub = StreamHub(tts, n_slots=1, chunk_frames=4)
        try:
            hub.cb.join(pt, pc)             # occupy the only row
            with pytest.raises(HubFull):
                hub.open_longform('hi there. go on.', pt, pc)
        finally:
            hub.stop()

    def test_early_close_frees_all_rows(self, tts):
        """Client disconnect mid-sentence closes BOTH the streaming session
        and any prefetched ones."""
        import time
        from valle2_tpu.stream_hub import StreamHub
        pt, pc = self._prompt(25)
        hub = StreamHub(tts, n_slots=3, chunk_frames=2, batched_nar=False)
        try:
            gen = hub.open_longform('go on. stop now. once more.', pt, pc,
                                    lookahead_frames=0)
            next(gen)
            gen.close()
            deadline = time.time() + 10
            while hub.live_sessions() and time.time() < deadline:
                time.sleep(0.05)
            assert hub.live_sessions() == 0
        finally:
            hub.stop()

    def test_empty_text_yields_nothing(self, tts):
        from valle2_tpu.stream_hub import StreamHub
        pt, pc = self._prompt(26)
        hub = StreamHub(tts, n_slots=1)
        try:
            assert list(hub.open_longform('   ', pt, pc)) == []
        finally:
            hub.stop()
