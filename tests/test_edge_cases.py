"""Edge cases: minimal lengths, empty prompts, degenerate shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from valle2_tpu.config import ConfigValle
from valle2_tpu.data import SyntheticValleDataset, get_collate
from valle2_tpu.models import ar as ar_mod
from valle2_tpu.models import nar as nar_mod
from valle2_tpu.models.ar import ValleAR
from valle2_tpu.models.nar import ValleNAR


def cfg(**kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                num_audio_tokens=64, vocab_size=16, max_audio_len=6, num_beams=2,
                dropout=0.0, temperature=0.0, norm='LayerNorm',
                bucket_sizes=(8, 16, 32))
    base.update(kw)
    return ConfigValle(**base)


class TestDecodeEdges:
    def test_single_token_prompt(self):
        m = ValleAR(cfg())
        out = m.generate(jnp.asarray([3]), np.zeros((1, 8), np.int32))
        assert np.asarray(out).ndim == 1

    def test_empty_prompt_codes(self):
        """ASR-style: no acoustic prompt, codes0 = [BOS] only."""
        m = ValleAR(cfg())
        out = m.generate(jnp.asarray([1, 2, 3]), np.zeros((0, 8), np.int32))
        assert len(np.asarray(out)) <= 6

    def test_immediate_eos_everywhere(self):
        """Force EOS as the argmax by biasing the projection — empty output."""
        m = ValleAR(cfg())
        eos = m.eos_token
        proj = np.array(m.params['proj']['w'])   # writable copy
        proj[:, eos] = 100.0           # EOS wins every step
        m.params['proj']['w'] = jnp.asarray(proj)
        out = np.asarray(m.generate(jnp.asarray([1, 2]), np.zeros((2, 8), np.int32)))
        assert len(out) == 0

    def test_max_pos_guard_ar(self):
        """A decode whose position budget runs past the sinusoidal table must
        raise at trace time — JAX gathers clamp out-of-range indices, so
        without the guard positions past MAX_POS silently repeat (r3 weak #6)."""
        import pytest
        m = ValleAR(cfg(max_audio_len=4990, bucket_sizes=(32,)))
        with pytest.raises(ValueError, match='position budget'):
            # prompt codes bucket to 32; 32 + 4990 > 5000.
            m.generate(jnp.asarray([1, 2]), np.zeros((16, 8), np.int32))

    def test_max_pos_guard_nar(self):
        import pytest
        from valle2_tpu.models.ar import check_max_pos
        with pytest.raises(ValueError, match='position budget'):
            check_max_pos(32, 5008, 'NAR refine')
        check_max_pos(5000, 5000, 'boundary ok')   # inclusive bound

    def test_batch_with_very_different_lengths(self):
        m = ValleAR(cfg())
        rs = np.random.RandomState(0)
        items = [(rs.randint(0, 16, (1,)), rs.randint(0, 64, (1, 8))),
                 (rs.randint(0, 16, (12,)), rs.randint(0, 64, (10, 8)))]
        outs = m.generate_batch([t for t, _ in items], [c for _, c in items])
        assert len(outs) == 2
        for (t, c), got in zip(items, outs):
            solo = m.generate(jnp.asarray(t), jnp.asarray(c), bucket=True)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(solo))


class TestNAREdges:
    def test_zero_prefix_training(self):
        """codes_len < 3 → prefix_len 0: suffix covers everything."""
        c = cfg(norm='AdaptiveLayerNorm')
        m = ValleNAR(c)
        assert nar_mod.prefix_length(c, 2) == 0
        batch = {'tokens': jnp.zeros((1, 1), jnp.int32),
                 'tokens_lens': jnp.asarray([1]),
                 'codes': jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 2, 8))),
                 'codes_lens': jnp.asarray([2])}
        loss, _ = m.training_step(batch, rng=jax.random.key(0))
        assert np.isfinite(float(loss))

    def test_single_frame_refinement(self):
        c = cfg(norm='AdaptiveLayerNorm')
        m = ValleNAR(c)
        out = m.generate(jnp.asarray([1]), np.zeros((1, 8), np.int32),
                         jnp.asarray([2]), jnp.asarray([5]))
        assert np.asarray(out).shape == (1, 8)


class TestCollateEdges:
    def test_single_item_batch(self):
        c = cfg()
        collate = get_collate('ValleAR')(c)
        ds = SyntheticValleDataset(c, size=1, min_frames=5, max_frames=8)
        batch = collate([ds[0]])
        assert batch['codes'].shape[0] == 1
        assert batch['codes'].shape[1] in c.bucket_sizes


class TestPackageExports:
    def test_lazy_toplevel_exports_resolve(self):
        """`from valle2_tpu import ValleTTS` etc. resolve lazily (PEP 562)
        without eager heavy imports at package import time."""
        import valle2_tpu
        for name in valle2_tpu.__all__:
            if name == '__version__':
                continue
            obj = getattr(valle2_tpu, name)
            assert obj is not None, name
        assert set(valle2_tpu._LAZY) <= set(dir(valle2_tpu))
        import pytest
        with pytest.raises(AttributeError, match='not_a_thing'):
            valle2_tpu.not_a_thing  # noqa: B018
