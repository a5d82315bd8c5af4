"""The one-command pretrained-artifact gate (tools/verify_pretrained).

Exercised with a SYNTHESIZED torch checkpoint file (saved from the weight-normed
torch mirror with real state-dict naming) — the same file format a real
``encodec_24khz.th`` arrives in — so drop-in day runs a tool that has itself
been tested end-to-end.  Auto-skip behavior: real-artifact paths simply do not
exist in this image; CI never fails on their absence."""

import numpy as np
import pytest
import torch

from valle2_tpu.tools.verify_pretrained import main, verify_codec, verify_valle


@pytest.fixture(scope='module')
def codec_ckpt(tmp_path_factory):
    from torch_encodec_mirror import EncodecMirror
    path = tmp_path_factory.mktemp('artifacts') / 'encodec_24khz.th'
    torch.save({'best_state': EncodecMirror(seed=7).state_dict()}, path)
    return path


class TestCodecGate:
    def test_good_checkpoint_passes_every_stage(self, codec_ckpt):
        results = verify_codec(str(codec_ckpt), verbose=False)
        assert results                      # at least the mirror reference ran
        assert all(results.values()), results
        assert any('encode-token-parity' in k for k in results)

    def test_divergence_is_detected_not_vacuous(self, codec_ckpt, monkeypatch):
        """The sweep must actually FAIL when converted weights and the torch
        reference disagree (here: reference loaded with different weights) —
        proof the gate isn't an always-green no-op."""
        from torch_encodec_mirror import EncodecMirror

        from valle2_tpu.tools import verify_pretrained as vp
        other = EncodecMirror(seed=8).state_dict()
        monkeypatch.setattr(
            vp, '_references',
            lambda sd: [('wrong-weights', vp._MirrorReference(other))])
        results = verify_codec(str(codec_ckpt), verbose=False)
        assert not all(results.values())
        assert main(['--codec', str(codec_ckpt)]) == 1   # exit code propagates

    def test_cli_exit_codes(self, codec_ckpt, capsys):
        assert main(['--codec', str(codec_ckpt)]) == 0
        out = capsys.readouterr().out
        assert 'PASS' in out and 'stages passed' in out


class TestValleGate:
    def test_ar_checkpoint_roundtrip_and_greedy_parity(self, tmp_path):
        """Convert a reference-named AR state dict and gate it: the greedy
        decode must match the torch equation mirror token-for-token."""
        from torch_reference_modules import ReferenceShapedValleAR
        from valle2_tpu.config import ConfigValle
        cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64,
                          num_layers=2, norm='LayerNorm', dropout=0.0)
        sd = ReferenceShapedValleAR(cfg).state_dict()
        path = tmp_path / 'ar.ckpt'
        torch.save({'state_dict': {f'model.{k}': v for k, v in sd.items()}}, path)
        results = verify_valle(str(path), 'ValleAR', cfg)
        assert results.get('ar-decode-finite') is True
        assert results.get('ar-greedy-parity[torch-mirror]') is True


class TestFrontendGate:
    def test_skips_cleanly_without_g2p(self):
        """In this image g2p_en is absent: the gate must report unavailable,
        not crash — and the CLI must not fail on it."""
        from valle2_tpu.tools.verify_pretrained import main, verify_frontend
        out = verify_frontend(verbose=False)
        if not out['available']:
            assert out == {'available': False}
            assert main(['--frontend']) == 0      # nothing to fail on
        else:                                      # network-day behavior
            assert 0.0 <= out['phoneme_agreement'] <= 1.0
