"""CLI surface tests: training entry and synthesis/transcription entry."""

import json

import numpy as np
import pytest


class TestTrainCLI:
    def test_train_cli_runs_and_checkpoints(self, tmp_path):
        from valle2_tpu.train import main
        cfg = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                   batch_size=2, max_steps=3, log_every_n_steps=1, dropout=0.0,
                   ckpt_every_n_steps=0, bucket_sizes=[64, 128],
                   ckpt_path=str(tmp_path / 'ckpt'), log_path=str(tmp_path / 'logs'))
        cfg_path = tmp_path / 'cfg.json'
        cfg_path.write_text(json.dumps(cfg))
        main(['-c', str(cfg_path), '-m', 'ValleAR', '--synthetic'])
        # final checkpoint written by fit()
        assert list((tmp_path / 'ckpt' / 'ValleAR').glob('step_*'))

    def test_train_cli_builds_mesh_from_config(self, tmp_path):
        """mesh_data/mesh_model in the JSON must build the device mesh — `-c
        cfg.json` alone scales across chips (8 virtual CPU devices here)."""
        from valle2_tpu.train import main
        cfg = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                   batch_size=8, max_steps=2, log_every_n_steps=1, dropout=0.0,
                   ckpt_every_n_steps=0, bucket_sizes=[64, 128],
                   mesh_data=4, mesh_model=2,
                   ckpt_path=str(tmp_path / 'ckpt'), log_path=str(tmp_path / 'logs'))
        cfg_path = tmp_path / 'cfg.json'
        cfg_path.write_text(json.dumps(cfg))
        main(['-c', str(cfg_path), '-m', 'ValleAR', '--synthetic'])
        assert list((tmp_path / 'ckpt' / 'ValleAR').glob('step_*'))


class TestTTSCLI:
    @pytest.fixture()
    def env(self, tmp_path):
        from valle2_tpu.utils import save_wav
        wav = (0.4 * np.sin(np.linspace(0, 2000, 24000))).astype(np.float32)
        save_wav(tmp_path / 'prompt.wav', wav, 24000)
        cfg = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                   max_audio_len=10, num_beams=2, dropout=0.0, temperature=0.0)
        (tmp_path / 'cfg.json').write_text(json.dumps(cfg))
        return tmp_path

    def test_tts_writes_wav(self, env):
        import wave
        from valle2_tpu.tts import main
        main(['-c', str(env / 'cfg.json'), '--text', 'hi there.',
              '--prompt-wav', str(env / 'prompt.wav'), '--prompt-text', 'a tone.',
              '-o', str(env / 'out.wav')])
        with wave.open(str(env / 'out.wav')) as f:
            assert f.getframerate() == 24000
            assert f.getnframes() % 320 == 0

    def test_asr_prints_phonemes(self, env, capsys):
        from valle2_tpu.tts import main
        main(['-c', str(env / 'cfg.json'), '--transcribe', str(env / 'prompt.wav')])
        out = capsys.readouterr().out.strip()
        assert isinstance(out, str)
