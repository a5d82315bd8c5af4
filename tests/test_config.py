"""Config serialization surface: JSON round trip, unknown-key tolerance,
validation errors, derived properties (reference config.py:66-99)."""

import dataclasses
import json

import pytest

from valle2_tpu.config import ConfigValle


class TestConfigSerialization:
    def test_json_roundtrip(self, tmp_path):
        cfg = ConfigValle(d_model=64, n_heads=4, max_audio_len=32,
                          weight_dtype='int8', bucket_sizes=(16, 32))
        p = tmp_path / 'cfg.json'
        p.write_text(json.dumps(cfg.to_dict()))
        back = ConfigValle.from_json(p)
        assert dataclasses.asdict(back) == dataclasses.asdict(cfg)

    def test_from_dict_tolerates_unknown_keys(self):
        cfg = ConfigValle.from_dict({'d_model': 48, 'some_future_knob': 7})
        assert cfg.d_model == 48

    def test_reference_shaped_config_loads(self, tmp_path):
        """A config JSON using only the reference's fields loads unchanged
        (the public parity surface — reference config.py:91-99)."""
        ref = {'dataset': 'keithito/lj_speech', 'd_model': 256, 'n_heads': 4,
               'num_layers': 8, 'dim_feedforward': 1024, 'dropout': 0.1,
               'norm': 'AdaptiveLayerNorm', 'lr': 0.001, 'betas': [0.9, 0.95],
               'max_audio_len': 1024, 'num_beams': 4, 'top_k': 50,
               'temperature': 1.0, 'max_steps': 100000, 'seed': 44}
        p = tmp_path / 'ref.json'
        p.write_text(json.dumps(ref))
        cfg = ConfigValle.from_json(p)
        assert cfg.d_model == 256 and cfg.norm == 'AdaptiveLayerNorm'
        assert cfg.betas == (0.9, 0.95)

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            ConfigValle(norm='BatchNorm')
        with pytest.raises(ValueError):
            ConfigValle(activation='swish')
        with pytest.raises(ValueError):
            ConfigValle(dataset=None)

    def test_derived_tokens(self):
        """quantization_factor / bos / eos derivations (reference
        config.py:79-89)."""
        cfg = ConfigValle()
        assert cfg.quantization_factor == cfg.sampling_rate // cfg.polling_factor
        assert cfg.eos_token == cfg.num_audio_tokens
        assert cfg.bos_token == cfg.num_audio_tokens + 1
