"""Observability subsystem smoke tests (SURVEY §5 analogs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu import profiling


class TestProfiling:
    def test_trace_writes_profile(self, tmp_path):
        with profiling.trace(tmp_path):
            with profiling.annotate('unit-test-region'):
                _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
        files = list(tmp_path.rglob('*'))
        assert any(f.is_file() for f in files), 'no trace artifacts written'

    def test_memory_stats_keys(self):
        stats = profiling.memory_stats()
        assert set(stats) == {'bytes_in_use', 'peak_bytes_in_use', 'bytes_limit'}

    def test_nan_checks_toggle(self):
        profiling.enable_nan_checks(True)
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
        profiling.enable_nan_checks(False)


