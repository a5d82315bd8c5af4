"""Checkpoint resilience: async saves and SIGTERM-preemption handling.

TPU pods deliver preemption as SIGTERM with a short grace window; the trainer
must checkpoint and exit cleanly so --resume continues from the preemption
point (train.py::_PreemptGuard).  Async checkpointing (orbax
AsyncCheckpointer) must overlap IO with the step loop without ever handing
back a half-written or stale checkpoint.
"""

import signal
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle2_tpu.config import ConfigValle
from valle2_tpu.data import DataLoader, SyntheticValleDataset, get_collate
from valle2_tpu.train import TrainState, Trainer, _PreemptGuard, init_state


def tiny_cfg(tmp_path, **kw):
    base = dict(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                batch_size=2, max_steps=4, log_every_n_steps=0, dropout=0.0,
                bucket_sizes=(64,), ckpt_every_n_steps=0, norm='LayerNorm',
                prefetch_batches=0)
    base.update(kw)
    cfg = ConfigValle(**base)
    cfg.ckpt_path = Path(tmp_path) / 'ckpt'
    cfg.log_path = Path(tmp_path) / 'logs'
    return cfg


def loader(cfg, size=8):
    collate = get_collate('ValleAR')(cfg)
    ds = SyntheticValleDataset(cfg, size=size, min_frames=30, max_frames=60)
    return DataLoader(ds, cfg.batch_size, collate, shuffle=False)


def params_equal(a, b):
    eq = jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y)), a, b)
    return all(jax.tree.leaves(eq))


class TestAsyncCheckpoint:
    def test_async_save_then_restore(self, tmp_path):
        """Default (wait=True): save→restore is immediately safe under async."""
        cfg = tiny_cfg(tmp_path, async_checkpoint=True)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(state.params, state.opt_state, jnp.int32(5))
        trainer.save_checkpoint(state)
        latest = trainer.latest_checkpoint()
        assert latest is not None and latest.name == 'step_5'
        fresh = init_state(cfg, 'ValleAR', jax.random.key(9))
        restored = trainer.restore_checkpoint(fresh, latest)
        assert int(restored.step) == 5
        assert params_equal(state.params, restored.params)
        trainer.finish_checkpoints()

    def test_nowait_save_lands_after_finish(self, tmp_path):
        """wait=False (the step loop's periodic saves) + finish_checkpoints()
        == a complete, restorable checkpoint."""
        cfg = tiny_cfg(tmp_path, async_checkpoint=True)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        state = TrainState(state.params, state.opt_state, jnp.int32(3))
        trainer.save_checkpoint(state, wait=False)
        trainer.finish_checkpoints()
        latest = trainer.latest_checkpoint()
        assert latest is not None and latest.name == 'step_3'
        restored = trainer.restore_checkpoint(
            init_state(cfg, 'ValleAR', jax.random.key(9)), latest)
        assert params_equal(state.params, restored.params)

    def test_fit_with_periodic_async_saves(self, tmp_path):
        """ckpt_every under async: every periodic save is complete on return."""
        cfg = tiny_cfg(tmp_path, async_checkpoint=True, max_steps=4,
                       ckpt_every_n_steps=2)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        final = trainer.fit(init_state(cfg, 'ValleAR', jax.random.key(0)),
                            loader(cfg))
        root = Path(cfg.ckpt_path) / 'ValleAR'
        steps = sorted(p.name for p in root.glob('step_*'))
        assert steps == ['step_2', 'step_4'], steps
        restored = trainer.restore_checkpoint(
            init_state(cfg, 'ValleAR', jax.random.key(9)), root / 'step_4')
        assert params_equal(final.params, restored.params)

    def test_sync_mode_still_works(self, tmp_path):
        cfg = tiny_cfg(tmp_path, async_checkpoint=False)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))
        trainer.save_checkpoint(state)
        assert trainer.latest_checkpoint() is not None
        assert trainer._async_ckptr is None


class TestPreemption:
    def test_guard_restores_previous_handler(self):
        prev = signal.getsignal(signal.SIGTERM)
        g = _PreemptGuard(enabled=True)
        g.install()
        assert signal.getsignal(signal.SIGTERM) == g._on_signal
        g.uninstall()
        assert signal.getsignal(signal.SIGTERM) == prev

    def test_disabled_guard_is_noop(self):
        prev = signal.getsignal(signal.SIGTERM)
        g = _PreemptGuard(enabled=False)
        g.install()
        assert signal.getsignal(signal.SIGTERM) == prev
        g.uninstall()

    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        """SIGTERM mid-fit: the loop saves the in-flight state and returns
        early; --resume-style restore continues from the preemption point."""
        cfg = tiny_cfg(tmp_path, max_steps=10_000, preempt_checkpoint=True)
        trainer = Trainer(cfg, 'ValleAR', use_tensorboard=False)
        state = init_state(cfg, 'ValleAR', jax.random.key(0))

        # raise_signal from a timer thread delivers to the main thread (where
        # the handler runs), like a real preemption notice mid-training.
        prev_handler = signal.getsignal(signal.SIGTERM)
        t = threading.Timer(1.0, signal.raise_signal, [signal.SIGTERM])
        t.start()
        t0 = time.time()
        final = trainer.fit(state, loader(cfg))
        t.join()
        assert time.time() - t0 < 120, 'fit did not exit on SIGTERM'
        saved_step = int(final.step)
        assert saved_step < cfg.max_steps

        latest = trainer.latest_checkpoint()
        assert latest is not None, 'preemption did not write a checkpoint'
        restored = trainer.restore_checkpoint(
            init_state(cfg, 'ValleAR', jax.random.key(9)), latest)
        assert int(restored.step) == saved_step
        assert params_equal(final.params, restored.params)
        # The handler was uninstalled on the way out.
        assert signal.getsignal(signal.SIGTERM) == prev_handler
        # A short follow-on fit resumes from the restored state and completes.
        cfg2 = tiny_cfg(tmp_path, max_steps=saved_step + 1)
        trainer2 = Trainer(cfg2, 'ValleAR', use_tensorboard=False)
        done = trainer2.fit(init_state(cfg2, 'ValleAR', jax.random.key(1)),
                            loader(cfg2), resume=True)
        assert int(done.step) >= saved_step
