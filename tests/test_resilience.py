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


class TestDataStreamResume:
    def test_set_epoch_matches_fresh_iteration(self):
        """set_epoch(n) reproduces the order a fresh loader reaches after
        iterating n epochs (shuffle is a pure function of seed + epoch)."""
        ds = list(range(20))
        ident = lambda items: items                                  # noqa: E731
        a = DataLoader(ds, 4, ident, shuffle=True, seed=7)
        epochs_a = [[batch for batch in a] for _ in range(3)]
        b = DataLoader(ds, 4, ident, shuffle=True, seed=7)
        b.set_epoch(2)
        assert list(b) == epochs_a[2]
        # and iteration advanced it to epoch 3's order, not back to 0
        c = DataLoader(ds, 4, ident, shuffle=True, seed=7)
        c.set_epoch(3)
        assert list(b) == list(c)

    def test_interrupted_run_bit_identical_to_straight_through(self, tmp_path):
        """Stop at step 3, resume in a fresh trainer/loader, finish at step 6:
        final params match an uninterrupted 6-step run exactly.  This only
        holds if the resumed loader replays the same shuffled batch stream
        (set_epoch + in-epoch fast-forward) — without data-stream resume the
        shuffle restarts at epoch 0 and the runs diverge."""
        def shuffled_loader(cfg):
            collate = get_collate('ValleAR')(cfg)
            ds = SyntheticValleDataset(cfg, size=8, min_frames=30, max_frames=60)
            return DataLoader(ds, cfg.batch_size, collate, shuffle=True,
                              seed=cfg.seed)

        # A: straight through to 6 (6 steps over 4-batch epochs => crosses an
        # epoch boundary; the interruption at 3 lands mid-epoch).
        cfg_a = tiny_cfg(tmp_path / 'a', max_steps=6)
        tr_a = Trainer(cfg_a, 'ValleAR', use_tensorboard=False)
        final_a = tr_a.fit(init_state(cfg_a, 'ValleAR', jax.random.key(0)),
                           shuffled_loader(cfg_a))

        # B: stop at 3, then a FRESH trainer + FRESH loader (new process
        # equivalent: loader epoch state gone) resumes to 6.
        cfg_b3 = tiny_cfg(tmp_path / 'b', max_steps=3)
        tr_b3 = Trainer(cfg_b3, 'ValleAR', use_tensorboard=False)
        tr_b3.fit(init_state(cfg_b3, 'ValleAR', jax.random.key(0)),
                  shuffled_loader(cfg_b3))
        cfg_b6 = tiny_cfg(tmp_path / 'b', max_steps=6)
        tr_b6 = Trainer(cfg_b6, 'ValleAR', use_tensorboard=False)
        final_b = tr_b6.fit(init_state(cfg_b6, 'ValleAR', jax.random.key(0)),
                            shuffled_loader(cfg_b6), resume=True)

        assert int(final_a.step) == int(final_b.step)
        diffs = jax.tree.map(
            lambda x, y: float(np.max(np.abs(np.asarray(x, np.float64)
                                             - np.asarray(y, np.float64)))),
            final_a.params, final_b.params)
        assert max(jax.tree.leaves(diffs)) == 0.0, diffs


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
