"""One process of a multi-process CPU 'cluster' for tests/test_distributed.py.

Run as ``python tests/dist_worker.py <proc_id> <n_procs> <port> <outdir>``.
Each process gets 4 virtual CPU devices; ``jax.distributed.initialize`` (via
``valle2_tpu.parallel.init_distributed`` and its $VALLE2_* env resolution)
connects them into one 8-device runtime.  The worker then runs the REAL
``Trainer.fit`` on a deterministic synthetic stream over a data=8 mesh —
exercising ``device_put_global`` placement, the collective train step, and the
collective orbax checkpoint save — and dumps its final params to
``<outdir>/proc<id>.npz`` for the test to compare across processes and against
a single-process 8-device run (bit-identical expected: same seed, same stream,
same mesh, same math).

``run_fit`` is import-safe (no env mutation at import): the test process calls
it directly for the single-process reference run.
"""

import sys
from pathlib import Path


def run_fit(outdir: Path, tag: str, ckpt_name: str) -> None:
    """Train 3 steps on the synthetic stream over a data=8 mesh; dump params.

    ``ckpt_name`` names the checkpoint dir under ``outdir`` — on a
    multi-process runtime the orbax save is COLLECTIVE, so every process must
    pass the same name (one shared directory).
    """
    import jax
    import numpy as np

    from valle2_tpu.config import ConfigValle
    from valle2_tpu.data import DataLoader, SyntheticValleDataset, get_collate
    from valle2_tpu.parallel import make_mesh
    from valle2_tpu.train import Trainer, init_state

    cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                      batch_size=8, max_steps=3, log_every_n_steps=0,
                      dropout=0.0, bucket_sizes=(64,), norm='LayerNorm',
                      async_checkpoint=False, prefetch_batches=0)
    cfg.ckpt_path = Path(outdir) / ckpt_name
    cfg.log_path = Path(outdir) / f'logs_{tag}'

    mesh = make_mesh(data=8, model=1)
    state = init_state(cfg, 'ValleAR', jax.random.key(0))
    collate = get_collate('ValleAR')(cfg)
    ds = SyntheticValleDataset(cfg, size=16, min_frames=30, max_frames=60)
    loader = DataLoader(ds, cfg.batch_size, collate, shuffle=False)
    trainer = Trainer(cfg, 'ValleAR', mesh=mesh, use_tensorboard=False)
    state = trainer.fit(state, loader)

    # Params on a data-only mesh are fully replicated → every process holds
    # the complete value and np.asarray works without a gather.
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    np.savez(Path(outdir) / f'{tag}.npz',
             **{f'p{i}': leaf for i, leaf in enumerate(leaves)},
             step=np.asarray(int(state.step)))


def run_generate(outdir: Path, tag: str) -> None:
    """Batched AR decode over the multi-host data mesh (r4, VERDICT item 8):
    rows shard over 'data' across processes; generate_batch process_allgathers
    the result so EVERY host returns the full batch.  Dumps the (padded)
    outputs for cross-process and vs-single-process comparison."""
    import jax
    import numpy as np

    from valle2_tpu.config import ConfigValle
    from valle2_tpu.models.ar import ValleAR
    from valle2_tpu.parallel import make_mesh

    cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=2,
                      vocab_size=40, num_audio_tokens=50, max_audio_len=8,
                      num_beams=2, temperature=0.0, dropout=0.0,
                      bucket_sizes=(16,), decode_attn_buckets=1,
                      use_fused_decode=False, norm='LayerNorm')
    mesh = make_mesh(data=8, model=1)
    model = ValleAR(cfg, mesh=mesh)            # same seed → same params
    rs = np.random.RandomState(7)
    prompts = [(rs.randint(0, cfg.vocab_size, (5,)),
                rs.randint(0, cfg.num_audio_tokens, (4, 8)))
               for _ in range(8)]
    outs = model.generate_batch([t for t, _ in prompts],
                                [c for _, c in prompts],
                                rng=jax.random.key(11))
    padded = np.full((len(outs), cfg.max_audio_len), -1, np.int32)
    for i, o in enumerate(outs):
        padded[i, :len(o)] = np.asarray(o)
    np.savez(Path(outdir) / f'{tag}_gen.npz', out=padded)


def run_pp_step(outdir: Path, tag: str) -> None:
    """One GPipe train step on a pipe=8 mesh whose STAGES span the processes —
    the forward/backward ppermute chain crosses the process boundary (DCN on a
    pod) every stage hop.  Dumps the updated params (process_allgathered to
    full replication) for comparison."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from valle2_tpu.config import ConfigValle
    from valle2_tpu.parallel import (make_pp_mesh, make_pp_train_step,
                                     pp_shard_params)
    from valle2_tpu.train import TrainState, init_state

    cfg = ConfigValle(d_model=32, n_heads=2, dim_feedforward=64, num_layers=8,
                      vocab_size=40, num_audio_tokens=50, dropout=0.0,
                      pp_microbatches=2, norm='LayerNorm')
    mesh = make_pp_mesh(1, 8)
    state = init_state(cfg, 'ValleAR', jax.random.key(0))
    state = TrainState(pp_shard_params(mesh, state.params),
                       pp_shard_params(mesh, state.opt_state), state.step)
    rs = np.random.RandomState(3)
    b, tt, tc = 4, 6, 12
    batch = {'tokens': np.asarray(rs.randint(0, 40, (b, tt)), np.int32),
             'codes': np.asarray(rs.randint(0, 50, (b, tc)), np.int32),
             'target': np.asarray(rs.randint(0, 50, (b, tc)), np.int32),
             'tokens_lens': np.asarray([tt] * b),
             'codes_lens': np.asarray([tc] * b)}
    from valle2_tpu.parallel import device_put_global, replicated
    batch = {k: device_put_global(v, replicated(mesh))
             for k, v in batch.items()}
    step = make_pp_train_step(cfg, 'ValleAR', mesh)
    state, metrics = step(state, batch, jax.random.key(5))
    params_host = multihost_utils.process_allgather(state.params, tiled=True)
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, params_host))
    np.savez(Path(outdir) / f'{tag}_pp.npz',
             **{f'p{i}': leaf for i, leaf in enumerate(leaves)},
             loss=np.asarray(float(metrics['loss'])))


def main() -> None:
    import os
    proc_id, n_procs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                      sys.argv[3], Path(sys.argv[4]))
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    # Exercise init_distributed's env-var resolution path.
    os.environ['VALLE2_COORDINATOR'] = f'127.0.0.1:{port}'
    os.environ['VALLE2_NUM_PROCS'] = str(n_procs)
    os.environ['VALLE2_PROC_ID'] = str(proc_id)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', 'highest')
    # Share the test suite's persistent compile cache (atomic writes, so
    # concurrent workers are safe) — this box has one CPU core and the two
    # workers otherwise pay the train-step compile back to back.
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from valle2_tpu.parallel import init_distributed, is_primary
    assert init_distributed() == n_procs, 'cluster did not form'
    assert jax.device_count() == 4 * n_procs
    assert jax.local_device_count() == 4
    assert is_primary() == (proc_id == 0)

    run_fit(outdir, f'proc{proc_id}', ckpt_name='ckpt_mp')
    run_generate(outdir, f'proc{proc_id}')
    run_pp_step(outdir, f'proc{proc_id}')


if __name__ == '__main__':
    main()
