"""Multi-process (multi-host) runtime initialization.

On a multi-host TPU pod each host runs one copy of the training script and
owns its locally-attached chips; ``jax.distributed.initialize`` connects them
into one runtime so ``jax.devices()`` is global, GSPMD shardings span hosts
(collectives ride ICI within a slice and DCN across), and orbax coordinates
collective checkpoint IO.  The reference has no multi-host story at all
(SURVEY §2.3: Lightning single-accelerator).

Design: everything downstream is topology-agnostic.  The mesh is built from
global devices (``parallel.make_mesh``), placement goes through
``device_put_global`` (each host contributes its addressable slices), and the
data path feeds every host the same deterministic batch stream — so a
multi-host run computes bit-the-same update as a single-host run with the
same mesh (tested with a 2-process CPU cluster, tests/test_distributed.py).

Resolution: explicit args → ``$VALLE2_COORDINATOR`` / ``$VALLE2_NUM_PROCS`` /
``$VALLE2_PROC_ID`` → TPU-pod auto-detection (``initialize()`` with no args).
"""

from __future__ import annotations

import os

import jax

from ..utils import log_info

__all__ = ['init_distributed', 'is_primary']


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Connect this process into a multi-process JAX runtime.

    Returns the number of processes after initialization.  Safe to call when
    already initialized (no-op) or in a plain single-process run with no
    coordinator configured (no-op, returns 1).

    On TPU pods, call with no arguments: the runtime auto-detects the
    coordinator and process topology from the pod metadata.  For explicit
    clusters (or CPU-based tests) pass/export all three values.
    """
    # NB: probe via jax.distributed.is_initialized(), NOT jax.process_count() —
    # the latter initializes the XLA backend, after which initialize() raises.
    if jax.distributed.is_initialized():
        return jax.process_count()
    coordinator = coordinator or os.environ.get('VALLE2_COORDINATOR')
    if num_processes is None and os.environ.get('VALLE2_NUM_PROCS'):
        num_processes = int(os.environ['VALLE2_NUM_PROCS'])
    if process_id is None and os.environ.get('VALLE2_PROC_ID'):
        process_id = int(os.environ['VALLE2_PROC_ID'])
    if coordinator is None and num_processes is None:
        return 1                       # single-process run, nothing to do
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    log_info('Distributed runtime: process %d/%d, %d local + %d global devices',
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should own singleton side effects (metrics
    writers, progress logs).  Collective work (train steps, orbax saves) must
    still run on EVERY process."""
    return jax.process_index() == 0
