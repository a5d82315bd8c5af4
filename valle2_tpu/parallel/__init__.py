"""SPMD parallelism: mesh construction + declarative sharding rules."""

from .mesh import (batch_sharding, make_mesh, param_sharding, replicated,
                   shard_batch, shard_params)

__all__ = ['batch_sharding', 'make_mesh', 'param_sharding', 'replicated',
           'shard_batch', 'shard_params']
