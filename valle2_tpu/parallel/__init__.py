"""SPMD parallelism: mesh construction + declarative sharding rules."""

from .mesh import (batch_sharding, data_shard_map, make_mesh, param_sharding,
                   replicated, shard_batch, shard_params)

__all__ = ['batch_sharding', 'data_shard_map', 'make_mesh', 'param_sharding',
           'replicated', 'shard_batch', 'shard_params']
