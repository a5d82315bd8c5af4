"""SPMD parallelism: mesh construction + declarative sharding rules."""

from .context import make_cp_mesh, make_cp_train_step
from .distributed import init_distributed, is_primary
from .mesh import (batch_sharding, data_shard_map, device_put_global,
                   make_mesh, make_model_mesh, param_sharding, replicated,
                   sequence_parallel_spec, shard_batch, shard_params,
                   tp_decode_specs, tp_divisible,
                   tp_permute_qkv, tp_shard_map)
from .pipeline import (make_pp_eval_step, make_pp_mesh, make_pp_train_step,
                       pipeline_transformer, pp_param_specs, pp_shard_params)
from .ring import ring_attention

__all__ = ['batch_sharding', 'data_shard_map', 'device_put_global',
           'init_distributed', 'is_primary', 'make_cp_mesh',
           'make_cp_train_step', 'make_mesh', 'make_model_mesh',
           'make_pp_eval_step', 'make_pp_mesh', 'make_pp_train_step',
           'param_sharding', 'pipeline_transformer', 'pp_param_specs',
           'pp_shard_params', 'replicated', 'ring_attention',
           'sequence_parallel_spec', 'shard_batch', 'shard_params',
           'tp_decode_specs', 'tp_divisible', 'tp_permute_qkv',
           'tp_shard_map']
