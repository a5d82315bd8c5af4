"""Device mesh + sharding rules (SPMD over ICI).

The reference has no parallelism at all (SURVEY §2.3: Lightning single-accelerator,
no DDP/NCCL configured).  The TPU-native story is declarative: one
``Mesh(('data', 'model'))``, ``NamedSharding`` annotations on params/batch, and XLA
inserts the collectives (gradient ``psum`` over 'data', activation collectives for the
tensor-parallel 'model' axis) over ICI — no communication code here at all.

Sharding rules (GSPMD annotations; correctness never depends on them):
- batch leaves: first axis over 'data'.
- attention qkv (L, d, 3d) and FFN lin1 (L, d, ffn): output features over 'model'
  (column parallel); attention out (L, d, d) and FFN lin2 (L, ffn, d): input features
  over 'model' (row parallel) — the Megatron pairing, one psum per block.
- output projections: vocab over 'model'.
- embeddings / norms / biases: replicated (tiny at this scale).

At the reference's default scale (d=256) 'model' stays size 1 and this degrades to
pure data parallelism; the rules exist so larger configs shard without code changes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), \
        f'mesh {data}x{model} needs {data * model} devices, have {len(devices)}'
    dev = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev, ('data', 'model'))


def make_model_mesh(model: int, devices=None) -> Mesh:
    """A 1-axis ('model',) mesh for pure tensor-parallel serving.

    Why a separate shape: the TP fused-decode kernel's in-kernel ring RDMA can
    only be INTERPRET-validated (CPU tests, dryrun) under a shard_map whose
    axis env has a single named axis — jax's dma_start discharge rule rejects
    multi-axis envs (jax/_src/pallas/mosaic/primitives.py).  On real TPUs the
    Mosaic lowering takes 2-axis ('data', 'model') meshes too; the helpers
    here treat a missing 'data' axis as data=1."""
    devices = devices if devices is not None else jax.devices()
    assert model <= len(devices), \
        f'model mesh size {model} needs {model} devices, have {len(devices)}'
    return Mesh(np.asarray(devices[:model]), ('model',))


def sequence_parallel_spec(config, mesh: Mesh | None) -> NamedSharding | None:
    """Residual-stream sharding for Megatron sequence parallelism, or None.

    When ``config.sequence_parallel`` and the mesh has a model axis > 1,
    returns a NamedSharding pinning (b, s, d) activations to
    P('data', 'model', None) — batch over 'data', SEQUENCE over 'model'.
    ops.transformer.encoder_layer applies it at every residual add, which is
    hint-only for GSPMD: the math is unchanged, but the norm/dropout/residual
    regions now compute on 1/mp of the sequence per chip and the two
    row-parallel all-reduces per block lower to reduce-scatter + all-gather
    pairs (same bytes moved as one all-reduce; the memory win is the point —
    Korthikanti et al. 2022, 'Reducing Activation Recomputation').  Training/
    eval only; decode steps have s == 1 and never ask for it."""
    if mesh is None or not getattr(config, 'sequence_parallel', False):
        return None
    if mesh.shape.get('model', 1) <= 1:
        return None
    data = 'data' if mesh.shape.get('data', 1) > 1 else None
    return NamedSharding(mesh, P(data, 'model', None))


def batch_sharding(mesh: Mesh, batch: Any) -> Any:
    """Shard every batch leaf's leading axis over 'data'."""
    def spec(x):
        return NamedSharding(mesh, P('data', *([None] * (np.ndim(x) - 1))))
    return jax.tree.map(spec, batch)


def _param_spec(path: tuple, leaf, model_size: int) -> P:
    """Partition spec from the param path (keys joined) + rank.

    A dim is only sharded if divisible by the 'model' axis size (e.g. the
    num_audio_tokens+1 = 1025-wide output head replicates on an even axis).
    """
    keys = [getattr(k, 'key', getattr(k, 'idx', None)) for k in path]
    names = [str(k) for k in keys if k is not None]
    joined = '/'.join(names)
    shape = np.shape(leaf)
    ndim = len(shape)

    def dim_spec(axis_from_end: int) -> P:
        idx = ndim - axis_from_end
        if idx < 0 or shape[idx] % model_size != 0:
            return P(*([None] * ndim))
        spec = [None] * ndim
        spec[idx] = 'model'
        return P(*spec)

    # Dense ('w') and int8-quantized ('q' + per-output-channel 'scale',
    # quantize.py) leaves shard identically: q mirrors w's layout and the
    # column-parallel scale follows its sharded output features.  Row-parallel
    # scales replicate (they apply per FULL output channel, after the psum —
    # scale * psum(partial) == psum(scale * partial), so placement is free).
    # int4 ('q4' + group-wise 'scale4') leaves follow the same pairing; the
    # row-parallel q4 shards its PACKED input rows (in/2 — still the input
    # axis) and scale4 replicates like every row-parallel scale.
    if joined.endswith(('qkv/w', 'lin1/w', 'lin1/b',
                        'qkv/q', 'lin1/q', 'qkv/scale', 'lin1/scale',
                        'qkv/q4', 'lin1/q4', 'qkv/scale4', 'lin1/scale4')):
        return dim_spec(1)                   # column parallel (output features)
    if joined.endswith(('out/w', 'lin2/w', 'out/q', 'lin2/q',
                        'out/q4', 'lin2/q4')):
        return dim_spec(2)                   # row parallel (input features)
    if 'proj_layers' in joined or joined == 'proj/w':
        return dim_spec(1)                   # vocab-sharded output head
    return P(*([None] * ndim))               # replicate


def _zero1_extend(spec: P, shape, data_size: int) -> P:
    """Additionally shard the first free (un-sharded) axis divisible by the
    'data' axis size — the ZeRO-1 placement for optimizer-state leaves.

    AdamW's update is elementwise, so ANY axis works; the first divisible one
    keeps the rule deterministic.  Leaves with no divisible free axis (norm
    scales, biases, scalars) stay as-is — they are the tiny tail."""
    if data_size <= 1:
        return spec
    spec_l = list(spec) + [None] * (len(shape) - len(spec))
    for i, dim in enumerate(shape):
        if spec_l[i] is None and dim >= data_size and dim % data_size == 0:
            spec_l[i] = 'data'
            return P(*spec_l)
    return spec


def param_sharding(mesh: Mesh, params: Params, zero1: bool = False) -> Params:
    """NamedSharding pytree for a model's params under the Megatron-style rules.

    ``zero1=True`` (optimizer-state trees only): every leaf is ADDITIONALLY
    sharded over 'data' on its first free divisible axis — ZeRO stage 1.  The
    adam moments (2x params in f32) then cost 1/data_size per device; XLA
    reshards the psum'd grads down to the shard (a slice) and all-gathers the
    updates back to the replicated params, both over ICI.  Never apply to the
    params themselves (the forward pass wants them replicated over 'data')."""
    model_size = mesh.shape.get('model', 1)
    data_size = mesh.shape.get('data', 1) if zero1 else 1

    def spec_for(path, leaf):
        spec = _param_spec(path, leaf, model_size)
        if zero1:
            spec = _zero1_extend(spec, np.shape(leaf), data_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_put_global(value, sharding: NamedSharding):
    """``device_put`` that also works on multi-process (multi-host) meshes.

    Single-process: plain ``jax.device_put``.  Multi-process: every host holds
    the FULL host value (the data path feeds all hosts the same deterministic
    batch stream; params init identically from the same seed), and each host
    device_puts only the slices its addressable devices own, assembled into
    one global ``jax.Array`` — ``device_put`` alone cannot place onto
    non-addressable devices.
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    shape = np.shape(value)
    idx_map = sharding.addressable_devices_indices_map(shape)
    shards = [jax.device_put(np.asarray(value)[idx], d)
              for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(shape, sharding, shards)


def shard_params(mesh: Mesh, params: Params, zero1: bool = False) -> Params:
    """Place params (or an optimizer-state tree — see ``zero1``) according to
    the sharding rules."""
    return jax.tree.map(device_put_global, params,
                        param_sharding(mesh, params, zero1=zero1))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    return jax.tree.map(device_put_global, batch, batch_sharding(mesh, batch))


def tp_permute_qkv(tparams: Params, mp: int) -> Params:
    """Reorder the fused-QKV output columns (and their int8 twins) so that a
    contiguous 1/mp slice holds rank r's ``(q_r | k_r | v_r)`` block.

    The fused qkv weight is (L, d, 3d) with columns [q | k | v]; a plain
    contiguous split over 'model' (what shard_map's P(None, None, 'model')
    produces) would cut ACROSS the three thirds.  Regrouping columns as
    [q_0 k_0 v_0 | q_1 k_1 v_1 | ...] (rank-major) makes the contiguous slice
    exactly the local fused qkv, whose thirds the kernels already slice.
    Rank r's q/k/v sub-blocks are heads [r·h/mp, (r+1)·h/mp) — head-aligned
    because d/mp is a multiple of head_dim when n_heads % mp == 0 (enforced
    by the caller).  Returns a rebuilt tree; non-qkv leaves are shared."""
    def perm_w(w):                        # (L, d, 3d) → columns regrouped
        L, d_in, three_d = w.shape
        d = three_d // 3
        w4 = w.reshape(L, d_in, 3, mp, d // mp)
        return w4.transpose(0, 1, 3, 2, 4).reshape(L, d_in, three_d)

    def perm_vec(v):                      # (L, 3d) per-output-channel scale
        L, three_d = v.shape
        d = three_d // 3
        return v.reshape(L, 3, mp, d // mp).transpose(0, 2, 1, 3) \
                .reshape(L, three_d)

    out = jax.tree.map(lambda x: x, tparams)      # fresh containers, same leaves
    qkv = out['attn']['qkv']
    if 'w' in qkv:
        qkv['w'] = perm_w(qkv['w'])
    if 'q' in qkv:
        qkv['q'] = perm_w(qkv['q'])
        qkv['scale'] = perm_vec(qkv['scale'])
    if 'q4' in qkv:
        # int4 packs input ROWS two-per-byte; the output columns being
        # regrouped here are untouched by the packing, so perm_w applies to
        # the packed tensor — and to the (L, groups, 3d) group scales, whose
        # last axis follows the same column order.
        qkv['q4'] = perm_w(qkv['q4'])
        qkv['scale4'] = perm_w(qkv['scale4'])
    return out


def tp_decode_specs(params: Params) -> Params:
    """``jax.shard_map`` in_specs pytree for the AR decode params under MANUAL
    tensor parallelism: transformer attn/ffn weights split by the Megatron
    pairing (qkv/lin1 column-, out/lin2 row-parallel), EVERYTHING else —
    embeddings, norms, biases of row-parallel layers, the LM head — replicated.

    Differs from the GSPMD rules (``_param_sharding``) on the LM head: inside
    the TP shard_map every computation outside the transformer must be
    bit-identical across model ranks (they sample in lockstep with a shared
    rng), so the head is replicated rather than vocab-sharded.  Assumes
    ``tp_permute_qkv`` has regrouped the fused qkv columns."""
    def spec_for(path, leaf):
        keys = [getattr(k, 'key', getattr(k, 'idx', None)) for k in path]
        joined = '/'.join(str(k) for k in keys if k is not None)
        ndim = np.ndim(leaf)
        if joined.endswith(('qkv/w', 'qkv/q', 'lin1/w', 'lin1/q',
                            'qkv/q4', 'lin1/q4')):
            return P(*([None] * (ndim - 1)), 'model')      # column parallel
        if joined.endswith(('qkv/scale', 'lin1/scale', 'lin1/b',
                            'qkv/scale4', 'lin1/scale4')):
            return P(*([None] * (ndim - 1)), 'model')      # follows the columns
        if joined.endswith(('out/w', 'out/q', 'lin2/w', 'lin2/q',
                            'out/q4', 'lin2/q4',
                            # int4 ranked packing: each rank's packed rows AND
                            # group scales are that rank's self-contained slice
                            # (quantize.quantize_linear_int4_ranked) — both
                            # split axis -2, unlike int8's replicated scales.
                            'out/scale4', 'lin2/scale4')):
            return P(*([None] * (ndim - 2)), 'model', None)  # row parallel
        return P()                                          # replicate
    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_divisible(n_heads: int, d_ff: int, mp: int) -> bool:
    """Whether the manual-TP split is well-formed for ``mp`` model shards:
    heads and the FFN hidden width must split evenly (odd dims fall back to
    the GSPMD path, which replicates them instead)."""
    return mp > 0 and n_heads % mp == 0 and d_ff % mp == 0


def tp_shard_map(mesh: Mesh, fn, n_args: int, sharded: tuple[int, ...],
                 n_out: int, param_specs):
    """Wrap ``fn(params, *args)`` to run per-shard over a mesh WITH a 'model'
    axis: params split by ``param_specs`` (tp_decode_specs), ``sharded``
    argnums split their leading axis over 'data' (when the mesh has one),
    everything else replicated.  Outputs are 'data'-sharded and assumed
    replicated over 'model' (model ranks compute in lockstep — psums inside
    the transformer return them identical values; sampling shares one rng).
    """
    has_data = 'data' in mesh.axis_names and mesh.shape.get('data', 1) >= 1
    data_spec = P('data') if has_data else P()
    in_specs = (param_specs,) + tuple(
        data_spec if i in sharded else P() for i in range(1, n_args))
    out_specs = tuple(data_spec for _ in range(n_out))
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def data_shard_map(mesh: Mesh, fn, n_args: int, sharded: tuple[int, ...],
                   n_out: int):
    """Wrap ``fn`` to run per-shard over the 'data' axis (jax.shard_map).

    ``sharded`` argnums split their leading axis over 'data'; every other
    argument replicates (P()); all ``n_out`` outputs are data-sharded.  The
    ONE mesh-dispatch wrapper shared by ValleAR decode and the fused TTS
    pipeline — a pallas_call cannot partition under GSPMD, but per shard it
    sees only local shapes, so this is how fused kernels survive onto meshes.
    check_vma off: the decode while_loop carry mixes shard-varying and
    replicated leaves by design.
    """
    in_specs = tuple(P('data') if i in sharded else P() for i in range(n_args))
    out_specs = tuple(P('data') for _ in range(n_out))
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
