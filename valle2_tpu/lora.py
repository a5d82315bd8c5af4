"""LoRA adapters: parameter-efficient fine-tuning (voice/domain adaptation).

No reference counterpart (the reference trains full models only,
``/root/reference/valle/train_model.py:13-35``); this is the standard workflow
for adapting a trained TTS/ASR model to a new speaker or domain without
touching the base weights.

TPU-native design: adapters live in a PARALLEL pytree and are **merged into the
dense weights inside the jitted step** — ``w_eff = w + (alpha / rank) * A @ B``
(Hu et al. 2021).  Gradients flow only to A/B (the base is a frozen constant in
the grad closure, bit-identical forever), the merge is a rank-r matmul per
target (negligible next to the forward pass), and every downstream consumer —
the fused Pallas decode kernel, int8/int4 weight quantization, GSPMD/manual-TP
meshes — sees ordinary dense params, so serving a fine-tune needs ZERO new
inference code: merge once, hand the dense tree to the model.

Adapters attach to any linear whose dict key is in ``config.lora_targets``
(default: the transformer's ``qkv``/``out``/``lin1``/``lin2`` — per-layer
leaves are stacked ``(L, in, out)``, so A/B stack ``(L, in, r)``/``(L, r, out)``
and the merge is one batched matmul per target).  Adding ``'proj'`` also adapts
the output head(s) and the AdaLN conditioning projections.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

#: Linear param-dict keys adapters attach to by default (ops/transformer.py).
DEFAULT_TARGETS = ('qkv', 'out', 'lin1', 'lin2')


def _is_linear(node) -> bool:
    return isinstance(node, dict) and 'w' in node and jnp.ndim(node['w']) >= 2


def lora_init(key: jax.Array, params: Params, rank: int,
              targets=DEFAULT_TARGETS) -> Params:
    """Adapter tree for every target linear reachable in ``params``.

    A ~ U(-1/sqrt(in), 1/sqrt(in)) (the base linears' kaiming-uniform bound),
    B = 0 — so the attached model starts EXACTLY at the base model.  Leading
    (stacked-layer) dims of ``w`` carry over to A/B.
    """
    if rank <= 0:
        raise ValueError(f'lora rank must be positive, got {rank}')
    counter = [0]

    def walk(node, k):
        out = {}
        for name, sub in node.items():
            if name in targets and _is_linear(sub):
                w = sub['w']
                *batch, d_in, d_out = w.shape
                counter[0] += 1
                bound = 1.0 / math.sqrt(d_in)
                a = jax.random.uniform(jax.random.fold_in(k, counter[0]),
                                       (*batch, d_in, rank), w.dtype,
                                       -bound, bound)
                out[name] = {'lora_a': a,
                             'lora_b': jnp.zeros((*batch, rank, d_out), w.dtype)}
            elif isinstance(sub, dict):
                child = walk(sub, k)
                if child:
                    out[name] = child
        return out

    tree = walk(params, key)
    if counter[0] == 0:
        raise ValueError(f'no LoRA targets {targets} found in the params tree')
    return tree


def merge_lora(params: Params, lora: Params, scale: float) -> Params:
    """Dense params with adapters folded in: ``w + scale * A @ B`` per target.

    Pure and cheap (rank-r matmuls); call inside jit (the train step) or once
    on host (export for serving).  Non-target leaves are shared, not copied.
    """
    def walk(node, lnode):
        out = dict(node)
        for name, lsub in lnode.items():
            sub = node[name]
            if 'lora_a' in lsub:
                delta = jnp.matmul(lsub['lora_a'].astype(jnp.float32),
                                   lsub['lora_b'].astype(jnp.float32)) * scale
                new = dict(sub)
                new['w'] = sub['w'] + delta.astype(sub['w'].dtype)
                out[name] = new
            else:
                out[name] = walk(sub, lsub)
        return out

    return walk(params, lora)


def lora_scale(config) -> float:
    return float(config.lora_alpha) / float(config.lora_rank)


def attach(params: Params, config, key: jax.Array) -> Params:
    """Base params → the fine-tune state ``{'base': ..., 'lora': ...}`` that
    ``train.init_state`` builds and the Trainer checkpoints."""
    return {'base': params,
            'lora': lora_init(key, params, config.lora_rank,
                              tuple(config.lora_targets))}


def is_lora_state(tree) -> bool:
    return isinstance(tree, dict) and set(tree) == {'base', 'lora'}


def merged(tree: Params, config) -> Params:
    """Effective dense params: merge if ``tree`` is a fine-tune state, else
    pass through — the single entry the train/eval steps call."""
    if is_lora_state(tree):
        return merge_lora(tree['base'], tree['lora'], lora_scale(config))
    return tree


def adapter_count(lora: Params) -> int:
    return sum(leaf.size for leaf in jax.tree.leaves(lora))


# ---------------------------------------------------------------------------
# Portable adapter files (npz — adapters are tiny; distribute them without the
# base checkpoint, orbax dirs, or pickle)
# ---------------------------------------------------------------------------

_SCALE_KEY = '__scale__'   # reserved npz entry: the merge scale (alpha/rank)


def save_adapters(path, lora: Params, scale: float | None = None) -> None:
    """``scale`` (= alpha/rank at training time) makes the file self-contained
    — consumers (e.g. serve.TTSServer.load_voice) merge without needing the
    training config."""
    flat = {'/'.join(str(getattr(k, 'key', k)) for k in p): np.asarray(leaf)
            for p, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]}
    if scale is not None:
        flat[_SCALE_KEY] = np.float64(scale)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_adapters(path) -> Params:
    return load_adapters_with_scale(path)[0]


def load_adapters_with_scale(path) -> tuple[Params, float | None]:
    tree: Params = {}
    scale = None
    with np.load(Path(path)) as z:
        for joined in z.files:
            if joined == _SCALE_KEY:
                scale = float(z[joined])
                continue
            node = tree
            *parents, leaf = joined.split('/')
            for name in parents:
                node = node.setdefault(name, {})
            node[leaf] = jnp.asarray(z[joined])
    return tree, scale
