"""Reference (PyTorch) Valle checkpoint → valle2_tpu pytree converter.

Maps the reference's torch ``state_dict`` naming — TokenEmbedding wraps
``word_embeddings`` (modules.py:24), Transformer layers expose
``self_attn.qkv/out``, ``ffn.linear_1/linear_2``, ``norm1/norm2`` (modules.py:224-303),
AR head ``proj`` (valle_ar.py:29), NAR ``codes_embs.N`` / ``stage_embs.N`` /
``proj_layers.N`` (valle_nar.py:26-47) — onto this package's stacked pytrees.
Linear weights transpose (out, in) → (in, out); per-layer tensors stack on a leading
layer axis for the scanned transformer.

This is a *parity tool*: load weights trained with the reference and decode them here
(or vice versa via tests/torch_mirror.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]


def _t(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    return np.asarray(sd[key], np.float32)


def _layer(sd: Mapping, prefix: str, adaptive: bool) -> Params:
    def norm(n: str) -> Params:
        if adaptive:
            return {'proj': {'w': _t(sd, f'{prefix}.{n}.project_layer.weight').T.copy(),
                             'b': _t(sd, f'{prefix}.{n}.project_layer.bias')},
                    'ln': {'scale': _t(sd, f'{prefix}.{n}.norm.weight'),
                           'bias': _t(sd, f'{prefix}.{n}.norm.bias')}}
        return {'scale': _t(sd, f'{prefix}.{n}.weight'),
                'bias': _t(sd, f'{prefix}.{n}.bias')}

    return {
        'attn': {'qkv': {'w': _t(sd, f'{prefix}.self_attn.qkv.weight').T.copy()},
                 'out': {'w': _t(sd, f'{prefix}.self_attn.out.weight').T.copy(),
                         'b': _t(sd, f'{prefix}.self_attn.out.bias')}},
        'ffn': {'lin1': {'w': _t(sd, f'{prefix}.ffn.linear_1.weight').T.copy(),
                         'b': _t(sd, f'{prefix}.ffn.linear_1.bias')},
                'lin2': {'w': _t(sd, f'{prefix}.ffn.linear_2.weight').T.copy(),
                         'b': _t(sd, f'{prefix}.ffn.linear_2.bias')}},
        'norm1': norm('norm1'),
        'norm2': norm('norm2'),
    }


def _stack_layers(sd: Mapping, prefix: str, num_layers: int, adaptive: bool) -> Params:
    import jax
    layers = [_layer(sd, f'{prefix}.layers.{i}', adaptive) for i in range(num_layers)]
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def convert_ar_state_dict(sd: Mapping[str, np.ndarray], num_layers: int) -> Params:
    """Reference ValleAR state dict → ar.init_params-shaped pytree."""
    return {
        'tokens_emb': {'emb': _t(sd, 'tokens_emb.word_embeddings.weight')},
        'audio_emb': {'emb': _t(sd, 'audio_emb.word_embeddings.weight')},
        'transformer': _stack_layers(sd, 'transformer', num_layers, adaptive=False),
        'proj': {'w': _t(sd, 'proj.weight').T.copy()},
    }


def convert_nar_state_dict(sd: Mapping[str, np.ndarray], num_layers: int,
                           num_quantizers: int = 8) -> Params:
    """Reference ValleNAR state dict → nar.init_params-shaped pytree."""
    return {
        'tokens_emb': {'emb': _t(sd, 'tokens_emb.word_embeddings.weight')},
        'codes_embs': np.stack(
            [_t(sd, f'codes_embs.{q}.word_embeddings.weight')
             for q in range(num_quantizers)]),
        'stage_embs': np.stack(
            [_t(sd, f'stage_embs.{q}.word_embeddings.weight')[0]
             for q in range(num_quantizers - 1)]),
        'transformer': _stack_layers(sd, 'transformer', num_layers, adaptive=True),
        'proj_layers': np.stack(
            [_t(sd, f'proj_layers.{q}.weight').T.copy()
             for q in range(num_quantizers - 1)]),
    }


def load_torch_checkpoint(path: str, model: str, num_layers: int = 8,
                          num_quantizers: int = 8) -> Params:
    """Load a torch/Lightning checkpoint file and convert (model: ValleAR|ValleNAR).

    Accepts raw state dicts or Lightning checkpoints ({'state_dict': {...}} with an
    optional 'model.' key prefix).
    """
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=True)
    sd = obj.get('state_dict', obj) if isinstance(obj, dict) else obj
    sd = {k.removeprefix('model.'): v.numpy() if hasattr(v, 'numpy') else v
          for k, v in sd.items()}
    if model == 'ValleNAR':
        return convert_nar_state_dict(sd, num_layers, num_quantizers)
    return convert_ar_state_dict(sd, num_layers)


# ---------------------------------------------------------------------------
# Reverse direction: valle2_tpu pytree → reference torch state dict
# (exact inverses of the converters above; round-trip gated in
# tests/test_model_convert.py, and the forward direction is independently
# validated against real torch nn.Modules — so export inherits correctness)
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _export_layers(tr: Params, prefix: str, adaptive: bool) -> dict[str, np.ndarray]:
    num_layers = int(np.shape(tr['attn']['qkv']['w'])[0])
    sd: dict[str, np.ndarray] = {}
    for i in range(num_layers):
        pre = f'{prefix}.layers.{i}'
        sd[f'{pre}.self_attn.qkv.weight'] = _np(tr['attn']['qkv']['w'][i]).T.copy()
        sd[f'{pre}.self_attn.out.weight'] = _np(tr['attn']['out']['w'][i]).T.copy()
        sd[f'{pre}.self_attn.out.bias'] = _np(tr['attn']['out']['b'][i])
        sd[f'{pre}.ffn.linear_1.weight'] = _np(tr['ffn']['lin1']['w'][i]).T.copy()
        sd[f'{pre}.ffn.linear_1.bias'] = _np(tr['ffn']['lin1']['b'][i])
        sd[f'{pre}.ffn.linear_2.weight'] = _np(tr['ffn']['lin2']['w'][i]).T.copy()
        sd[f'{pre}.ffn.linear_2.bias'] = _np(tr['ffn']['lin2']['b'][i])
        for n in ('norm1', 'norm2'):
            if adaptive:
                sd[f'{pre}.{n}.project_layer.weight'] = \
                    _np(tr[n]['proj']['w'][i]).T.copy()
                sd[f'{pre}.{n}.project_layer.bias'] = _np(tr[n]['proj']['b'][i])
                sd[f'{pre}.{n}.norm.weight'] = _np(tr[n]['ln']['scale'][i])
                sd[f'{pre}.{n}.norm.bias'] = _np(tr[n]['ln']['bias'][i])
            else:
                sd[f'{pre}.{n}.weight'] = _np(tr[n]['scale'][i])
                sd[f'{pre}.{n}.bias'] = _np(tr[n]['bias'][i])
    return sd


def export_ar_state_dict(params: Params) -> dict[str, np.ndarray]:
    """AR pytree → reference ValleAR state-dict naming (torch layouts).

    Weights trained here load into the reference implementation (or any torch
    mirror with its module structure) — checkpoint interop is bidirectional.
    LoRA fine-tune states must be merged first (``lora.merged``).
    """
    adaptive = 'proj' in params['transformer']['norm1']
    return {
        'tokens_emb.word_embeddings.weight': _np(params['tokens_emb']['emb']),
        'audio_emb.word_embeddings.weight': _np(params['audio_emb']['emb']),
        'proj.weight': _np(params['proj']['w']).T.copy(),
        **_export_layers(params['transformer'], 'transformer', adaptive),
    }


def export_nar_state_dict(params: Params) -> dict[str, np.ndarray]:
    """NAR pytree → reference ValleNAR state-dict naming (torch layouts)."""
    adaptive = 'proj' in params['transformer']['norm1']
    sd = {'tokens_emb.word_embeddings.weight': _np(params['tokens_emb']['emb'])}
    for q in range(np.shape(params['codes_embs'])[0]):
        sd[f'codes_embs.{q}.word_embeddings.weight'] = _np(params['codes_embs'][q])
    for q in range(np.shape(params['stage_embs'])[0]):
        sd[f'stage_embs.{q}.word_embeddings.weight'] = \
            _np(params['stage_embs'][q])[None]
        sd[f'proj_layers.{q}.weight'] = _np(params['proj_layers'][q]).T.copy()
    sd.update(_export_layers(params['transformer'], 'transformer', adaptive))
    return sd


def save_torch_checkpoint(path: str, params: Params, model: str) -> None:
    """Write a torch checkpoint file the reference stack (and
    ``load_torch_checkpoint``) reads: ``{'state_dict': {name: tensor}}``.

    model: 'ValleAR' | 'ValleASR' (AR naming) | 'ValleNAR'.
    """
    import torch
    sd = export_nar_state_dict(params) if model == 'ValleNAR' \
        else export_ar_state_dict(params)
    torch.save({'state_dict': {k: torch.from_numpy(v) for k, v in sd.items()}},
               path)
