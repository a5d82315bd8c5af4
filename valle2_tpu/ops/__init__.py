"""NN primitives: pure-function layers over pytree params (TPU/XLA-idiomatic)."""

from .nn import (adaln, adaln_init, add_positional, dropout, embedding, embedding_init,
                 ffn, ffn_init, layernorm, layernorm_init, linear, linear_init,
                 sinusoidal_table)
from .masks import (NEG_INF, build_attn_mask, build_pad_mask, mask_to_bias, merge_masks,
                    prefix_lm_bias)
from .attention import mha, mha_decode_step, mha_init, sdpa
from .transformer import (KVCache, encoder_layer, encoder_layer_init, transformer,
                          transformer_decode_step, transformer_init, transformer_prefill)
from .sampling import best_beam_index, top_k_top_p_filter, topk_sampling

__all__ = [
    'adaln', 'adaln_init', 'add_positional', 'dropout', 'embedding', 'embedding_init',
    'ffn', 'ffn_init', 'layernorm', 'layernorm_init', 'linear', 'linear_init',
    'sinusoidal_table', 'NEG_INF', 'build_attn_mask', 'build_pad_mask', 'mask_to_bias',
    'merge_masks', 'prefix_lm_bias', 'mha', 'mha_decode_step', 'mha_init', 'sdpa',
    'KVCache', 'encoder_layer', 'encoder_layer_init', 'transformer',
    'transformer_decode_step', 'transformer_init', 'transformer_prefill',
    'best_beam_index', 'top_k_top_p_filter', 'topk_sampling',
]
