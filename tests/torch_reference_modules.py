"""Reference-shaped torch nn.Modules for converter validation.

These classes reproduce the *module structure and attribute naming* of the
reference implementation (/root/reference/valle/models/modules.py:11-352 and
valle_ar.py:15-29) with freshly written torch code, so ``state_dict()`` emits the
exact key names and tensor layouts a reference-trained checkpoint would carry
(``tokens_emb.word_embeddings.weight``, ``transformer.layers.N.self_attn.qkv.weight``,
``...ffn.linear_1.*``, AdaLN ``project_layer``/``norm``, ...).

models/convert.py must consume this state dict and produce a pytree whose decode
matches this module's forward — that closes the round-1 gap where the converter
was only ever fed hand-synthesized dicts (a shared misreading of the naming or
layout would never surface).
"""

from __future__ import annotations

import math

import torch
from torch import nn


def sinusoidal_pe(max_len: int, d: int) -> torch.Tensor:
    pe = torch.zeros(max_len, d)
    pos = torch.arange(max_len, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * (-math.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


class TokenEmbedding(nn.Module):
    def __init__(self, vocab: int, d: int):
        super().__init__()
        self.word_embeddings = nn.Embedding(vocab, d)

    def forward(self, ids):
        return self.word_embeddings(ids)


class MultiHeadAttention(nn.Module):
    def __init__(self, d: int, n_heads: int):
        super().__init__()
        self.qkv = nn.Linear(d, 3 * d, bias=False)
        self.out = nn.Linear(d, d)
        self.n_heads = n_heads

    def forward(self, x, attend_mask):
        b, s, d = x.shape
        h = self.n_heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.view(b, s, h, d // h).transpose(1, 2)
        k = k.view(b, s, h, d // h).transpose(1, 2)
        v = v.view(b, s, h, d // h).transpose(1, 2)
        attn = nn.functional.scaled_dot_product_attention(q, k, v,
                                                          attn_mask=attend_mask)
        return self.out(attn.transpose(1, 2).reshape(b, s, d))


class FeedForward(nn.Module):
    def __init__(self, d: int, dff: int):
        super().__init__()
        self.linear_1 = nn.Linear(d, dff)
        self.linear_2 = nn.Linear(dff, d)

    def forward(self, x):
        return self.linear_2(nn.functional.gelu(self.linear_1(x)))


class AdaptiveLayerNorm(nn.Module):
    def __init__(self, d: int):
        super().__init__()
        self.project_layer = nn.Linear(d, 2 * d)
        self.norm = nn.LayerNorm(d)

    def forward(self, x, embedding):
        w, b = self.project_layer(embedding).chunk(2, dim=-1)
        return w * self.norm(x) + b


class EncoderLayer(nn.Module):
    def __init__(self, d: int, n_heads: int, dff: int, adaptive: bool):
        super().__init__()
        self.self_attn = MultiHeadAttention(d, n_heads)
        self.ffn = FeedForward(d, dff)
        if adaptive:
            self.norm1 = AdaptiveLayerNorm(d)
            self.norm2 = AdaptiveLayerNorm(d)
        else:
            self.norm1 = nn.LayerNorm(d)
            self.norm2 = nn.LayerNorm(d)
        self._adaptive = adaptive

    def forward(self, x, attend_mask, embedding=None):
        n1 = self.norm1(x, embedding) if self._adaptive else self.norm1(x)
        x = x + self.self_attn(n1, attend_mask)
        n2 = self.norm2(x, embedding) if self._adaptive else self.norm2(x)
        return x + self.ffn(n2)


class Transformer(nn.Module):
    def __init__(self, num_layers: int, d: int, n_heads: int, dff: int,
                 adaptive: bool = False):
        super().__init__()
        self.layers = nn.ModuleList(
            [EncoderLayer(d, n_heads, dff, adaptive) for _ in range(num_layers)])

    def forward(self, x, attend_mask, embedding=None):
        for layer in self.layers:
            x = layer(x, attend_mask, embedding)
        return x


class ReferenceShapedValleAR(nn.Module):
    """AR model with the reference's state-dict surface and an independent torch
    forward (prefix-LM over [tokens; codes], per-stream sinusoidal PE)."""

    def __init__(self, config):
        super().__init__()
        torch.manual_seed(0)
        d = config.d_model
        self.tokens_emb = TokenEmbedding(config.vocab_size, d)
        self.audio_emb = TokenEmbedding(config.num_audio_tokens + 2, d)
        self.transformer = Transformer(config.num_layers, d, config.n_heads,
                                       config.dim_feedforward)
        self.proj = nn.Linear(d, config.num_audio_tokens + 1, bias=False)
        self.pe = sinusoidal_pe(5000, d)
        self.config = config

    @torch.no_grad()
    def forward_logits(self, tokens, codes) -> torch.Tensor:
        """tokens (b, Tt), codes (b, Tc) BOS-prefixed → logits (b, Tc, V+1)."""
        tt, tc = tokens.shape[1], codes.shape[1]
        x_tok = self.tokens_emb(tokens) + self.pe[:tt]
        x_aud = self.audio_emb(codes) + self.pe[:tc]
        x = torch.cat([x_tok, x_aud], dim=1)
        s = tt + tc
        q = torch.arange(s)[:, None]
        k = torch.arange(s)[None, :]
        attend = (k < tt) | ((k >= tt) & (k <= q))           # True = attend
        y = self.transformer(x, attend)
        return self.proj(y[:, tt:])
