"""Torch mirror of the reference VALL-E semantics, for parity testing.

Implements the *documented equations* of the reference models
(/root/reference/valle/models/modules.py, valle_ar.py, valle_nar.py — see SURVEY §2/§3)
directly with torch.nn.functional, structured to load valle2_tpu's JAX param pytrees.
This is the stand-in for the real PyTorch reference (whose lightning/encodec/g2p_en
dependencies are not installed in this image): same math, same weights, independent
code path — the BASELINE greedy token-parity gate runs against it.
"""

from __future__ import annotations

import math

import jax
import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def sinusoidal_pe(max_len: int, d: int) -> torch.Tensor:
    position = torch.arange(max_len, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    pe = torch.zeros(max_len, d)
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe


def prefix_lm_attend_mask(x_len: int, y_len: int) -> torch.Tensor:
    """(s, s) bool, True = attend (SDPA convention)."""
    s = x_len + y_len
    q = torch.arange(s)[:, None]
    k = torch.arange(s)[None, :]
    token_q = q < x_len
    attend_token_row = k < x_len
    attend_audio_row = k <= q
    return torch.where(token_q, attend_token_row, attend_audio_row)


class TorchValleAR:
    """Reference-equation AR model over valle2_tpu params (greedy decode only)."""

    def __init__(self, jax_params, config):
        self.config = config
        p = jax.tree.map(lambda a: np.asarray(a), jax_params)
        self.tokens_emb = t(p['tokens_emb']['emb'])
        self.audio_emb = t(p['audio_emb']['emb'])
        self.proj_w = t(p['proj']['w'])                       # (d, V+1)
        self.layers = []
        tr = p['transformer']
        n_layers = tr['attn']['qkv']['w'].shape[0]
        for i in range(n_layers):
            self.layers.append({
                'qkv_w': t(tr['attn']['qkv']['w'][i]),
                'out_w': t(tr['attn']['out']['w'][i]),
                'out_b': t(tr['attn']['out']['b'][i]),
                'ffn_w1': t(tr['ffn']['lin1']['w'][i]),
                'ffn_b1': t(tr['ffn']['lin1']['b'][i]),
                'ffn_w2': t(tr['ffn']['lin2']['w'][i]),
                'ffn_b2': t(tr['ffn']['lin2']['b'][i]),
                'n1_scale': t(tr['norm1']['scale'][i]),
                'n1_bias': t(tr['norm1']['bias'][i]),
                'n2_scale': t(tr['norm2']['scale'][i]),
                'n2_bias': t(tr['norm2']['bias'][i]),
            })
        self.pe = sinusoidal_pe(5000, config.d_model)
        self.n_heads = config.n_heads

    def _block(self, lp, x, attend_mask):
        b, s, d = x.shape
        h = self.n_heads
        hn = F.layer_norm(x, (d,), lp['n1_scale'], lp['n1_bias'])
        qkv = hn @ lp['qkv_w']
        q, k, v = qkv.chunk(3, dim=-1)
        rs = lambda z: z.view(b, s, h, d // h).transpose(1, 2)
        attn = F.scaled_dot_product_attention(rs(q), rs(k), rs(v),
                                              attn_mask=attend_mask)
        attn = attn.transpose(1, 2).reshape(b, s, d)
        x = x + (attn @ lp['out_w'] + lp['out_b'])
        hn = F.layer_norm(x, (d,), lp['n2_scale'], lp['n2_bias'])
        ff = F.gelu(hn @ lp['ffn_w1'] + lp['ffn_b1']) @ lp['ffn_w2'] + lp['ffn_b2']
        return x + ff

    def forward_logits(self, tokens: np.ndarray, codes: np.ndarray) -> torch.Tensor:
        """tokens (Tt,), codes (Tc,) BOS-prefixed → logits (Tc, V+1)."""
        tt, tc = len(tokens), len(codes)
        x_tok = self.tokens_emb[torch.from_numpy(np.asarray(tokens, np.int64))]
        x_tok = x_tok + self.pe[:tt]
        x_aud = self.audio_emb[torch.from_numpy(np.asarray(codes, np.int64))]
        x_aud = x_aud + self.pe[:tc]
        x = torch.cat([x_tok, x_aud], dim=0)[None]
        mask = prefix_lm_attend_mask(tt, tc)
        with torch.no_grad():
            for lp in self.layers:
                x = self._block(lp, x, mask)
        return (x[0, tt:] @ self.proj_w)

    def greedy_generate(self, prompt_tokens: np.ndarray, prompt_codes0: np.ndarray,
                        max_new: int) -> list[int]:
        """Reference decode loop at temperature→0 (argmax), uncached full re-forward
        each step (equal to the reference's cached path for unpadded input)."""
        eos = self.config.num_audio_tokens
        bos = eos + 1
        codes = [bos] + [int(c) for c in prompt_codes0]
        out = []
        for _ in range(max_new):
            logits = self.forward_logits(prompt_tokens, np.asarray(codes))
            nxt = int(torch.argmax(logits[-1]))
            if nxt == eos:
                break
            codes.append(nxt)
            out.append(nxt)
        return out


class TorchValleNARStage:
    """One NAR refinement stage with AdaLN, over valle2_tpu params."""

    def __init__(self, jax_params, config):
        self.config = config
        p = jax.tree.map(lambda a: np.asarray(a), jax_params)
        self.tokens_emb = t(p['tokens_emb']['emb'])
        self.codes_embs = t(p['codes_embs'])                   # (nq, V, d)
        self.stage_embs = t(p['stage_embs'])                   # (nq-1, d)
        self.proj = t(p['proj_layers'])                        # (nq-1, d, V)
        tr = p['transformer']
        self.layers = []
        for i in range(tr['attn']['qkv']['w'].shape[0]):
            self.layers.append({
                'qkv_w': t(tr['attn']['qkv']['w'][i]),
                'out_w': t(tr['attn']['out']['w'][i]),
                'out_b': t(tr['attn']['out']['b'][i]),
                'ffn_w1': t(tr['ffn']['lin1']['w'][i]),
                'ffn_b1': t(tr['ffn']['lin1']['b'][i]),
                'ffn_w2': t(tr['ffn']['lin2']['w'][i]),
                'ffn_b2': t(tr['ffn']['lin2']['b'][i]),
                'n1_proj_w': t(tr['norm1']['proj']['w'][i]),
                'n1_proj_b': t(tr['norm1']['proj']['b'][i]),
                'n1_scale': t(tr['norm1']['ln']['scale'][i]),
                'n1_bias': t(tr['norm1']['ln']['bias'][i]),
                'n2_proj_w': t(tr['norm2']['proj']['w'][i]),
                'n2_proj_b': t(tr['norm2']['proj']['b'][i]),
                'n2_scale': t(tr['norm2']['ln']['scale'][i]),
                'n2_bias': t(tr['norm2']['ln']['bias'][i]),
            })
        self.pe = sinusoidal_pe(5000, config.d_model)
        self.n_heads = config.n_heads

    def _adaln(self, x, cond, proj_w, proj_b, scale, bias):
        wb = cond @ proj_w + proj_b
        w, b = wb.split(wb.shape[-1] // 2, dim=-1)
        d = x.shape[-1]
        return w * F.layer_norm(x, (d,), scale, bias) + b

    def _block(self, lp, x, cond):
        b, s, d = x.shape
        h = self.n_heads
        hn = self._adaln(x, cond, lp['n1_proj_w'], lp['n1_proj_b'],
                         lp['n1_scale'], lp['n1_bias'])
        qkv = hn @ lp['qkv_w']
        q, k, v = qkv.chunk(3, dim=-1)
        rs = lambda z: z.view(b, s, h, d // h).transpose(1, 2)
        attn = F.scaled_dot_product_attention(rs(q), rs(k), rs(v))  # bidirectional
        attn = attn.transpose(1, 2).reshape(b, s, d)
        x = x + (attn @ lp['out_w'] + lp['out_b'])
        hn = self._adaln(x, cond, lp['n2_proj_w'], lp['n2_proj_b'],
                         lp['n2_scale'], lp['n2_bias'])
        ff = F.gelu(hn @ lp['ffn_w1'] + lp['ffn_b1']) @ lp['ffn_w2'] + lp['ffn_b2']
        return x + ff

    def stage_logits(self, tokens: np.ndarray, prompt_codes: np.ndarray,
                     out_codes_by_layer: list[np.ndarray], stage: int) -> torch.Tensor:
        """Logits for refinement stage ``stage`` (1-based): prompt sums all nq
        codebook embeddings, output region sums codebooks < stage.

        tokens (Tt,), prompt_codes (Tp, nq), out_codes_by_layer: list of (T,) arrays
        for codebooks 0..stage-1.  Returns (T, V).
        """
        tt = len(tokens)
        tp = len(prompt_codes)
        x_tok = self.tokens_emb[torch.from_numpy(np.asarray(tokens, np.int64))]
        x_tok = x_tok + self.pe[:tt]

        emb_prompt = torch.zeros(tp, self.config.d_model)
        for q in range(self.config.num_quantizers):
            emb_prompt += self.codes_embs[q][
                torch.from_numpy(np.asarray(prompt_codes[:, q], np.int64))]
        tgt_len = len(out_codes_by_layer[0])
        emb_out = torch.zeros(tgt_len, self.config.d_model)
        for q in range(stage):
            emb_out += self.codes_embs[q][
                torch.from_numpy(np.asarray(out_codes_by_layer[q], np.int64))]
        codes_emb = torch.cat([emb_prompt, emb_out], dim=0)
        codes_emb = codes_emb + self.pe[:tp + tgt_len]

        x = torch.cat([x_tok, codes_emb], dim=0)[None]
        cond = self.stage_embs[stage - 1][None]
        with torch.no_grad():
            for lp in self.layers:
                x = self._block(lp, x, cond)
        return x[0, tt + tp:] @ self.proj[stage - 1]
