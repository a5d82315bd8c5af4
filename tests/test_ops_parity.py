"""Numerical parity of the JAX ops vs a torch mirror of the reference equations.

The mirror re-implements the math of /root/reference/valle/models/modules.py with
torch.nn.functional (LayerNorm, AdaLN, SDPA attention, erf-GELU FFN, sinusoidal PE),
loads the *same* weights as the JAX pytrees, and compares outputs elementwise.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from valle2_tpu.ops import (adaln, adaln_init, add_positional, build_attn_mask, ffn,
                            ffn_init, layernorm, layernorm_init, mask_to_bias,
                            merge_masks, mha, mha_init, sinusoidal_table, transformer,
                            transformer_init)

ATOL = 2e-5


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_layernorm_matches_torch():
    x = jax.random.normal(jax.random.key(0), (2, 5, 16))
    p = layernorm_init(16)
    got = layernorm(p, x)
    want = F.layer_norm(t(x), (16,), t(p['scale']), t(p['bias']), eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL)


def test_layernorm_custom_vjp_matches_torch_grads():
    """The memory-saving custom VJP (recomputed stats, bf16-input residual) must
    reproduce torch's LayerNorm gradients."""
    x = jax.random.normal(jax.random.key(4), (2, 5, 16))
    p = layernorm_init(16)
    g = jax.random.normal(jax.random.key(5), (2, 5, 16))

    def loss(p, x):
        return jnp.sum(layernorm(p, x) * g)

    dp, dx = jax.grad(loss, argnums=(0, 1))(p, x)

    xt = t(x).requires_grad_(True)
    st = t(p['scale']).requires_grad_(True)
    bt = t(p['bias']).requires_grad_(True)
    out = F.layer_norm(xt, (16,), st, bt, eps=1e-5)
    (out * t(g)).sum().backward()
    np.testing.assert_allclose(np.asarray(dx), xt.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp['scale']), st.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp['bias']), bt.grad.numpy(), atol=1e-4)


def test_adaln_matches_reference_equation():
    # Reference modules.py:93-99: weight, bias = split(proj(embedding)); w*LN(x)+b.
    d = 16
    key = jax.random.key(1)
    p = adaln_init(key, d)
    x = jax.random.normal(jax.random.key(2), (3, 7, d))
    cond = jax.random.normal(jax.random.key(3), (1, d))
    got = adaln(p, x, cond)

    proj = t(cond) @ t(p['proj']['w']) + t(p['proj']['b'])
    w, b = proj.split(d, dim=-1)
    want = w * F.layer_norm(t(x), (d,), t(p['ln']['scale']), t(p['ln']['bias'])) + b
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL)


def test_ffn_matches_torch_gelu():
    d, dff = 16, 64
    p = ffn_init(jax.random.key(4), d, dff)
    x = jax.random.normal(jax.random.key(5), (2, 3, d))
    got = ffn(p, x)
    h = F.gelu(t(x) @ t(p['lin1']['w']) + t(p['lin1']['b']))  # torch default: erf gelu
    want = h @ t(p['lin2']['w']) + t(p['lin2']['b'])
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL)


def test_positional_encoding_matches_reference_table():
    d, n = 32, 50
    pe = np.asarray(sinusoidal_table(5000, d))
    # Reference modules.py:60-64.
    position = torch.arange(5000, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    want = torch.zeros(5000, d)
    want[:, 0::2] = torch.sin(position * div)
    want[:, 1::2] = torch.cos(position * div)
    # Tight agreement where the models actually operate; large positions accumulate
    # float32 libm sin() argument error (~pos * eps), so loosen there.
    np.testing.assert_allclose(pe[:1024], want.numpy()[:1024], atol=5e-4)
    np.testing.assert_allclose(pe, want.numpy(), atol=1e-2)
    # add_positional with offset slices the right rows.
    x = jnp.zeros((1, 3, d))
    out = add_positional(jnp.asarray(pe), x, offset=7)
    np.testing.assert_allclose(np.asarray(out)[0], pe[7:10], atol=1e-6)


@pytest.mark.parametrize('with_mask', [False, True])
def test_mha_matches_torch_sdpa(with_mask):
    d, h, b, s = 32, 4, 2, 10
    p = mha_init(jax.random.key(6), d, h)
    x = jax.random.normal(jax.random.key(7), (b, s, d))

    bias = None
    torch_mask = None
    if with_mask:
        m = build_attn_mask(4, 6)  # True = masked
        merged = merge_masks(m, None, b)
        bias = mask_to_bias(merged)
        torch_mask = ~torch.from_numpy(np.asarray(merged))  # SDPA wants True = attend

    got = mha(p, x, h, bias)

    qkv = t(x) @ t(p['qkv']['w'])
    q, k, v = qkv.chunk(3, dim=-1)
    reshape = lambda z: z.view(b, s, h, d // h).transpose(1, 2)
    attn = F.scaled_dot_product_attention(reshape(q), reshape(k), reshape(v),
                                          attn_mask=torch_mask)
    out = attn.transpose(1, 2).reshape(b, s, d) @ t(p['out']['w']) + t(p['out']['b'])
    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=ATOL)


@pytest.mark.parametrize('adaptive', [False, True])
def test_transformer_stack_matches_layerwise_torch(adaptive):
    """Full scanned stack vs a per-layer torch recomputation of the reference block."""
    d, h, dff, L, b, s = 32, 4, 64, 3, 2, 9
    params = transformer_init(jax.random.key(8), L, d, h, dff, adaptive_norm=adaptive)
    x = jax.random.normal(jax.random.key(9), (b, s, d))
    cond = jax.random.normal(jax.random.key(10), (1, d)) if adaptive else None
    m = build_attn_mask(3, 6)
    bias = mask_to_bias(merge_masks(m, None, b))
    got = np.asarray(transformer(params, x, h, bias, cond))

    def norm_t(p, z):
        if adaptive:
            proj = t(cond) @ t(p['proj']['w']) + t(p['proj']['b'])
            w, bb = proj.split(d, dim=-1)
            return w * F.layer_norm(z, (d,), t(p['ln']['scale']), t(p['ln']['bias'])) + bb
        return F.layer_norm(z, (d,), t(p['scale']), t(p['bias']))

    torch_mask = ~torch.from_numpy(np.asarray(merge_masks(m, None, b)))
    z = t(x)
    for i in range(L):
        lp = jax.tree.map(lambda a, i=i: a[i], params)
        hn = norm_t(lp['norm1'], z)
        qkv = hn @ t(lp['attn']['qkv']['w'])
        q, k, v = qkv.chunk(3, dim=-1)
        rs = lambda zz: zz.view(b, s, h, d // h).transpose(1, 2)
        attn = F.scaled_dot_product_attention(rs(q), rs(k), rs(v), attn_mask=torch_mask)
        attn = attn.transpose(1, 2).reshape(b, s, d)
        z = z + (attn @ t(lp['attn']['out']['w']) + t(lp['attn']['out']['b']))
        hn = norm_t(lp['norm2'], z)
        ff = F.gelu(hn @ t(lp['ffn']['lin1']['w']) + t(lp['ffn']['lin1']['b']))
        ff = ff @ t(lp['ffn']['lin2']['w']) + t(lp['ffn']['lin2']['b'])
        z = z + ff
    np.testing.assert_allclose(got, z.numpy(), atol=1e-4)
