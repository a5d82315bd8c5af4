"""Full-stack PyTorch mirror of the EnCodec-24 kHz architecture (SEANet + RVQ).

The reference consumes this model as a pip black box
(/root/reference/valle/models/encodec_pip.py:13-16 instantiates
``EncodecModel.encodec_model_24khz()`` @ 6 kbps).  The pip package is not
installable in this image, so this file implements the same architecture
(facebookresearch/encodec v0.1.1; geometry per SURVEY §2.2) directly in torch:

- causal weight-normed SConv1d / SConvTranspose1d with encodec's exact padding
  (left pad ``kernel - stride``; right "extra padding" for ceil frame counts;
  reflect mode with zero-extension fallback for short signals),
- SEANetResnetBlock (ELU → k=3 conv → ELU → k=1 conv, 1×1 conv shortcut),
- SEANetEncoder/Decoder with ratios (8, 5, 4, 2) and a 2-layer skip LSTM,
- residual vector quantization (8 × 1024 × 128 Euclidean codebooks).

State-dict key naming matches the real checkpoint exactly
(``encoder.model.0.conv.conv.weight_g``, ``decoder.model.3.convtr.convtr.*``,
``quantizer.vq.layers.{q}._codebook.embed``), so
``valle2_tpu.codec.convert.convert_state_dict`` consumes it unchanged.  This is
the stand-in for the real pretrained checkpoint: if the JAX stack reproduces
this model's token IDs end-to-end on synthesized weight-normed checkpoints, a
real checkpoint drop-in is conversion-only.
"""

from __future__ import annotations

import math

import torch
from torch import nn

RATIOS = (8, 5, 4, 2)
N_FILTERS = 32
DIMENSION = 128
KERNEL = 7
RES_KERNEL = 3
COMPRESS = 2
LSTM_LAYERS = 2
N_Q = 8
CODEBOOK_SIZE = 1024


def _weight_norm(module: nn.Module) -> nn.Module:
    # torch.nn.utils.weight_norm produces the legacy weight_g/weight_v keys the
    # real encodec checkpoints carry (the parametrize variant renames them).
    return nn.utils.weight_norm(module)


def _get_extra_padding(x: torch.Tensor, kernel_size: int, stride: int,
                       padding_total: int) -> int:
    """encodec's get_extra_padding_for_conv1d: right pad so the conv sees a whole
    number of windows (ceil frame count)."""
    length = x.shape[-1]
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return max(ideal_length - length, 0)


def _pad1d(x: torch.Tensor, left: int, right: int, mode: str = 'reflect') -> torch.Tensor:
    """encodec's pad1d: reflect with zero-extension fallback for short signals."""
    length = x.shape[-1]
    if mode == 'reflect':
        max_pad = max(left, right)
        if max_pad >= length:
            extra = max_pad - length + 1
            x = nn.functional.pad(x, (0, extra))
            padded = nn.functional.pad(x, (left, right), mode=mode)
            end = padded.shape[-1] - extra
            return padded[..., :end]
    return nn.functional.pad(x, (left, right), mode=mode)


class NormConv1d(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, kernel: int, stride: int = 1,
                 dilation: int = 1):
        super().__init__()
        self.conv = _weight_norm(nn.Conv1d(in_ch, out_ch, kernel, stride=stride,
                                           dilation=dilation))

    def forward(self, x):
        return self.conv(x)


class NormConvTranspose1d(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, kernel: int, stride: int = 1):
        super().__init__()
        self.convtr = _weight_norm(nn.ConvTranspose1d(in_ch, out_ch, kernel,
                                                      stride=stride))

    def forward(self, x):
        return self.convtr(x)


class SConv1d(nn.Module):
    """Causal conv: left pad (eff_kernel - stride), right extra pad, reflect."""

    def __init__(self, in_ch: int, out_ch: int, kernel: int, stride: int = 1,
                 dilation: int = 1):
        super().__init__()
        self.conv = NormConv1d(in_ch, out_ch, kernel, stride=stride, dilation=dilation)
        self._kernel, self._stride, self._dilation = kernel, stride, dilation

    def forward(self, x):
        eff_kernel = (self._kernel - 1) * self._dilation + 1
        padding_total = eff_kernel - self._stride
        extra = _get_extra_padding(x, eff_kernel, self._stride, padding_total)
        x = _pad1d(x, padding_total, extra, mode='reflect')
        return self.conv(x)


class SConvTranspose1d(nn.Module):
    """Causal transposed conv: trim kernel - stride from the right
    (trim_right_ratio = 1.0)."""

    def __init__(self, in_ch: int, out_ch: int, kernel: int, stride: int):
        super().__init__()
        self.convtr = NormConvTranspose1d(in_ch, out_ch, kernel, stride=stride)
        self._trim = kernel - stride

    def forward(self, x):
        y = self.convtr(x)
        if self._trim > 0:
            y = y[..., :-self._trim]
        return y


class SEANetResnetBlock(nn.Module):
    """[ELU, conv k=3, ELU, conv k=1] with a 1×1 conv shortcut (true_skip=False)."""

    def __init__(self, dim: int):
        super().__init__()
        hidden = dim // COMPRESS
        self.block = nn.Sequential(
            nn.ELU(alpha=1.0),
            SConv1d(dim, hidden, RES_KERNEL),
            nn.ELU(alpha=1.0),
            SConv1d(hidden, dim, 1),
        )
        self.shortcut = SConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SLSTM(nn.Module):
    """2-layer LSTM over (B, C, T) with residual skip."""

    def __init__(self, dim: int):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, LSTM_LAYERS)

    def forward(self, x):
        x = x.permute(2, 0, 1)                       # (T, B, C)
        y, _ = self.lstm(x)
        y = y + x
        return y.permute(1, 2, 0)


class SEANetEncoder(nn.Module):
    """Sequential indices: 0 stem | per stage i: 1+3i res, 2+3i ELU, 3+3i down |
    13 LSTM | 14 ELU | 15 head."""

    def __init__(self):
        super().__init__()
        layers: list[nn.Module] = [SConv1d(1, N_FILTERS, KERNEL)]
        mult = 1
        for ratio in reversed(RATIOS):               # 2, 4, 5, 8
            ch = mult * N_FILTERS
            layers += [SEANetResnetBlock(ch), nn.ELU(alpha=1.0),
                       SConv1d(ch, ch * 2, ratio * 2, stride=ratio)]
            mult *= 2
        layers += [SLSTM(mult * N_FILTERS), nn.ELU(alpha=1.0),
                   SConv1d(mult * N_FILTERS, DIMENSION, KERNEL)]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class SEANetDecoder(nn.Module):
    """Sequential indices: 0 stem | 1 LSTM | per stage i: 2+3i ELU, 3+3i convtr,
    4+3i res | 14 ELU | 15 head."""

    def __init__(self):
        super().__init__()
        mult = 2 ** len(RATIOS)
        layers: list[nn.Module] = [SConv1d(DIMENSION, mult * N_FILTERS, KERNEL),
                                   SLSTM(mult * N_FILTERS)]
        for ratio in RATIOS:                         # 8, 5, 4, 2
            ch = mult * N_FILTERS
            layers += [nn.ELU(alpha=1.0),
                       SConvTranspose1d(ch, ch // 2, ratio * 2, stride=ratio),
                       SEANetResnetBlock(ch // 2)]
            mult //= 2
        layers += [nn.ELU(alpha=1.0), SConv1d(N_FILTERS, 1, KERNEL)]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class _Codebook(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer('embed', torch.randn(CODEBOOK_SIZE, DIMENSION))

    def quantize(self, x: torch.Tensor) -> torch.Tensor:
        """(N, D) → (N,) nearest-row indices; encodec EuclideanCodebook.quantize
        expanded-distance form, argmax ties to the first index."""
        embed = self.embed.t()
        dist = -(x.pow(2).sum(1, keepdim=True) - 2 * x @ embed
                 + embed.pow(2).sum(0, keepdim=True))
        return dist.max(dim=-1).indices

    def decode(self, ind: torch.Tensor) -> torch.Tensor:
        return nn.functional.embedding(ind, self.embed)


class _VectorQuantization(nn.Module):
    def __init__(self):
        super().__init__()
        self._codebook = _Codebook()


class _ResidualVQ(nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = nn.ModuleList([_VectorQuantization() for _ in range(N_Q)])

    def encode(self, x: torch.Tensor, n_q: int = N_Q) -> torch.Tensor:
        """(B, D, T) latents → (n_q, B, T) codes (greedy residual argmin)."""
        residual = x.permute(0, 2, 1).reshape(-1, x.shape[1])   # (B*T, D)
        all_indices = []
        for layer in self.layers[:n_q]:
            ind = layer._codebook.quantize(residual)
            residual = residual - layer._codebook.decode(ind)
            all_indices.append(ind.view(x.shape[0], x.shape[2]))
        return torch.stack(all_indices)

    def decode(self, codes: torch.Tensor) -> torch.Tensor:
        """(n_q, B, T) codes → (B, D, T) latents."""
        out = None
        for q, layer in enumerate(self.layers[:codes.shape[0]]):
            quantized = layer._codebook.decode(codes[q])        # (B, T, D)
            out = quantized if out is None else out + quantized
        return out.permute(0, 2, 1)


class _Quantizer(nn.Module):
    def __init__(self):
        super().__init__()
        self.vq = _ResidualVQ()


class EncodecMirror(nn.Module):
    """Torch mirror of the full pip model at 24 kHz / 6 kbps (8 codebooks)."""

    def __init__(self, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        self.encoder = SEANetEncoder()
        self.decoder = SEANetDecoder()
        self.quantizer = _Quantizer()

    @torch.no_grad()
    def encode(self, wav: torch.Tensor) -> torch.Tensor:
        """(B, T) waveform → (B, 8, ceil(T/320)) codes."""
        latents = self.encoder(wav[:, None, :])
        return self.quantizer.vq.encode(latents).permute(1, 0, 2)

    @torch.no_grad()
    def decode(self, codes: torch.Tensor) -> torch.Tensor:
        """(B, 8, F) codes → (B, F*320) waveform."""
        latents = self.quantizer.vq.decode(codes.permute(1, 0, 2))
        return self.decoder(latents)[:, 0, :]

    @torch.no_grad()
    def get_embedding(self, wav: torch.Tensor) -> torch.Tensor:
        """(B, T) waveform → (B, 128, F) pre-VQ latents."""
        return self.encoder(wav[:, None, :])

    def numpy_state_dict(self) -> dict:
        return {k: v.detach().numpy() for k, v in self.state_dict().items()}
