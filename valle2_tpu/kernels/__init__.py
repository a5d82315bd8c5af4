"""Pallas TPU kernels (flag-gated; jnp-native paths remain the reference)."""

from .adaln import adaln_fused
from .flash_attention import flash_attention, reference_attention
from .rvq import rvq_encode_fused

__all__ = ['adaln_fused', 'flash_attention', 'reference_attention',
           'rvq_encode_fused']
