"""Pallas TPU kernels (flag-gated; jnp-native paths remain the reference)."""

from .flash_attention import flash_attention, reference_attention
from .rvq import rvq_encode_fused

__all__ = ['flash_attention', 'reference_attention', 'rvq_encode_fused']
