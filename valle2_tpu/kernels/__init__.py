"""Pallas TPU kernels (flag-gated; jnp-native paths remain the reference)."""

from .flash_attention import flash_attention, reference_attention

__all__ = ['flash_attention', 'reference_attention']
