"""Operational tools: pretrained-artifact verification, conversion helpers."""
