"""Pallas TPU kernels for the hottest point ops (FPS, ball query)."""
