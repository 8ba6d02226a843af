"""Pallas TPU kernels for the hot paths."""

from idealnerf_tpu.kernels.fused_mlp import fused_point_mlp
