"""Minimal functional NN building blocks over plain pytrees.

Initialization matches the reference's ``init_weights`` (xavier-uniform
weights, bias 0.01 for Linear and Conv1d — audio_exp_nerf.py:442-448) so
training dynamics are comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, dtype=jnp.float32):
    """shape (in, out) for dense, (out_ch, in_ch, k) for conv1d."""
    if len(shape) == 2:
        fan_in, fan_out = shape
    elif len(shape) == 3:
        out_ch, in_ch, k = shape
        fan_in, fan_out = in_ch * k, out_ch * k
    else:
        raise ValueError(f"unsupported shape {shape}")
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def init_dense(key, d_in: int, d_out: int, dtype=jnp.float32):
    return {
        "w": xavier_uniform(key, (d_in, d_out), dtype),
        "b": jnp.full((d_out,), 0.01, dtype),
    }


def dense(p, x):
    return x @ p["w"] + p["b"]


def leaky_relu(x, negative_slope: float = 0.02):
    return jnp.where(x >= 0, x, negative_slope * x)


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    return {
        "w": xavier_uniform(key, (out_ch, in_ch, kernel), dtype),
        "b": jnp.full((out_ch,), 0.01, dtype),
    }


def conv1d(p, x, stride: int = 1, padding: int = 1):
    """x (N, C_in, L) -> (N, C_out, L_out), torch Conv1d semantics."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["b"][None, :, None]
