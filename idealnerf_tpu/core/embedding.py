"""Sinusoidal positional encoding.

Semantics match the reference Embedder (NeRFs/HeadNeRF/helper.py:174-224):
log-sampled frequency bands 2**linspace(0, multires-1, multires), output
layout ``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]`` with the
input included first. Defaults: multires=10 for xyz (3 -> 63 channels),
multires_views=4 for directions (3 -> 27 channels).

Unlike the reference (a list of python lambdas concatenated per call), this
is a single vectorized expression XLA fuses into its consumer.
"""

from __future__ import annotations

import jax.numpy as jnp


def pe_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    """Output channel count of ``positional_encoding``."""
    if num_freqs <= 0:
        return input_dims
    return input_dims * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., d]`` into ``[..., pe_dim(d, num_freqs)]``.

    num_freqs <= 0 returns ``x`` unchanged (the reference's ``i_embed=-1``
    identity path, helper.py:207-209).
    """
    if num_freqs <= 0:
        return x
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    # (..., F, d): frequency-major, matching the reference's embed_fns order.
    xb = x[..., None, :] * freqs[:, None]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., F, 2, d)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
