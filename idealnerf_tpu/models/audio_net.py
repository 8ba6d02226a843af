"""Audio conditioning encoders (reference: models/audio_net.py).

- AudioNet: per-frame encoder over the centered win_size slice of a
  (16, 29) DeepSpeech window — 4× strided Conv1d 29→32→32→64→64 then a
  2-layer FC to dim_aud (audio_net.py:43-69).
- AudioAttNet: temporal-attention smoothing over a seq_len=8 window of
  AudioNet features (audio_net.py:8-36), activated after nosmo_iters.
- DeepSpeechAudNet: raw 29-dim conditioning via Linear(16→1) collapse
  (audio_net.py:72-87), the dim_aud<=29 ablation path.

All LeakyReLU slopes are 0.02 as in the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from idealnerf_tpu.models.nn import conv1d, dense, init_conv1d, init_dense, leaky_relu


# ---------------------------------------------------------------- AudioNet

def init_audio_net(key, dim_aud: int = 64, win_size: int = 16, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 6)
    return {
        "conv": [
            init_conv1d(ks[0], 29, 32, 3, dtype),
            init_conv1d(ks[1], 32, 32, 3, dtype),
            init_conv1d(ks[2], 32, 64, 3, dtype),
            init_conv1d(ks[3], 64, 64, 3, dtype),
        ],
        "fc": [init_dense(ks[4], 64, 64, dtype), init_dense(ks[5], 64, dim_aud, dtype)],
    }


def apply_audio_net(params: Dict, x: jnp.ndarray, win_size: int = 16) -> jnp.ndarray:
    """x (N, 16, 29) DeepSpeech windows -> (N, dim_aud) features.

    Slices the centered win_size frames then permutes to channels-first,
    matching audio_net.py:64-69 (which also squeezes N==1 — we keep N).
    """
    half_w = win_size // 2
    x = x[:, 8 - half_w : 8 + half_w, :]           # (N, win, 29)
    x = jnp.transpose(x, (0, 2, 1))                # (N, 29, win)
    for conv in params["conv"]:
        x = leaky_relu(conv1d(conv, x, stride=2, padding=1))
    x = x[:, :, 0]                                 # (N, 64) after win 16→8→4→2→1
    x = leaky_relu(dense(params["fc"][0], x))
    return dense(params["fc"][1], x)


# ------------------------------------------------------------- AudioAttNet

def init_audio_att_net(key, dim_aud: int = 32, seq_len: int = 8, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 6)
    chans = [dim_aud, 16, 8, 4, 2, 1]
    return {
        "conv": [
            init_conv1d(ks[i], chans[i], chans[i + 1], 3, dtype) for i in range(5)
        ],
        "att": init_dense(ks[5], seq_len, seq_len, dtype),
    }


def apply_audio_att_net(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (seq_len, dim) -> (dim,) attention-weighted sum over the window.

    Only the first dim_aud channels feed the attention net; the weighted
    sum runs over the full input (audio_net.py:32-36). dim_aud/seq_len are
    recovered from the param shapes (params are a pure pytree — no static
    leaves, so the whole tree is optax/pjit friendly).
    """
    dim_aud = params["conv"][0]["w"].shape[1]
    seq_len = params["att"]["w"].shape[0]
    y = jnp.transpose(x[:, :dim_aud])[None]        # (1, dim_aud, seq_len)
    for conv in params["conv"]:
        y = leaky_relu(conv1d(conv, y, stride=1, padding=1))
    logits = dense(params["att"], y.reshape(1, seq_len))
    w = jax.nn.softmax(logits, axis=1).reshape(seq_len, 1)
    return jnp.sum(w * x, axis=0)


# --------------------------------------------------------- DeepSpeechAudNet

def init_ds_aud_net(key, win_size: int = 16, dtype=jnp.float32) -> Dict:
    return {"fc": init_dense(key, win_size, 1, dtype)}


def apply_ds_aud_net(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (N, 16, 29) -> (N, 29): Linear(16→1) collapse over the window."""
    x = jnp.transpose(x, (0, 2, 1))                # (N, 29, 16)
    return leaky_relu(dense(params["fc"], x))[..., 0]


# ------------------------------------------------- smoothing window gather

def gather_aud_window(auds: jnp.ndarray, index, smo_size: int = 8) -> jnp.ndarray:
    """Zero-padded window auds[index-smo/2 : index+smo/2] of shape
    (smo_size, 16, 29), matching the boundary padding in
    audio_exp_nerf.py:246-263 — vectorized gather, shape-static for XLA.
    """
    n = auds.shape[0]
    half = smo_size // 2
    idx = index - half + jnp.arange(smo_size)
    valid = (idx >= 0) & (idx < n)
    window = auds[jnp.clip(idx, 0, n - 1)]
    return jnp.where(valid[:, None, None], window, 0.0)
