"""Attention aggregation modules (reference: models/self_attention.py,
models/attsets.py, models/slot_attention.py).

- SelfAttention: single-head QKV with residual output projection.
  Faithful to the reference *including* its quirk of applying the 1/√d
  scale AFTER the softmax (self_attention.py:25) — a linear output scale,
  reproduced for functional parity.
- AttentionSets: AttSets-style masked-softmax pooling over the view axis.
  The reference's final ``dense_layer_4 = Linear(1, L)`` applied to a
  (B, 1, L) tensor is shape-inconsistent and would crash in torch
  (attsets.py:28-47 — its own __main__ also calls forward with the wrong
  arity); here the final projection is the intended Linear(L, L) on the
  pooled vector.
- SlotAttention: GRU-updated slots over per-point multi-view features
  (3 iterations), with the dense encoder + dense7 projection front-end
  (slot_attention.py:27-91). Slot init draws from N(mean(mu), std(sigma))
  per call — a PRNG key argument here. Not wired into any reference
  trainer (inventory-complete aggregation module).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from idealnerf_tpu.models.nn import dense, init_dense, leaky_relu


# ------------------------------------------------------------ SelfAttention

def init_self_attention(key, input_ch: int, attn_output_ch: int = 256,
                        dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], input_ch, attn_output_ch, dtype),
        "k": init_dense(ks[1], input_ch, attn_output_ch, dtype),
        "v": init_dense(ks[2], input_ch, attn_output_ch, dtype),
        "out": init_dense(ks[3], attn_output_ch, input_ch, dtype),
    }


def apply_self_attention(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (N, input_ch) -> (N, input_ch); residual QKV attention with the
    reference's post-softmax scaling."""
    q = dense(params["q"], x)
    k = dense(params["k"], x)
    v = dense(params["v"], x)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], x.dtype))
    attn = jax.nn.softmax(q @ k.T, axis=-1) * scale
    return dense(params["out"], attn @ v) + x


# ------------------------------------------------------------ AttentionSets

def init_attsets(key, input_ch: int, W: int = 256,
                 attention_output_length: int = 512, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 6)
    return {
        "d1": init_dense(ks[0], input_ch, W, dtype),
        "d2": init_dense(ks[1], W, W, dtype),
        "d3": init_dense(ks[2], W, W, dtype),
        "d4": init_dense(ks[3], W + input_ch, attention_output_length, dtype),
        "d5": init_dense(ks[4], attention_output_length, attention_output_length, dtype),
        "d6": init_dense(ks[5], attention_output_length, attention_output_length, dtype),
    }


def apply_attsets(params: Dict, inputs: jnp.ndarray) -> jnp.ndarray:
    """inputs (B, N_views, C) -> (B, attention_output_length): learned
    softmax mask over the view axis, weighted sum, output projection."""
    x = inputs
    for name in ("d1", "d2", "d3"):
        x = jax.nn.relu(dense(params[name], x))
    x = jnp.concatenate([x, inputs], axis=-1)
    x = leaky_relu(dense(params["d4"], x), 0.01)
    mask = jax.nn.softmax(dense(params["d5"], x), axis=1)
    pooled = jnp.sum(x * mask, axis=1)
    return dense(params["d6"], pooled)


# ------------------------------------------------------------ SlotAttention

def init_slot_attention(key, dim: int, input_ch: int, embed_ch: int,
                        dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 14)
    dense_dims = [(input_ch, 64), (64, 32), (32, 32), (32, 32), (32, 32), (32, 32)]
    return {
        "slots_mu": jax.random.normal(ks[0], (1, 1, dim), dtype),
        "slots_sigma": jax.random.normal(ks[1], (1, 1, dim), dtype),
        "dense": [init_dense(ks[2 + i], a, b, dtype) for i, (a, b) in enumerate(dense_dims)],
        "dense7": init_dense(ks[8], input_ch + embed_ch + 32, dim, dtype),
        "q": init_dense(ks[9], dim, dim, dtype),
        "k": init_dense(ks[10], dim, dim, dtype),
        "v": init_dense(ks[11], dim, dim, dtype),
        "mlp1": init_dense(ks[12], dim, dim, dtype),
        "mlp2": init_dense(ks[13], dim, dim, dtype),
        # GRU cell (dim -> dim), torch GRUCell layout: r, z, n gates
        "gru": {
            "wi": jax.random.normal(jax.random.fold_in(key, 99), (dim, 3 * dim), dtype)
            * (1.0 / jnp.sqrt(dim)),
            "wh": jax.random.normal(jax.random.fold_in(key, 98), (dim, 3 * dim), dtype)
            * (1.0 / jnp.sqrt(dim)),
            "bi": jnp.zeros((3 * dim,), dtype),
            "bh": jnp.zeros((3 * dim,), dtype),
        },
        # LayerNorm scales/offsets
        "ln_input": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "ln_slots": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "ln_pre_ff": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
    }


def _layernorm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _gru_cell(p, x, h):
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1.0 - z) * n + z * h


def apply_slot_attention(
    params: Dict,
    inputs: jnp.ndarray,     # (B, N, input_ch) per-point multi-view features
    embed_pts: jnp.ndarray,  # (B, N, embed_ch)
    num_slots: int,
    key,
    iters: int = 3,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """-> (B, num_slots * dim) concatenated slot states."""
    x = inputs
    for layer in params["dense"]:
        x = dense(layer, x)  # reference applies no activations here
    x = jnp.concatenate([inputs, embed_pts, x], axis=-1)
    x = dense(params["dense7"], x)

    batch, n, dim = x.shape
    scale = dim ** -0.5
    mu_mean = jnp.mean(params["slots_mu"])
    sigma_std = jnp.std(params["slots_sigma"])
    slots = mu_mean + sigma_std * jax.random.normal(
        key, (batch, num_slots, dim), x.dtype
    )

    x = _layernorm(params["ln_input"], x)
    k = dense(params["k"], x)
    v = dense(params["v"], x)

    for _ in range(iters):
        slots_prev = slots
        q = dense(params["q"], _layernorm(params["ln_slots"], slots))
        dots = jnp.einsum("bid,bjd->bij", q, k) * scale
        attn = jax.nn.softmax(dots, axis=1) + eps
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        updates = jnp.einsum("bjd,bij->bid", v, attn)
        slots = _gru_cell(
            params["gru"],
            updates.reshape(-1, dim),
            slots_prev.reshape(-1, dim),
        ).reshape(batch, num_slots, dim)
        mlp = dense(params["mlp2"], dense(params["mlp1"],
                    _layernorm(params["ln_pre_ff"], slots)))
        slots = slots + mlp

    return slots.reshape(batch, num_slots * dim)
