"""FaceNeRF — the conditioned NeRF MLP (reference: models/face_nerf.py:8-80).

Architecture parity: D=8, W=256 trunk with a skip concat after layer 4;
input = PE(xyz) ‖ aud ‖ expr/3 ‖ latent; density head from the trunk; color
head = trunk feature ‖ PE(dir) ‖ expr/3 through 1 + D//4 half-width layers.
(The reference's ``feature_linear`` is initialized but never used in
forward — models/face_nerf.py:34 vs :64-75 — so it is not reproduced.)

TPU-native redesign — conditioning folded into biases: within a frame the
conditioning vector (aud, expr, latent) is *constant across all sample
points*, so instead of concatenating it onto every one of the ~10^5..10^7
point features (the reference broadcasts it per point,
models/face_nerf.py:44-55), we precompute, once per frame,

    b0'  = b0  + cond @ W0[pe:, :]      (trunk entry)
    b5'  = b5  + cond @ W5[pe:in_all, :]  (skip layer)
    bv0' = bv0 + expr/3 @ Wv0[W+views:, :] (color head entry)

and run an *unconditioned* point MLP with per-frame biases. This is
mathematically identical but removes the (N_pts × dim_cond) broadcast and
concat from the hot path entirely — the matmuls see only the 63-dim PE and
the 256-dim hidden state. The same folded form is what the Pallas fused
kernel consumes (kernels/fused_mlp.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from idealnerf_tpu.core.embedding import positional_encoding
from idealnerf_tpu.models.nn import init_dense


@dataclasses.dataclass(frozen=True)
class FaceNeRFConfig:
    depth: int = 8            # netdepth
    width: int = 256          # netwidth
    input_ch: int = 63        # PE(xyz), multires=10
    input_ch_views: int = 27  # PE(dir), multires_views=4
    dim_aud: int = 64
    dim_expr: int = 0
    dim_latent: int = 0
    skips: tuple = (4,)
    use_viewdirs: bool = True
    output_ch: int = 4        # only used when use_viewdirs=False
    multires: int = 10
    multires_views: int = 4
    # the fused render kernels composite in-kernel, so they must know
    # the density activation ("relu" = reference parity | "softplus");
    # the MLP itself emits raw logits either way
    density_activation: str = "relu"

    @property
    def dim_cond(self) -> int:
        return self.dim_aud + self.dim_expr + self.dim_latent

    @property
    def input_ch_all(self) -> int:
        return self.input_ch + self.dim_cond


def init_face_nerf(key, cfg: FaceNeRFConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.depth + cfg.depth // 4 + 4)
    in_all = cfg.input_ch_all
    pts = [init_dense(keys[0], in_all, cfg.width, dtype)]
    for i in range(cfg.depth - 1):
        d_in = cfg.width + in_all if i in cfg.skips else cfg.width
        pts.append(init_dense(keys[1 + i], d_in, cfg.width, dtype))

    params = {"pts": pts}
    k = cfg.depth
    if cfg.use_viewdirs:
        views = [
            init_dense(
                keys[k], cfg.input_ch_views + cfg.width + cfg.dim_expr,
                cfg.width // 2, dtype,
            )
        ]
        for i in range(cfg.depth // 4):
            views.append(init_dense(keys[k + 1 + i], cfg.width // 2, cfg.width // 2, dtype))
        params["views"] = views
        params["alpha"] = init_dense(keys[-2], cfg.width, 1, dtype)
        params["rgb"] = init_dense(keys[-1], cfg.width // 2, 3, dtype)
    else:
        params["output"] = init_dense(keys[-1], cfg.width, cfg.output_ch, dtype)
    return params


def _cond_vector(cfg: FaceNeRFConfig, aud, expr, latent, dtype):
    """Concatenated conditioning (with the reference's expr/3 scaling)."""
    parts = []
    if cfg.dim_aud > 0:
        parts.append(jnp.asarray(aud, dtype))
    if cfg.dim_expr > 0:
        parts.append(jnp.asarray(expr, dtype) / 3.0)
    if cfg.dim_latent > 0:
        parts.append(jnp.asarray(latent, dtype))
    if not parts:
        return None
    return jnp.concatenate(parts, axis=-1)


def fold_conditioning(
    params: Dict,
    cfg: FaceNeRFConfig,
    aud: Optional[jnp.ndarray] = None,
    expr: Optional[jnp.ndarray] = None,
    latent: Optional[jnp.ndarray] = None,
) -> Dict:
    """Per-frame folded biases: 2-3 tiny matvecs replacing per-point concat.

    Returns {"b_pts": [b'_0..b'_{D-1}], "b_view0": b'} where conditioned
    layers have the conditioning contribution added.
    """
    dtype = params["pts"][0]["w"].dtype
    cond = _cond_vector(cfg, aud, expr, latent, dtype)
    pe, in_all = cfg.input_ch, cfg.input_ch_all

    b_pts = []
    for i, layer in enumerate(params["pts"]):
        b = layer["b"]
        if cond is not None:
            if i == 0:
                b = b + cond @ layer["w"][pe:, :]
            elif (i - 1) in cfg.skips:
                # skip layer input order: [initial(=pe‖cond), h]
                b = b + cond @ layer["w"][pe:in_all, :]
        b_pts.append(b)

    folded = {"b_pts": b_pts}
    if cfg.use_viewdirs:
        bv = params["views"][0]["b"]
        if cfg.dim_expr > 0:
            w = params["views"][0]["w"]
            off = cfg.width + cfg.input_ch_views
            bv = bv + (jnp.asarray(expr, dtype) / 3.0) @ w[off:, :]
        folded["b_view0"] = bv
    return folded


def apply_folded(
    params: Dict,
    folded: Dict,
    cfg: FaceNeRFConfig,
    pe_pts: jnp.ndarray,
    pe_dirs: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Unconditioned point MLP with folded per-frame biases.

    pe_pts (N, input_ch), pe_dirs (N, input_ch_views) -> raw (N, 4).
    """
    pe, in_all = cfg.input_ch, cfg.input_ch_all
    h = jax.nn.relu(pe_pts @ params["pts"][0]["w"][:pe, :] + folded["b_pts"][0])
    for i in range(1, cfg.depth):
        layer, b = params["pts"][i], folded["b_pts"][i]
        if (i - 1) in cfg.skips:
            h = jax.nn.relu(
                pe_pts @ layer["w"][:pe, :] + h @ layer["w"][in_all:, :] + b
            )
        else:
            h = jax.nn.relu(h @ layer["w"] + b)

    if not cfg.use_viewdirs:
        return h @ params["output"]["w"] + params["output"]["b"]

    alpha = h @ params["alpha"]["w"] + params["alpha"]["b"]
    wv0 = params["views"][0]["w"]
    hv = jax.nn.relu(
        h @ wv0[: cfg.width, :]
        + pe_dirs @ wv0[cfg.width : cfg.width + cfg.input_ch_views, :]
        + folded["b_view0"]
    )
    for layer in params["views"][1:]:
        hv = jax.nn.relu(hv @ layer["w"] + layer["b"])
    rgb = hv @ params["rgb"]["w"] + params["rgb"]["b"]
    return jnp.concatenate([rgb, alpha], axis=-1)


def apply_point_conditioned(
    params: Dict,
    cfg: FaceNeRFConfig,
    pe_pts: jnp.ndarray,
    pe_dirs: Optional[jnp.ndarray],
    cond_pts: jnp.ndarray,
) -> jnp.ndarray:
    """Forward with PER-POINT conditioning (N, dim_aud) occupying the aud
    slot — used by the GRF/unet path where each sample point carries its
    own gathered image feature (NeRFAttentionModel's decoder input,
    nerf_attention_model.py:26-43). Bias folding does not apply here;
    this is the honest concat formulation."""
    initial = jnp.concatenate([pe_pts, cond_pts.astype(pe_pts.dtype)], axis=-1)
    h = initial
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
        if i in cfg.skips:
            h = jnp.concatenate([initial, h], axis=-1)
    if not cfg.use_viewdirs:
        return h @ params["output"]["w"] + params["output"]["b"]
    alpha = h @ params["alpha"]["w"] + params["alpha"]["b"]
    hv = jnp.concatenate([h, pe_dirs], axis=-1)
    for layer in params["views"]:
        hv = jax.nn.relu(hv @ layer["w"] + layer["b"])
    rgb = hv @ params["rgb"]["w"] + params["rgb"]["b"]
    return jnp.concatenate([rgb, alpha], axis=-1)


def apply_face_nerf(
    params: Dict,
    cfg: FaceNeRFConfig,
    pe_pts: jnp.ndarray,
    pe_dirs: Optional[jnp.ndarray] = None,
    aud: Optional[jnp.ndarray] = None,
    expr: Optional[jnp.ndarray] = None,
    latent: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference-equivalent forward (models/face_nerf.py:40-80)."""
    folded = fold_conditioning(params, cfg, aud, expr, latent)
    return apply_folded(params, folded, cfg, pe_pts, pe_dirs)


def make_field_fn(
    params: Dict,
    cfg: FaceNeRFConfig,
    aud: Optional[jnp.ndarray] = None,
    expr: Optional[jnp.ndarray] = None,
    latent: Optional[jnp.ndarray] = None,
    compute_dtype=None,
    use_pallas: bool = False,
):
    """Close params+conditioning into the renderer's field_fn signature:
    ``field_fn(pts (R, S, 3), viewdirs (R, 3)) -> raw (R, S, 4)``.
    """
    if compute_dtype is not None:
        params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
    folded = fold_conditioning(params, cfg, aud, expr, latent)

    def field_fn(pts, viewdirs):
        R, S, _ = pts.shape
        flat = pts.reshape(R * S, 3)
        if use_pallas in ("train", "train_bf16") and cfg.use_viewdirs:
            # differentiable fused path: custom-VJP kernel with a
            # rematerializing Pallas backward (kernels/fused_mlp_grad);
            # "train" = exact f32 backward, "train_bf16" = MXU-native
            from idealnerf_tpu.kernels.fused_mlp_grad import (
                TRAIN_TILE, fused_point_mlp_train,
            )

            gd = jnp.bfloat16 if use_pallas == "train_bf16" else jnp.float32
            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
            raw = fused_point_mlp_train(cfg, params, folded, flat, dirs,
                                        TRAIN_TILE, None, gd)
            return raw.reshape(R, S, 4).astype(jnp.float32)
        if use_pallas and cfg.use_viewdirs:
            # the fused kernel computes PE in-kernel — hand it raw coords
            from idealnerf_tpu.kernels.fused_mlp import fused_point_mlp

            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
            raw = fused_point_mlp(params, folded, cfg, flat, dirs)
            return raw.reshape(R, S, 4).astype(jnp.float32)
        if compute_dtype is not None:
            flat = flat.astype(compute_dtype)
        pe_pts = positional_encoding(flat, cfg.multires)
        pe_dirs = None
        if cfg.use_viewdirs:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
            if compute_dtype is not None:
                dirs = dirs.astype(compute_dtype)
            pe_dirs = positional_encoding(dirs, cfg.multires_views)
        raw = apply_folded(params, folded, cfg, pe_pts, pe_dirs)
        return raw.reshape(R, S, 4).astype(jnp.float32)

    return field_fn
