"""Int8 post-training quantization of the FaceNeRF trunk.

v5e's int8 MXU peak is 2x bf16, and kdiag4 measured the production
kernel at 77% of the bf16 platform ceiling — so quantizing the trunk
chain (>90% of eval flops) is the one kernel-side lever left that can
beat the measured ceiling (ROADMAP.md "Performance" #1).

Scheme (standard symmetric-weight / affine-activation PTQ):

  * weights: symmetric int8, per-output-channel scales
    ``w_q[:, c] = round(w[:, c] / s_w[c])``.
  * pe input: symmetric int8, one scalar scale (sin lanes are in [-1,1],
    identity lanes are scene-bounded; calibrated abs-max).
  * hidden activations: relu outputs are non-negative, so a symmetric
    int8 grid wastes half its levels. We use an affine grid with a fixed
    zero point of -128: ``h_q = round(h / s_h) - 128`` in [-128, 127].
    The matmul correction ``128 * s_h * colsum(w)`` is constant per
    output channel and folds into the bias — full 8-bit resolution at
    ZERO extra kernel cost.
  * accumulation: int32 (exact). K <= input_ch + width = ~576, so
    |acc| <= 127*128*576 < 2^24 — which means a float32 simulation of
    the integer matmul is BIT-EXACT to the int8 MXU. ``quant_apply_folded``
    below is therefore not an approximation of the future Pallas kernel;
    it computes exactly what the hardware will.

Only the trunk (``params["pts"]``) is quantized. The view branch and the
alpha/rgb heads stay in the compute dtype: they are a small flop
fraction and the density head feeds ``exp``-sensitive compositing.

Reference parity note: the reference has no quantized path (pure fp32
CUDA, NeRFs/HeadNeRF/models/face_nerf.py); this is a TPU-native
extension measured against the same quality gates as every other fast
mode (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from idealnerf_tpu.core.embedding import positional_encoding
from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, fold_conditioning,
)


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Calibrated activation scales for the trunk chain.

    s_pe: scalar scale of the PE input (symmetric).
    s_h:  per-layer scalar scales of each hidden input h -> layer i,
          i = 1..depth-1 (affine, zero point -128).
    """

    s_pe: float
    s_h: List[float]


def _colmax(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8)


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8. Returns (w_q int8, s_w (C,))."""
    s_w = _colmax(w.astype(jnp.float32)) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127)
    return w_q.astype(jnp.int8), s_w


def calibrate(
    params: Dict,
    cfg: FaceNeRFConfig,
    folded: Dict,
    pe_pts: jnp.ndarray,
    pct: float = 99.9,
) -> QuantSpec:
    """Run the exact trunk on a calibration batch, record input ranges.

    ``pct`` clips activation outliers (abs-max is brittle: one hot unit
    would stretch the grid for everyone). pe uses true abs-max — its
    identity lanes are coordinates and must not clip.
    """
    pe, in_all = cfg.input_ch, cfg.input_ch_all
    pe_pts = pe_pts.astype(jnp.float32)
    s_pe = float(jnp.max(jnp.abs(pe_pts))) / 127.0

    s_h: List[float] = []
    h = jax.nn.relu(pe_pts @ params["pts"][0]["w"][:pe, :].astype(jnp.float32)
                    + folded["b_pts"][0].astype(jnp.float32))
    for i in range(1, cfg.depth):
        s_h.append(float(jnp.percentile(h, pct)) / 255.0)
        layer, b = params["pts"][i], folded["b_pts"][i]
        w = layer["w"].astype(jnp.float32)
        if (i - 1) in cfg.skips:
            h = jax.nn.relu(pe_pts @ w[:pe, :] + h @ w[in_all:, :]
                            + b.astype(jnp.float32))
        else:
            h = jax.nn.relu(h @ w + b.astype(jnp.float32))
    return QuantSpec(s_pe=s_pe, s_h=s_h)


def quantize_trunk(params: Dict, cfg: FaceNeRFConfig, spec: QuantSpec) -> Dict:
    """Pre-quantize trunk weights + fold all static scale algebra.

    Returns qparams = {"w0", "g0", "layers": [...]} where every entry is
    exactly what an int8 Pallas kernel will consume:
      w*  int8 weights
      g*  f32 per-output-channel 'gain' = s_in * s_w (the single
          per-channel multiply after the int32 accumulate)
      zb* f32 per-channel bias correction for the -128 zero point
          (128 * s_in * colsum(w_q)) — added to the layer bias.
    """
    pe, in_all = cfg.input_ch, cfg.input_ch_all
    w0_q, s_w0 = quantize_weight(params["pts"][0]["w"][:pe, :])
    out = {"w0": w0_q, "g0": spec.s_pe * s_w0, "layers": []}
    for i in range(1, cfg.depth):
        w = params["pts"][i]["w"]
        s_in = spec.s_h[i - 1]
        if (i - 1) in cfg.skips:
            wpe_q, s_wpe = quantize_weight(w[:pe, :])
            wh_q, s_wh = quantize_weight(w[in_all:, :])
            entry = {
                "w_pe": wpe_q, "g_pe": spec.s_pe * s_wpe,
                "w": wh_q, "g": s_in * s_wh,
                "zb": 128.0 * s_in * s_wh
                      * jnp.sum(wh_q.astype(jnp.float32), axis=0),
            }
        else:
            wh_q, s_wh = quantize_weight(w)
            entry = {
                "w": wh_q, "g": s_in * s_wh,
                "zb": 128.0 * s_in * s_wh
                      * jnp.sum(wh_q.astype(jnp.float32), axis=0),
            }
        out["layers"].append(entry)
    return out


def _q_sym(x: jnp.ndarray, s: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / s), -127, 127)


def _q_aff(x: jnp.ndarray, s: float) -> jnp.ndarray:
    # relu input: x >= 0; zero point -128 uses the full signed grid
    return jnp.clip(jnp.round(x / s), 0, 255) - 128.0


def quant_apply_folded(
    params: Dict,
    qparams: Dict,
    spec: QuantSpec,
    folded: Dict,
    cfg: FaceNeRFConfig,
    pe_pts: jnp.ndarray,
    pe_dirs: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """``apply_folded`` with the trunk in (bit-exact simulated) int8.

    Float ops here stand for integer ops the hardware will run: inputs
    to each matmul are integer-valued f32 in [-128, 127], accumulation
    is exact (see module docstring), and the per-channel gain + zero-
    point bias algebra matches quantize_trunk's folded constants.
    """
    pe, _ = cfg.input_ch, cfg.input_ch_all
    f32 = jnp.float32
    pe_pts = pe_pts.astype(f32)
    pe_q = _q_sym(pe_pts, spec.s_pe)

    acc = (pe_q @ qparams["w0"].astype(f32)) * qparams["g0"]
    h = jax.nn.relu(acc + folded["b_pts"][0].astype(f32))
    for i in range(1, cfg.depth):
        ent = qparams["layers"][i - 1]
        b = folded["b_pts"][i].astype(f32)
        h_q = _q_aff(h, spec.s_h[i - 1])
        acc = (h_q @ ent["w"].astype(f32)) * ent["g"] + ent["zb"]
        if (i - 1) in cfg.skips:
            acc = acc + (pe_q @ ent["w_pe"].astype(f32)) * ent["g_pe"]
        h = jax.nn.relu(acc + b)

    # view branch + heads: exact (small flop fraction; exp-sensitive)
    if not cfg.use_viewdirs:
        return h @ params["output"]["w"].astype(f32) \
            + params["output"]["b"].astype(f32)
    alpha = h @ params["alpha"]["w"].astype(f32) \
        + params["alpha"]["b"].astype(f32)
    wv0 = params["views"][0]["w"].astype(f32)
    hv = jax.nn.relu(
        h @ wv0[: cfg.width, :]
        + pe_dirs.astype(f32) @ wv0[cfg.width : cfg.width + cfg.input_ch_views, :]
        + folded["b_view0"].astype(f32)
    )
    for layer in params["views"][1:]:
        hv = jax.nn.relu(hv @ layer["w"].astype(f32) + layer["b"].astype(f32))
    rgb = hv @ params["rgb"]["w"].astype(f32) + params["rgb"]["b"].astype(f32)
    return jnp.concatenate([rgb, alpha], axis=-1)


def make_quant_field_fn(
    params: Dict,
    cfg: FaceNeRFConfig,
    spec: QuantSpec,
    qparams: Optional[Dict] = None,
    aud=None,
    expr=None,
    latent=None,
):
    """Quantized-trunk twin of models.face_nerf.make_field_fn (XLA path)."""
    if qparams is None:
        qparams = quantize_trunk(params, cfg, spec)
    folded = fold_conditioning(params, cfg, aud, expr, latent)

    def field_fn(pts, viewdirs):
        R, S, _ = pts.shape
        flat = pts.reshape(R * S, 3)
        pe_pts = positional_encoding(flat, cfg.multires)
        pe_dirs = None
        if cfg.use_viewdirs:
            dirs = jnp.broadcast_to(
                viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
            pe_dirs = positional_encoding(dirs, cfg.multires_views)
        raw = quant_apply_folded(
            params, qparams, spec, folded, cfg, pe_pts, pe_dirs)
        return raw.reshape(R, S, 4).astype(jnp.float32)

    return field_fn
