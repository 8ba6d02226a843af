"""FAN 2DFAN-4 landmark network (JAX port).

The reference vendors a FaceAlignment wrapper that torch.jit.loads the
2DFAN-4 TorchScript archive at runtime (loss/landmark_loss.py:42-110) and
uses it two ways: offline landmark detection for the pipeline
(data_util/process_data.py:104-123) and as the differentiable heatmap
network inside LandmarkLoss (landmark_loss.py:142-161). This is the
network itself — the stacked-hourglass FAN of Bulat & Tzimiropoulos
(ICCV'17), 4 stacks, 68 heatmaps at 64×64 from a 256×256 crop.

Params are a FLAT dict keyed by the torch module names (conv1.weight,
m0.b1_4.bn1.running_mean, ...), so ``convert_torch_state_dict``
(shared with parsing_net) maps the published weights' state_dict in
mechanically. Fully differentiable — gradients flow through the heatmaps
into the rendered image, which is what makes second-stage training match
distribute_nerf.py:487-491 in effect.

Face-box protocol difference (documented deviation): the reference finds
the crop box with an s3fd face detector; here the box comes from the
data we already have (parse maps / face_rect / landmarks), since the
detector's only job is to locate the face once.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.pipeline.parsing_net import convert_torch_state_dict  # noqa: F401 (re-export)

N_LANDMARKS = 68
HEATMAP_SIZE = 64
CROP_SIZE = 256
NUM_MODULES = 4
HG_DEPTH = 4


def _conv(params, name, x, stride=1, pad=0):
    w = params[f"{name}.weight"]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if f"{name}.bias" in params:
        y = y + params[f"{name}.bias"][None, :, None, None]
    return y


def _bn(params, name, x, eps=1e-5):
    gamma = params[f"{name}.weight"][None, :, None, None]
    beta = params[f"{name}.bias"][None, :, None, None]
    mean = params[f"{name}.running_mean"][None, :, None, None]
    var = params[f"{name}.running_var"][None, :, None, None]
    return gamma * (x - mean) * jax.lax.rsqrt(var + eps) + beta


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) * 0.25


def _upsample2_nearest(x):
    B, C, H, W = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def _conv_block(params, name, x):
    """Pre-activation 3-way ConvBlock: out = cat(c1, c2, c3) (+ residual,
    1×1-downsampled when channel counts differ)."""
    out1 = _conv(params, f"{name}.conv1",
                 jax.nn.relu(_bn(params, f"{name}.bn1", x)), 1, 1)
    out2 = _conv(params, f"{name}.conv2",
                 jax.nn.relu(_bn(params, f"{name}.bn2", out1)), 1, 1)
    out3 = _conv(params, f"{name}.conv3",
                 jax.nn.relu(_bn(params, f"{name}.bn3", out2)), 1, 1)
    out = jnp.concatenate([out1, out2, out3], axis=1)
    if f"{name}.downsample.2.weight" in params:
        residual = _conv(params, f"{name}.downsample.2",
                         jax.nn.relu(_bn(params, f"{name}.downsample.0", x)),
                         1, 0)
    else:
        residual = x
    return out + residual


def _hourglass(params, name, x, level=HG_DEPTH):
    up1 = _conv_block(params, f"{name}.b1_{level}", x)
    low1 = _conv_block(params, f"{name}.b2_{level}", _avg_pool2(x))
    if level > 1:
        low2 = _hourglass(params, name, low1, level - 1)
    else:
        low2 = _conv_block(params, f"{name}.b2_plus_{level}", low1)
    low3 = _conv_block(params, f"{name}.b3_{level}", low2)
    return up1 + _upsample2_nearest(low3)


def apply_fan(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    """x (B, 3, 256, 256) in [0,1] -> list of NUM_MODULES heatmap stacks,
    each (B, 68, 64, 64). Differentiable end to end."""
    x = jax.nn.relu(_bn(params, "bn1", _conv(params, "conv1", x, 2, 3)))
    x = _avg_pool2(_conv_block(params, "conv2", x))
    x = _conv_block(params, "conv3", x)
    x = _conv_block(params, "conv4", x)

    previous = x
    outputs = []
    for i in range(NUM_MODULES):
        hg = _hourglass(params, f"m{i}", previous)
        ll = _conv_block(params, f"top_m_{i}", hg)
        ll = jax.nn.relu(_bn(params, f"bn_end{i}",
                             _conv(params, f"conv_last{i}", ll, 1, 0)))
        tmp_out = _conv(params, f"l{i}", ll, 1, 0)
        outputs.append(tmp_out)
        if i < NUM_MODULES - 1:
            previous = (previous + _conv(params, f"bl{i}", ll, 1, 0)
                        + _conv(params, f"al{i}", tmp_out, 1, 0))
    return outputs


def heatmaps_to_landmarks(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(B, 68, 64, 64) -> (B, 68, 2) (x, y) in heatmap pixels, with the
    face_alignment +/-0.25 sub-pixel shift toward the stronger neighbor
    (get_preds_fromhm semantics)."""
    B, L, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, L, H * W)
    idx = jnp.argmax(flat, axis=-1)
    y = idx // W
    x = idx % W
    xr = jnp.clip(x + 1, 0, W - 1)
    xl = jnp.clip(x - 1, 0, W - 1)
    yu = jnp.clip(y + 1, 0, H - 1)
    yd = jnp.clip(y - 1, 0, H - 1)

    def at(hm, yy, xx):
        return jnp.take_along_axis(
            hm.reshape(B, L, H * W), (yy * W + xx)[..., None], axis=-1
        )[..., 0]

    dx = at(heatmaps, y, xr) - at(heatmaps, y, xl)
    dy = at(heatmaps, yu, x) - at(heatmaps, yd, x)
    fx = x.astype(jnp.float32) + 0.25 * jnp.sign(dx)
    fy = y.astype(jnp.float32) + 0.25 * jnp.sign(dy)
    return jnp.stack([fx, fy], axis=-1)


def soft_landmarks(heatmaps: jnp.ndarray, temperature: float = 10.0) -> jnp.ndarray:
    """Differentiable soft-argmax landmarks (B, 68, 2) in heatmap pixels —
    for losses that need landmark coordinates with gradients (the
    reference only L1s heatmaps; this is an extra capability)."""
    B, L, H, W = heatmaps.shape
    p = jax.nn.softmax(heatmaps.reshape(B, L, H * W) * temperature, axis=-1)
    p = p.reshape(B, L, H, W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    fy = jnp.sum(p.sum(axis=3) * ys, axis=-1)
    fx = jnp.sum(p.sum(axis=2) * xs, axis=-1)
    return jnp.stack([fx, fy], axis=-1)


def detect_landmarks(
    params: Dict[str, jnp.ndarray],
    image: np.ndarray,
    box: np.ndarray,
) -> np.ndarray:
    """Offline detection (process_data.py:104-123 counterpart): crop the
    face ``box`` [x0, y0, x1, y1] to 256², run FAN, map landmarks back to
    image pixels. Returns (68, 2) float (x, y) — the .lms format."""
    x0, y0, x1, y1 = [int(v) for v in box]
    x0, y0 = max(x0, 0), max(y0, 0)
    x1 = min(x1, image.shape[1])
    y1 = min(y1, image.shape[0])
    crop = image[y0:y1, x0:x1].astype(np.float32) / 255.0
    crop = jax.image.resize(jnp.asarray(crop), (CROP_SIZE, CROP_SIZE, 3),
                            "linear")
    inp = jnp.transpose(crop, (2, 0, 1))[None]
    hm = apply_fan(params, inp)[-1]
    lms = np.asarray(heatmaps_to_landmarks(hm))[0]  # (68, 2) in 64-grid
    scale_x = (x1 - x0) / HEATMAP_SIZE
    scale_y = (y1 - y0) / HEATMAP_SIZE
    return np.stack(
        [lms[:, 0] * scale_x + x0, lms[:, 1] * scale_y + y0], axis=-1
    )


def make_heatmap_detector(params: Dict[str, jnp.ndarray]):
    """losses.landmark.LandmarkLoss detector: (H, W, 3) float [0,1] ->
    (68, 64, 64) final-stack heatmaps. jit/grad-traceable."""

    def detector(image):
        img = jax.image.resize(image, (CROP_SIZE, CROP_SIZE, 3), "linear")
        inp = jnp.transpose(img, (2, 0, 1))[None]
        return apply_fan(params, inp)[-1][0]

    return detector


def init_fan(key, num_modules: int = NUM_MODULES) -> Dict[str, np.ndarray]:
    """Random params with the exact 2DFAN-4 state-dict structure."""
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    params: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k, bias=True):
        fan = cin * k * k
        params[f"{name}.weight"] = (
            rng.randn(cout, cin, k, k).astype(np.float32) * (2.0 / fan) ** 0.5
        )
        if bias:
            params[f"{name}.bias"] = np.zeros(cout, np.float32)

    def bn(name, c):
        params[f"{name}.weight"] = np.abs(rng.randn(c).astype(np.float32)) + 0.5
        params[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        params[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        params[f"{name}.running_var"] = (
            np.abs(rng.randn(c).astype(np.float32)) + 0.5
        )

    def conv_block(name, cin, cout):
        bn(f"{name}.bn1", cin)
        conv(f"{name}.conv1", cin, cout // 2, 3, bias=False)
        bn(f"{name}.bn2", cout // 2)
        conv(f"{name}.conv2", cout // 2, cout // 4, 3, bias=False)
        bn(f"{name}.bn3", cout // 4)
        conv(f"{name}.conv3", cout // 4, cout // 4, 3, bias=False)
        if cin != cout:
            bn(f"{name}.downsample.0", cin)
            conv(f"{name}.downsample.2", cin, cout, 1, bias=False)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    conv_block("conv2", 64, 128)
    conv_block("conv3", 128, 128)
    conv_block("conv4", 128, 256)
    for i in range(num_modules):
        for level in range(HG_DEPTH, 0, -1):
            conv_block(f"m{i}.b1_{level}", 256, 256)
            conv_block(f"m{i}.b2_{level}", 256, 256)
            if level == 1:
                conv_block(f"m{i}.b2_plus_{level}", 256, 256)
            conv_block(f"m{i}.b3_{level}", 256, 256)
        conv_block(f"top_m_{i}", 256, 256)
        conv(f"conv_last{i}", 256, 256, 1)
        bn(f"bn_end{i}", 256)
        conv(f"l{i}", 256, N_LANDMARKS, 1)
        if i < num_modules - 1:
            conv(f"bl{i}", 256, 256, 1)
            conv(f"al{i}", N_LANDMARKS, 256, 1)
    return params
