"""Native JAX VGG16 / VGGFace feature networks (reference:
loss/vgg_loss.py:10-77 VGG16 relu1_2..relu4_3; loss/vgg_face_loss.py:8-81
VGGFace relu1_1/2_1/3_1/4_1/5_1 with asymmetric ceil-mode pooling).

Unlike losses/perceptual.make_vgg16_features (a torch-backed extractor,
non-differentiable), these are jittable, differentiable JAX programs —
usable inside second-stage training losses end-to-end. Weight converters
map torch state dicts (torchvision vgg16.features / vgg_face.pth) to the
NHWC/HWIO pytrees used here; random-init builders keep everything
testable without downloadable weights (zero-egress environment).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices and channels (vgg_loss.py:13-25
# slices [0,4) [4,9) [9,16) [16,23) → relu1_2, relu2_2, relu3_3, relu4_3)
_VGG16_CFG = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
              (10, 128, 256), (12, 256, 256), (14, 256, 256),
              (17, 256, 512), (19, 512, 512), (21, 512, 512)]
_VGG16_POOL_AFTER = {2, 7, 14}       # pool follows these conv indices
_VGG16_TAPS = {2: 0, 7: 1, 14: 2, 21: 3}

# VGGFace conv names in layer order with (in, out); taps after the FIRST
# conv of each block (vgg_face_loss.py:24-82)
_VGGFACE_CFG = [("conv1_1", 3, 64), ("conv1_2", 64, 64),
                ("conv2_1", 64, 128), ("conv2_2", 128, 128),
                ("conv3_1", 128, 256), ("conv3_2", 256, 256),
                ("conv3_3", 256, 256),
                ("conv4_1", 256, 512), ("conv4_2", 512, 512),
                ("conv4_3", 512, 512), ("conv5_1", 512, 512)]
_VGGFACE_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3", "conv4_3"}
_VGGFACE_TAPS = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")


def _conv(x, w, b):
    """3x3 same conv, NHWC x HWIO."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x, ceil_pad: bool):
    """2x2/2 max pool; ceil_pad adds the reference VGGFace's right/bottom
    -inf padding (vgg_face_loss.py:33 F.pad value=-inf) — a no-op for
    even sizes, one extra output row/col for odd."""
    pad = ((0, 0), (0, 1), (0, 1), (0, 0)) if ceil_pad else ((0, 0),) * 4
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), pad)


def _he_conv(key, cin, cout):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32)
    return {"w": w * np.sqrt(2.0 / (9 * cin)), "b": jnp.zeros((cout,))}


# ------------------------------------------------------------------ VGG16


def init_vgg16(key) -> Dict:
    ks = jax.random.split(key, len(_VGG16_CFG))
    return {str(i): _he_conv(k, cin, cout)
            for k, (i, cin, cout) in zip(ks, _VGG16_CFG)}


def vgg16_params_from_torch(state_dict) -> Dict:
    """torchvision ``vgg16().features.state_dict()`` (or the full model's
    ``features.*``-prefixed dict) -> params pytree."""
    params = {}
    for i, _, _ in _VGG16_CFG:
        for full in (f"{i}.weight", f"features.{i}.weight"):
            if full in state_dict:
                w = np.asarray(state_dict[full])
                b = np.asarray(state_dict[full.replace("weight", "bias")])
                params[str(i)] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                                  "b": jnp.asarray(b)}
                break
        else:
            raise KeyError(f"missing conv {i} in state dict")
    return params


def vgg16_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """(B, H, W, 3) in [-1, 1] -> [relu1_2, relu2_2, relu3_3, relu4_3]
    (vgg_loss.py:30-46, incl. the X = 0.5(X+1) input mapping :34)."""
    x = 0.5 * (x + 1.0)
    taps = []
    for i, _, _ in _VGG16_CFG:
        p = params[str(i)]
        x = jax.nn.relu(_conv(x, p["w"], p["b"]))
        if i in _VGG16_TAPS:
            taps.append(x)
        if i in _VGG16_POOL_AFTER:
            x = _maxpool(x, ceil_pad=False)
    return taps


# ---------------------------------------------------------------- VGGFace


def init_vggface(key) -> Dict:
    ks = jax.random.split(key, len(_VGGFACE_CFG))
    return {name: _he_conv(k, cin, cout)
            for k, (name, cin, cout) in zip(ks, _VGGFACE_CFG)}


def vggface_params_from_torch(state_dict) -> Dict:
    """loss/vgg_face.pth-style state dict {conv1_1.weight, ...} ->
    params pytree (extra keys like fc layers are ignored, matching the
    reference's strict=False load — vgg_face_loss.py:89)."""
    params = {}
    for name, _, _ in _VGGFACE_CFG:
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        params[name] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "b": jnp.asarray(b)}
    return params


def vggface_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """(B, H, W, 3) -> [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1]
    (vgg_face_loss.py:24-82; ceil-mode pools via -inf edge pad)."""
    taps = []
    for name, _, _ in _VGGFACE_CFG:
        p = params[name]
        x = jax.nn.relu(_conv(x, p["w"], p["b"]))
        if name in _VGGFACE_TAPS:
            taps.append(x)
        if name in _VGGFACE_POOL_AFTER:
            x = _maxpool(x, ceil_pad=True)
    return taps


# ------------------------------------------------------------------ losses


def make_vgg16_loss(params: Dict):
    """VGGLOSS (vgg_loss.py:56-77): mean-MSE over the four relu taps.
    Differentiable; call with (B, H, W, 3) images in [-1, 1]."""
    def loss(fake, target):
        ff = vgg16_features(params, fake)
        ft = vgg16_features(params, jax.lax.stop_gradient(target))
        return sum(jnp.mean((a - b) ** 2) for a, b in zip(ff, ft))
    return loss


def make_vggface_loss(params: Dict):
    """VGGFaceLoss (vgg_face_loss.py:91-100): summed L1 over five taps."""
    def loss(fake, target):
        ff = vggface_features(params, fake)
        ft = vggface_features(params, jax.lax.stop_gradient(target))
        return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(ff, ft))
    return loss


def load_vggface(path: str) -> Dict:
    """Load loss/vgg_face.pth (torch serialized) when available."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return vggface_params_from_torch({k: v.numpy() for k, v in sd.items()
                                      if hasattr(v, "numpy")})
