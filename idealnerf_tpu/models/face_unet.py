"""FaceUNetCNN — 4-down/4-up conv UNet over the PE-embedded full image,
producing a (128 + embed_ln)-channel feature map for per-point gathering
(reference: models/face_unet.py:14-58; used by the GRF-style
unet_att_nerf path).

Spatial arithmetic parity with the torch modules: encoder Conv2d(k7 s2
p2) then 3×Conv2d(k3 s2 p1); decoder ConvTranspose2d(k3 s2, dilation
1/2/4/8, padding=dilation, output_padding=1) with skip concats; final
replicate-pad by 1 then concat of the embedded-RGB channels. For a 450²
input the stage sizes are 224/112/56/28 up to 448 → padded 450.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp



def _init_conv2d(key, in_ch, out_ch, k, dtype=jnp.float32):
    fan_in, fan_out = in_ch * k * k, out_ch * k * k
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return {
        "w": jax.random.uniform(key, (out_ch, in_ch, k, k), dtype, -limit, limit),
        "b": jnp.full((out_ch,), 0.01, dtype),
    }


def _conv2d(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _conv_transpose2d(p, x, stride, pad, output_pad, dilation):
    """torch ConvTranspose2d semantics via a fractionally-strided conv:
    input dilated by ``stride``, kernel spatially flipped and transposed,
    padding d·(k-1)-p on the low side and d·(k-1)-p+output_pad high."""
    k = p["w"].shape[-1]
    lo = dilation * (k - 1) - pad
    hi = lo + output_pad
    w = jnp.flip(p["w"], axis=(-2, -1)).transpose(1, 0, 2, 3)  # IOHW -> OIHW
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride), rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _init_convt2d(key, in_ch, out_ch, k, dtype=jnp.float32):
    fan_in, fan_out = in_ch * k * k, out_ch * k * k
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return {
        "w": jax.random.uniform(key, (in_ch, out_ch, k, k), dtype, -limit, limit),
        "b": jnp.full((out_ch,), 0.01, dtype),
    }


def init_face_unet(key, input_ch: int, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)
    return {
        "enc": [
            _init_conv2d(ks[0], input_ch, 64, 7, dtype),
            _init_conv2d(ks[1], 64, 128, 3, dtype),
            _init_conv2d(ks[2], 128, 256, 3, dtype),
            _init_conv2d(ks[3], 256, 512, 3, dtype),
        ],
        # stored as (in, out, kh, kw) like torch ConvTranspose2d
        "dec": [
            _init_convt2d(ks[4], 512, 256, 3, dtype),
            _init_convt2d(ks[5], 512, 128, 3, dtype),
            _init_convt2d(ks[6], 256, 64, 3, dtype),
            _init_convt2d(ks[7], 128, 128, 3, dtype),
        ],
    }


def _valid_size(n: int) -> int:
    """Smallest input size >= n the stage arithmetic returns exactly.

    With the reference's strides/paddings, every encoder stage must stay
    even for the decoder skip-concats to line up, which holds iff the
    input is ``16k + 2`` (450 = 16·28 + 2 — the reference only ever runs
    that size); the decoder then lands back on exactly the input size.
    """
    return -(-(n - 2) // 16) * 16 + 2


def apply_face_unet(params: Dict, x: jnp.ndarray, embed_ln: int) -> jnp.ndarray:
    """x (B, H, W, C_embed) -> (B, 128 + embed_ln, H, W) feature map.

    The first ``embed_ln`` input channels (the embedded RGB) are carried
    through and concatenated to the decoder output (face_unet.py:43-58).
    Arbitrary H×W are handled by edge-padding the input up to the nearest
    valid stage-aligned size and cropping the feature map back — the
    reference hard-requires 450² (ROADMAP #9).
    """
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    Hp, Wp = _valid_size(H), _valid_size(W)
    embedded_rgb = jnp.transpose(x[..., :embed_ln], (0, 3, 1, 2))
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
    h = jnp.transpose(x, (0, 3, 1, 2))

    stack = []
    strides_pads = [(2, 2), (2, 1), (2, 1), (2, 1)]
    for p, (s, pad) in zip(params["enc"], strides_pads):
        h = jax.nn.relu(_conv2d(p, h, s, pad))
        stack.append(h)
    stack.pop()

    dilations = [1, 2, 4, 8]
    for p, d in zip(params["dec"], dilations):
        h = jax.nn.relu(_conv_transpose2d(p, h, 2, d, 1, d))
        if stack:
            h = jnp.concatenate([h, stack.pop()], axis=1)

    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    if (Hp, Wp) != (H, W):
        h = h[:, :, :H, :W]
    return jnp.concatenate([h, embedded_rgb], axis=1)
