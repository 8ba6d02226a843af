"""BiSeNet face-parsing network (JAX port of the reference's vendored
architecture: data_util/face_parsing/model.py:19-270, resnet.py:23-103;
inference protocol test.py:29-109).

The reference's variant deletes the SpatialPath and feeds the ResNet18
1/8 feature in its place (model.py:240-250). 19 classes; weights
``79999_iter.pth``.

Design: the params pytree is a FLAT dict keyed by the torch state-dict
names ("cp.resnet.conv1.weight", ...), so ``convert_torch_state_dict`` is
a mechanical tensor→array pass and real checkpoint weights drop in with
zero renaming. Forward functions are pure and jit-able; BatchNorm runs in
eval mode (the pipeline only ever does inference). Bilinear upsampling
reproduces torch's ``align_corners=True`` convention exactly (jax.image
uses half-pixel, which is NOT weight-compatible behavior).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_CLASSES = 19
# ImageNet normalization (test.py:48-51)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------- ops

def _conv(params, name, x, stride=1, pad=1):
    w = params[f"{name}.weight"]
    k = w.shape[-1]
    if pad == "same_k":
        pad = (k - 1) // 2
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


def _conv_bn_relu(params, name, x, stride=1, pad=1):
    return jax.nn.relu(_bn(params, f"{name}.bn",
                           _conv(params, f"{name}.conv", x, stride, pad)))


def _max_pool_3x3_s2_p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )


def _global_avg(x):
    return jnp.mean(x, axis=(2, 3), keepdims=True)


def _interp_nearest(x, hw: Tuple[int, int]):
    """torch F.interpolate(mode='nearest'): index = floor(i*in/out)."""
    H, W = hw
    h, w = x.shape[2], x.shape[3]
    rows = jnp.floor(jnp.arange(H) * (h / H)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(W) * (w / W)).astype(jnp.int32)
    return x[:, :, rows][:, :, :, cols]


def _interp_bilinear_ac(x, hw: Tuple[int, int]):
    """torch F.interpolate(mode='bilinear', align_corners=True)."""
    H, W = hw
    h, w = x.shape[2], x.shape[3]

    def axis_coords(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return (jnp.zeros(out_n, jnp.int32), jnp.zeros(out_n, jnp.int32),
                    jnp.zeros(out_n, x.dtype))
        pos = jnp.arange(out_n, dtype=x.dtype) * ((in_n - 1) / (out_n - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 2)
        frac = pos - lo.astype(x.dtype)
        return lo, lo + 1, frac

    r0, r1, rf = axis_coords(H, h)
    c0, c1, cf = axis_coords(W, w)
    top = x[:, :, r0]
    bot = x[:, :, r1]
    xr = top + (bot - top) * rf[None, None, :, None]
    left = xr[:, :, :, c0]
    right = xr[:, :, :, c1]
    return left + (right - left) * cf[None, None, None, :]


# ------------------------------------------------------------- blocks

def _basic_block(params, name, x, stride=1):
    """Vendored BasicBlock (resnet.py:23-50): relu(bn1(conv1)), bn2(conv2),
    shortcut (optionally downsampled), relu(add)."""
    res = jax.nn.relu(_bn(params, f"{name}.bn1",
                          _conv(params, f"{name}.conv1", x, stride, 1)))
    res = _bn(params, f"{name}.bn2", _conv(params, f"{name}.conv2", res, 1, 1))
    if f"{name}.downsample.0.weight" in params:
        short = _bn(params, f"{name}.downsample.1",
                    _conv(params, f"{name}.downsample.0", x, stride, 0))
    else:
        short = x
    return jax.nn.relu(short + res)


def _resnet18(params, x):
    """(B,3,H,W) -> (feat8, feat16, feat32) (resnet.py:61-86)."""
    p = "cp.resnet"
    x = jax.nn.relu(_bn(params, f"{p}.bn1", _conv(params, f"{p}.conv1", x, 2, 3)))
    x = _max_pool_3x3_s2_p1(x)
    for blk in (0, 1):
        x = _basic_block(params, f"{p}.layer1.{blk}", x, 1)
    f8 = x
    for blk, s in ((0, 2), (1, 1)):
        f8 = _basic_block(params, f"{p}.layer2.{blk}", f8, s)
    f16 = f8
    for blk, s in ((0, 2), (1, 1)):
        f16 = _basic_block(params, f"{p}.layer3.{blk}", f16, s)
    f32 = f16
    for blk, s in ((0, 2), (1, 1)):
        f32 = _basic_block(params, f"{p}.layer4.{blk}", f32, s)
    return f8, f16, f32


def _arm(params, name, x):
    """AttentionRefinementModule (model.py:76-95)."""
    feat = _conv_bn_relu(params, f"{name}.conv", x, 1, 1)
    att = _global_avg(feat)
    att = _conv(params, f"{name}.conv_atten", att, 1, 0)
    att = jax.nn.sigmoid(_bn(params, f"{name}.bn_atten", att))
    return feat * att


def _context_path(params, x):
    """(model.py:98-130): returns (feat_res8, feat_cp8, feat_cp16)."""
    f8, f16, f32 = _resnet18(params, x)
    h16, w16 = f16.shape[2], f16.shape[3]
    h8, w8 = f8.shape[2], f8.shape[3]

    avg = _conv_bn_relu(params, "cp.conv_avg", _global_avg(f32), 1, 0)
    avg_up = jnp.broadcast_to(avg, (avg.shape[0], avg.shape[1],
                                    f32.shape[2], f32.shape[3]))
    f32_sum = _arm(params, "cp.arm32", f32) + avg_up
    f32_up = _interp_nearest(f32_sum, (h16, w16))
    f32_up = _conv_bn_relu(params, "cp.conv_head32", f32_up, 1, 1)

    f16_sum = _arm(params, "cp.arm16", f16) + f32_up
    f16_up = _interp_nearest(f16_sum, (h8, w8))
    f16_up = _conv_bn_relu(params, "cp.conv_head16", f16_up, 1, 1)
    return f8, f16_up, f32_up


def _ffm(params, fsp, fcp):
    """FeatureFusionModule (model.py:185-216)."""
    fcat = jnp.concatenate([fsp, fcp], axis=1)
    feat = _conv_bn_relu(params, "ffm.convblk", fcat, 1, 0)
    att = _global_avg(feat)
    att = jax.nn.relu(_conv(params, "ffm.conv1", att, 1, 0))
    att = jax.nn.sigmoid(_conv(params, "ffm.conv2", att, 1, 0))
    return feat * att + feat


def _output_head(params, name, x):
    """BiSeNetOutput (model.py:41-56)."""
    x = _conv_bn_relu(params, f"{name}.conv", x, 1, 1)
    return _conv(params, f"{name}.conv_out", x, 1, 0)


def apply_bisenet(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
    """x (B, 3, H, W) normalized -> (out, out16, out32) logits at (H, W)
    (model.py:240-262)."""
    H, W = x.shape[2], x.shape[3]
    feat_res8, feat_cp8, feat_cp16 = _context_path(params, x)
    feat_fuse = _ffm(params, feat_res8, feat_cp8)
    out = _output_head(params, "conv_out", feat_fuse)
    out16 = _output_head(params, "conv_out16", feat_cp8)
    out32 = _output_head(params, "conv_out32", feat_cp16)
    return (_interp_bilinear_ac(out, (H, W)),
            _interp_bilinear_ac(out16, (H, W)),
            _interp_bilinear_ac(out32, (H, W)))


# -------------------------------------------------------- weights / io

def convert_torch_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch BiSeNet state-dict -> params pytree (names preserved).

    Accepts tensors or numpy arrays; drops num_batches_tracked. Use with
    the reference's trained ``79999_iter.pth``:
        params = convert_torch_state_dict(torch.load(path, map_location="cpu"))
    """
    params = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         np.float32)
        params[k] = arr
    return params


def init_bisenet(key, n_classes: int = N_CLASSES) -> Dict[str, np.ndarray]:
    """Random init with the exact state-dict structure (for tests and the
    converter round-trip; real use loads converted torch weights)."""
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    params: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k, bias=False):
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

    def cbr(name, cin, cout, k):
        conv(f"{name}.conv", cin, cout, k)
        bn(f"{name}.bn", cout)

    def block(name, cin, cout, stride):
        conv(f"{name}.conv1", cin, cout, 3)
        bn(f"{name}.bn1", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        bn(f"{name}.bn2", cout)
        if cin != cout or stride != 1:
            conv(f"{name}.downsample.0", cin, cout, 1)
            bn(f"{name}.downsample.1", cout)

    r = "cp.resnet"
    conv(f"{r}.conv1", 3, 64, 7)
    bn(f"{r}.bn1", 64)
    for i, (cin, cout, s) in enumerate(
        [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)], start=1
    ):
        block(f"{r}.layer{i}.0", cin, cout, s)
        block(f"{r}.layer{i}.1", cout, cout, 1)

    for name, cin, cout in (("cp.arm16", 256, 128), ("cp.arm32", 512, 128)):
        cbr(f"{name}.conv", cin, cout, 3)
        conv(f"{name}.conv_atten", cout, cout, 1)
        bn(f"{name}.bn_atten", cout)
    cbr("cp.conv_head32", 128, 128, 3)
    cbr("cp.conv_head16", 128, 128, 3)
    cbr("cp.conv_avg", 512, 128, 1)

    cbr("ffm.convblk", 256, 256, 1)
    conv("ffm.conv1", 256, 64, 1)
    conv("ffm.conv2", 64, 256, 1)

    for name, cin, mid in (("conv_out", 256, 256), ("conv_out16", 128, 64),
                           ("conv_out32", 128, 64)):
        cbr(f"{name}.conv", cin, mid, 3)
        conv(f"{name}.conv_out", mid, n_classes, 1)
    return params


def parse_image(
    params: Dict[str, jnp.ndarray],
    image: np.ndarray,
    infer_size: int = 512,
) -> np.ndarray:
    """Full inference protocol (test.py:62-97): resize to 512 bilinear,
    ImageNet-normalize, forward, argmax -> (H, W) int class map at the
    original size (nearest upsample, as the reference's cv2 resize)."""
    H, W = image.shape[0], image.shape[1]
    x = jnp.asarray(image, jnp.float32) / 255.0
    x = jax.image.resize(x, (infer_size, infer_size, 3), "linear")
    x = (x - _MEAN) / _STD
    x = jnp.transpose(x, (2, 0, 1))[None]
    logits = apply_bisenet(params, x)[0]
    classes = jnp.argmax(logits[0], axis=0).astype(jnp.int32)
    rows = jnp.floor(jnp.arange(H) * (infer_size / H)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(W) * (infer_size / W)).astype(jnp.int32)
    return np.asarray(classes[rows][:, cols])
