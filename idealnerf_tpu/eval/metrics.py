"""Image quality metrics: PSNR (reference: helper.py:151), SSIM
(implemented here — the reference has none), and LPIPS via torchvision VGG
when pretrained weights are locally available (gated: this build
environment has zero egress, so LPIPS degrades to None rather than
downloading)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img - ref) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def ssim(
    img,
    ref,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean SSIM over an (H, W, C) pair (Gaussian-windowed, standard
    constants). Computed HOST-SIDE in float64 numpy: the local-variance
    terms blur(x*x) - mu**2 cancel catastrophically below full precision,
    and on TPU even an f32 jnp path multiplies in bf16 at default matmul
    precision (jnp.convolve lowers to dot_general), which produced SSIM
    values far outside [-1, 1]. A metric runs once per frame — exact host
    math is the right trade."""
    img = np.asarray(img, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    hw = filter_size // 2
    offs = np.arange(-hw, hw + 1, dtype=np.float64)
    g = np.exp(-(offs**2) / (2.0 * filter_sigma**2))
    g = g / np.sum(g)

    def blur(x):  # separable gaussian over H and W, per channel
        xp = np.pad(x, [(hw, hw), (0, 0), (0, 0)], mode="symmetric")
        x = np.apply_along_axis(
            lambda v: np.convolve(v, g, mode="valid"), 0, xp)
        xp = np.pad(x, [(0, 0), (hw, hw), (0, 0)], mode="symmetric")
        return np.apply_along_axis(
            lambda v: np.convolve(v, g, mode="valid"), 1, xp)

    mu_x, mu_y = blur(img), blur(ref)
    sxx = blur(img * img) - mu_x**2
    syy = blur(ref * ref) - mu_y**2
    sxy = blur(img * ref) - mu_x * mu_y
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    return float(np.mean(num / den))


def lpips(img: np.ndarray, ref: np.ndarray) -> Optional[float]:
    """LPIPS-style perceptual distance via torchvision VGG16 features.

    Returns None when pretrained VGG weights are not locally cached (this
    environment has no network egress). When available: L2 over unit-
    normalized relu feature maps, averaged over layers — the standard
    (unscaled) LPIPS formulation."""
    try:
        import torch
        import torchvision

        weights = torchvision.models.VGG16_Weights.IMAGENET1K_V1
        try:
            net = torchvision.models.vgg16(weights=weights).features.eval()
        except Exception:
            return None
    except Exception:
        return None

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return (t - mean) / std

    layers = {3, 8, 15, 22, 29}
    with torch.no_grad():
        xa, xb = prep(img), prep(ref)
        dist, n = 0.0, 0
        for i, layer in enumerate(net):
            xa, xb = layer(xa), layer(xb)
            if i in layers:
                fa = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                fb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist += float(((fa - fb) ** 2).mean())
                n += 1
        return dist / max(n, 1)
