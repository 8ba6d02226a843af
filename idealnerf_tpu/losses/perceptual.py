"""Perceptual losses (reference: loss/vgg_loss.py VGG16 relu1_2..relu4_3
MSE content loss + gram helper; loss/vgg_face_loss.py multi-layer L1).

Design: ``FeatureLoss`` is a generic multi-layer feature-map loss over an
injected feature extractor (a pure function image -> list of feature
maps). ``make_vgg16_features`` builds such an extractor from torchvision's
VGG16 when its pretrained weights are locally cached (zero-egress
environment: returns None otherwise, mirroring eval/metrics.lpips
gating). The gram matrix helper matches vgg_loss.py:48-53.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def gram_matrix(features: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, C) normalized gram (vgg_loss.py:48-53)."""
    b, c, h, w = features.shape
    f = features.reshape(b, c, h * w)
    return jnp.einsum("bcn,bdn->bcd", f, f) / (c * h * w)


class FeatureLoss:
    """Multi-layer feature loss: ``loss = reduce_over_layers
    dist(feat(fake)_l, feat(target)_l)``; dist='l2' reproduces VGGLOSS
    (vgg_loss.py:56-77), dist='l1' reproduces VGGFaceLoss
    (vgg_face_loss.py:84-100)."""

    def __init__(self, feature_fn: Callable[[np.ndarray], Sequence],
                 dist: str = "l2"):
        if dist not in ("l1", "l2"):
            raise ValueError(f"dist must be 'l1' or 'l2', got {dist!r}")
        self.feature_fn = feature_fn
        self.dist = dist

    def __call__(self, fake, target):
        ff = self.feature_fn(fake)
        ft = self.feature_fn(target)
        total = 0.0
        for a, b in zip(ff, ft):
            a = jnp.asarray(np.asarray(a))
            b = jnp.asarray(np.asarray(b))
            if self.dist == "l2":
                total = total + jnp.mean((a - b) ** 2)
            else:
                total = total + jnp.mean(jnp.abs(a - b))
        return total


def make_vgg16_features(
    layers: Sequence[int] = (3, 8, 15, 22),  # relu1_2, 2_2, 3_3, 4_3
) -> Optional[Callable]:
    """Torchvision VGG16 feature extractor, or None when pretrained
    weights are not locally available (no network egress here)."""
    try:
        import torch
        import torchvision

        weights = torchvision.models.VGG16_Weights.IMAGENET1K_V1
        net = torchvision.models.vgg16(weights=weights).features.eval()
    except Exception:
        return None

    layer_set = set(layers)

    def features(img) -> List[np.ndarray]:
        x = torch.from_numpy(np.asarray(img, np.float32))
        if x.ndim == 3:
            x = x.permute(2, 0, 1)[None]
        out = []
        with torch.no_grad():
            for i, layer in enumerate(net):
                x = layer(x)
                if i in layer_set:
                    out.append(x.numpy())
                if i >= max(layer_set):
                    break
        return out

    return features
