"""Landmark losses (reference: loss/landmark_loss.py, utils/
landmark_utils.py, helper.py:160-170).

The reference's differentiable landmark loss runs a vendored FAN
(2DFAN-4 TorchScript, downloaded at runtime — landmark_loss.py:76-80) on
the render and L1-compares heatmaps against the target's. That network's
weights are fetched from the internet, which this environment cannot do —
so the detector is an injected callable here and the loss machinery
(heatmap L1, pairwise-distance landmark features, feature-space MSE) is
native JAX and fully testable without it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def landmark_features(lms: jnp.ndarray) -> jnp.ndarray:
    """(L, 2) landmarks -> (L·(L-1)/2,) normalized pairwise distances
    (utils/landmark_utils.py:12-23: upper-triangle distances scaled by
    their maximum). Vectorized; the reference loops in python."""
    diff = lms[:, None, :] - lms[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
    n = lms.shape[0]
    iu = jnp.triu_indices(n, k=1)
    feats = dist[iu]
    return feats / jnp.max(feats)


def landmark_feature_loss(pred_lms: jnp.ndarray, target_feats: jnp.ndarray) -> jnp.ndarray:
    """MSE between the render's landmark features and precomputed target
    features (the ``.lf`` files — helper.py:160-170 lmd_loss)."""
    return jnp.mean((landmark_features(pred_lms) - target_feats) ** 2)


def heatmap_landmark_loss(pred_heatmaps: jnp.ndarray,
                          target_heatmaps: jnp.ndarray) -> jnp.ndarray:
    """L1 over FAN heatmaps (landmark_loss.py:149-161)."""
    return jnp.mean(jnp.abs(pred_heatmaps - target_heatmaps))


class LandmarkLoss:
    """Differentiable landmark loss with an injected heatmap detector.

    ``detector(image_hw3_float01) -> heatmaps`` — any callable (e.g. a
    torch FAN wrapped via dlpack, or a JAX reimplementation). Without one,
    calling raises with a clear message instead of silently downloading
    weights like the reference."""

    def __init__(self, detector: Optional[Callable] = None):
        self.detector = detector

    def __call__(self, fake: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.detector is None:
            raise RuntimeError(
                "LandmarkLoss needs a heatmap detector callable (FAN weights "
                "are not bundled and cannot be downloaded in this environment)"
            )
        return heatmap_landmark_loss(self.detector(fake), self.detector(target))


def make_fan_landmark_loss(fan_params) -> "LandmarkLoss":
    """LandmarkLoss backed by the in-repo FAN port (pipeline/fan.py):
    the constructible counterpart of the reference's
    ``LandmarkLoss(device)`` (loss/landmark_loss.py:142-161). Pass a
    converted 2DFAN-4 state dict (or init_fan output for tests).

    Differentiable: the detector runs on BOTH the render and the target
    crop and L1-compares the final-stack heatmaps — so the second-stage
    trainer optimizes landmarks in effect, matching
    distribute_nerf.py:487-491."""
    from idealnerf_tpu.pipeline.fan import make_heatmap_detector

    return LandmarkLoss(make_heatmap_detector(fan_params))
