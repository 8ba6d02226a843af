"""Dataset-surgery image tools (reference: utils/image_util/
image_utils.py:11-145 — background blackout, face crop, mouth-region
visualization)."""

from __future__ import annotations

import numpy as np


def blackout_background(image: np.ndarray, parse_img: np.ndarray,
                        color=(0, 0, 0)) -> np.ndarray:
    """Replace non-head pixels with ``color`` (head = red parse pixels)."""
    from idealnerf_tpu.pipeline.process import head_mask_from_parse

    out = image.copy()
    out[~head_mask_from_parse(parse_img)] = color
    return out


def crop_face(image: np.ndarray, face_rect, size: int = 256) -> np.ndarray:
    """Square face crop resized to ``size`` (second-stage preprocessing,
    get_data_second_stage.py:24-102)."""
    x, y, w, h = [int(v) for v in face_rect]
    H, W = image.shape[:2]
    side = max(w, h)
    cx, cy = x + w // 2, y + h // 2
    x0 = np.clip(cx - side // 2, 0, max(W - side, 0))
    y0 = np.clip(cy - side // 2, 0, max(H - side, 0))
    crop = image[y0 : y0 + side, x0 : x0 + side]
    try:
        import cv2

        return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    except Exception:
        # nearest-neighbor fallback without cv2
        ys = (np.arange(size) * crop.shape[0] / size).astype(int)
        xs = (np.arange(size) * crop.shape[1] / size).astype(int)
        return crop[ys][:, xs]


def visualize_mouth_region(image: np.ndarray, landmarks: np.ndarray,
                           margin: int = 20) -> np.ndarray:
    """Draw the mouth sampling box (landmarks 48+ ± margin) used by the
    ray-budget sampler (audio_exp_nerf.py:137-140)."""
    out = image.copy()
    mouth = landmarks[48:]
    x0 = max(int(mouth[:, 0].min()) - margin, 0)
    x1 = min(int(mouth[:, 0].max()) + margin, image.shape[1] - 1)
    y0 = max(int(mouth[:, 1].min()) - margin, 0)
    y1 = min(int(mouth[:, 1].max()) + margin, image.shape[0] - 1)
    out[y0, x0:x1] = [255, 0, 0]
    out[y1, x0:x1] = [255, 0, 0]
    out[y0:y1, x0] = [255, 0, 0]
    out[y0:y1, x1] = [255, 0, 0]
    return out
