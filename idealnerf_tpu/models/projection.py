"""GRF-style point-to-image projection + feature gathering (reference:
helper.py:316-368 make_indices/gather_indices).

Projects 3D sample points into a source view via the inverted
camera-to-world pose + intrinsics and gathers per-point CNN features,
appending the (row, col) indices as 2 extra channels (the reference's
196 = 194 features + 2). Differences from the reference: indices are
clamped (no hard exception on out-of-bounds — helper.py:363-364 raises),
and the gather is a vectorized take instead of python fancy indexing.
"""

from __future__ import annotations

import jax.numpy as jnp


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """(…, 3|4, 4) camera-to-world -> (…, 3, 4) world-to-camera
    (helper.py:317-322)."""
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3:4]
    rot_t = jnp.swapaxes(rot, -1, -2)
    return jnp.concatenate([rot_t, -rot_t @ trans], axis=-1)


def project_points(
    pts: jnp.ndarray,        # (N, 3) world points
    pose: jnp.ndarray,       # (3|4, 4) camera-to-world of the source view
    intrinsic: jnp.ndarray,  # (3, 3) [[f,0,cx],[0,f,cy],[0,0,1]]
    H: int,
    W: int,
) -> jnp.ndarray:
    """(N, 2) int32 [row, col] pixel indices, clamped into the image.

    Follows the reference arithmetic (helper.py:325-348): camera-frame
    points via the inverted pose, perspective division against the z
    coordinate, intrinsic mapping, then the row/col flip + mirror that
    maps the tracker's camera convention into image indices.
    """
    ext = invert_pose(pose)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)
    cam = hom @ ext.T                       # (N, 3)
    focal = intrinsic[0, 0]
    cam = focal / cam[:, 2:3] * cam         # perspective scale (ref :336)
    pix = (cam @ intrinsic.T) / focal       # (N, 3) (ref :339)
    # reference flips to (y, x) then mirrors x: final = (0 - y, W - x)·(-1, 1)
    fin = jnp.flip(pix, axis=-1)[:, 1:]     # (N, 2) = (y, x)
    fin = (jnp.array([0.0, W]) - fin) * jnp.array([-1.0, 1.0])
    fin = jnp.round(fin)
    fin = jnp.clip(fin, 0, jnp.array([H - 1, W - 1], jnp.float32))
    return fin.astype(jnp.int32)


def gather_image_features(
    pts: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsic: jnp.ndarray,
    feature_map: jnp.ndarray,  # (H, W, C); channels_first for (C, H, W)
    channels_first: bool = False,
) -> jnp.ndarray:
    """(N, C + 2): per-point source-view features ‖ their pixel indices
    (helper.py:351-368)."""
    if channels_first:
        feature_map = jnp.transpose(feature_map, (1, 2, 0))  # CHW -> HWC
    H, W = feature_map.shape[0], feature_map.shape[1]
    idx = project_points(pts, pose, intrinsic, H, W)
    feats = feature_map[idx[:, 0], idx[:, 1]]
    return jnp.concatenate([feats, idx.astype(jnp.float32)], axis=-1)
