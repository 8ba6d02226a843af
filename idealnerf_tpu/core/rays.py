"""Camera ray generation and pose math.

Conventions match the reference (NeRFs/HeadNeRF/helper.py:228-265,
NeRFs/TorsoNeRF/run_nerf_helpers.py:26-47): pinhole camera with explicit
principal point (cx, cy), direction ``[(i-cx)/f, -(j-cy)/f, -1]`` rotated by
the camera-to-world rotation; ``pose_to_euler_trans`` uses the tracker's
euler extraction (atan2(R00,-R01), asin(-R02), atan2(R22,R12)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(H: int, W: int, focal, c2w, cx=None, cy=None):
    """Per-pixel ray origins and directions for a (3,4) camera-to-world pose.

    Returns (rays_o, rays_d), each (H, W, 3). ``i`` indexes columns (x),
    ``j`` rows (y), matching helper.py:228-243.
    """
    if cx is None:
        cx = W * 0.5
    if cy is None:
        cy = H * 0.5
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i - cx) / focal, -(j - cy) / focal, -jnp.ones_like(i)], axis=-1
    )
    # rays_d[h, w] = R @ dirs[h, w]. Full precision: this is camera
    # geometry (3 MACs/pixel), not a hot matmul — bf16 MXU rounding here
    # would visibly bend rays.
    rays_d = jnp.einsum(
        "hwc,kc->hwk", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """NDC transform (helper.py:246-265). Present for parity; face data
    always renders in world space (baseline.py:311-314)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def pose_to_euler_trans(poses: jnp.ndarray) -> jnp.ndarray:
    """(B, 3|4, 4) poses -> (B, 6) [euler(3), trans(3)].

    Euler extraction matches run_nerf_helpers.py:26-47; this is the torso
    NeRF's pose conditioning signal.
    """
    R = poses[:, :3, :3]
    e2 = jnp.arctan2(R[:, 0, 0], -R[:, 0, 1])
    e1 = jnp.arcsin(-R[:, 0, 2])
    e0 = jnp.arctan2(R[:, 2, 2], R[:, 1, 2])
    t = poses[:, :3, 3]
    return jnp.concatenate([jnp.stack([e0, e1, e2], axis=1), t], axis=1)
