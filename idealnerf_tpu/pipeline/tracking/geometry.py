"""Tracking math (reference: data_util/face_tracking/util.py,
geo_transform.py): euler rotations, rigid transforms, the tracker's
perspective projection (note the sign: proj_x = -f·X/Z + cx,
util.py:60-69), landmark/Laplacian losses, triangle normals."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def euler2rot(euler: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) [theta, phi, psi] -> (B, 3, 3) = Rx(theta) Ry(phi) Rz(psi)
    with the reference's axis conventions (util.py:18-40)."""
    theta, phi, psi = euler[:, 0], euler[:, 1], euler[:, 2]
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    cs, ss = jnp.cos(psi), jnp.sin(psi)
    # rows below = the reference's column-cat layout transposed into rows
    rot_x = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, ct, -st], -1),
        jnp.stack([zero, st, ct], -1),
    ], -2)
    rot_y = jnp.stack([
        jnp.stack([cp, zero, sp], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sp, zero, cp], -1),
    ], -2)
    rot_z = jnp.stack([
        jnp.stack([cs, ss, zero], -1),
        jnp.stack([-ss, cs, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    return rot_x @ rot_y @ rot_z


def euler2rot_np(euler: np.ndarray) -> np.ndarray:
    return np.asarray(euler2rot(jnp.asarray(euler, jnp.float32)))


def rot_trans_pts(geometry: jnp.ndarray, rot: jnp.ndarray,
                  trans: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3), (B, 3, 3), (B, 3) -> rotated+translated points
    (util.py:43-45)."""
    return jnp.einsum("bij,bvj->bvi", rot, geometry) + trans[:, None, :]


def proj_pts(rott_geo: jnp.ndarray, focal, cxy) -> jnp.ndarray:
    """Perspective projection with the tracker's sign convention
    (util.py:60-69): x mirrored (-f·X/Z + cx), y direct (f·Y/Z + cy)."""
    X, Y, Z = rott_geo[..., 0], rott_geo[..., 1], rott_geo[..., 2]
    px = -focal * X / Z + cxy[0]
    py = focal * Y / Z + cxy[1]
    return jnp.stack([px, py, Z], axis=-1)


def forward_transform(geometry, euler, trans, focal, cxy):
    rot = euler2rot(euler)
    return proj_pts(rot_trans_pts(geometry, rot, trans), focal, cxy)


def landmark_loss(proj_lan: jnp.ndarray, gt_lan: jnp.ndarray) -> jnp.ndarray:
    """MSE over projected vs detected landmarks (util.py:84-85)."""
    return jnp.mean((proj_lan - gt_lan) ** 2)


def lap_loss(series: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Temporal Laplacian smoothness: conv [-0.5, 1, -0.5] along the
    leading (time) axis (util.py:48-57). series (T, ...) -> scalar."""
    if series.shape[0] < 3:
        # a <3-frame trajectory has no interior point: the Laplacian is
        # empty and mean([]) would poison the loss with NaN
        return jnp.asarray(0.0, series.dtype)
    flat = series.reshape(series.shape[0], -1)
    lap = flat[1:-1] - 0.5 * flat[:-2] - 0.5 * flat[2:]
    return jnp.mean(lap**2) * weight


def compute_tri_normal(geometry: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3), (F, 3) -> (B, F, 3) unit triangle normals
    (util.py:6-15)."""
    v1 = geometry[:, tris[:, 0]]
    v2 = geometry[:, tris[:, 1]]
    v3 = geometry[:, tris[:, 2]]
    n = jnp.cross(v2 - v1, v3 - v1)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
