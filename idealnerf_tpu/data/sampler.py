"""On-device region-stratified ray sampling.

The reference samples ray pixels on the host inside DataLoader worker
processes (audio_exp_nerf.py:134-195, forcing spawn + CUDA-in-worker,
SURVEY.md §3.1a). Here sampling is a pure jittable function inside the
train step: fixed budgets per region (mouth / torso / face / background),
uniform-without-replacement via top-k over masked uniforms — shape-static
for XLA.

Region semantics (audio_exp_nerf.py:134-187): mouth = landmark 48+ bbox
±20px; face = face_rect minus mouth; background = outside face_rect;
torso = red pixels of the parse map. Budgets: mouth_rays, torso_rays,
face = sample_rate · (N_rand − mouth − torso), background = remainder;
concatenation order [face, background, mouth, torso] (line 187).

Note: the reference compares row indices against x (column) coordinates
when testing rect membership (coords[:,0] is a row, face_rect[0] is x —
audio_exp_nerf.py:146-149) — an axis swap. We implement the intended
semantics (x against columns); the quirk only misplaces the emphasis boxes
and is explicitly not replicated (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RayBudget(NamedTuple):
    face: int
    background: int
    mouth: int
    torso: int

    @property
    def total(self) -> int:
        return self.face + self.background + self.mouth + self.torso

    @classmethod
    def from_config(cls, n_rand: int, mouth_rays: int, torso_rays: int,
                    sample_rate: float) -> "RayBudget":
        sample_num = n_rand - mouth_rays - torso_rays
        face = int(sample_num * sample_rate)
        return cls(face=face, background=sample_num - face,
                   mouth=mouth_rays, torso=torso_rays)


def _topk_coords(key, mask_flat: jnp.ndarray, k: int, W: int,
                 approx: bool = False) -> jnp.ndarray:
    """k coords sampled uniformly without replacement from mask_flat (H*W,).

    If the mask has fewer than k pixels, the remainder comes uniformly from
    outside the mask (the reference would crash; we degrade gracefully).

    ``approx``: ``lax.approx_max_k`` instead of exact top-k — much cheaper
    on TPU at H·W scale. The top-k of i.i.d. uniforms IS a uniform random
    subset, so imperfect recall merely swaps some selected pixels for
    other equally-random ones; with a sufficiently large mask a few
    selections may fall outside it (budget emphasis, not correctness).
    """
    u = jax.random.uniform(key, mask_flat.shape)
    score = jnp.where(mask_flat, u + 2.0, u)
    if approx:
        _, idx = jax.lax.approx_max_k(score, k, recall_target=0.95)
    else:
        _, idx = jax.lax.top_k(score, k)
    return jnp.stack([idx // W, idx % W], axis=-1)


def sample_ray_coords(
    key,
    H: int,
    W: int,
    face_rect: jnp.ndarray,   # (4,) [x, y, w, h] from transforms json
    mouth_box: jnp.ndarray,   # (4,) [min_x, max_x, min_y, max_y] (lms 48+ ±20)
    torso_mask: jnp.ndarray,  # (H, W) bool
    budget: RayBudget,
    approx: bool = False,
) -> jnp.ndarray:
    """(budget.total, 2) int32 pixel coords [row, col], order
    [face, background, mouth, torso]. ``approx``: see _topk_coords."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    mouth = (
        (cols >= mouth_box[0]) & (cols <= mouth_box[1])
        & (rows >= mouth_box[2]) & (rows <= mouth_box[3])
    )
    in_rect = (
        (cols >= face_rect[0]) & (cols <= face_rect[0] + face_rect[2])
        & (rows >= face_rect[1]) & (rows <= face_rect[1] + face_rect[3])
    )
    face = in_rect & ~mouth
    background = ~in_rect

    ks = jax.random.split(key, 4)
    parts = []
    for k_r, mask, n in (
        (ks[0], face, budget.face),
        (ks[1], background, budget.background),
        (ks[2], mouth, budget.mouth),
        (ks[3], torso_mask.astype(bool), budget.torso),
    ):
        if n > 0:
            parts.append(_topk_coords(k_r, mask.reshape(-1), n, W,
                                      approx=approx))
    return jnp.concatenate(parts, axis=0)


def rays_at_coords(coords: jnp.ndarray, focal, c2w, cx, cy):
    """Ray origins/directions only at the sampled pixels — no full (H, W)
    ray grid is ever materialized (the reference builds one per frame,
    audio_exp_nerf.py:135).
    coords (N, 2) int32 [row, col] -> (rays_o, rays_d) each (N, 3)."""
    row = coords[:, 0].astype(jnp.float32)
    col = coords[:, 1].astype(jnp.float32)
    dirs = jnp.stack(
        [(col - cx) / focal, -(row - cy) / focal, -jnp.ones_like(col)], axis=-1
    )
    rays_d = jnp.einsum(
        "nc,kc->nk", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d
