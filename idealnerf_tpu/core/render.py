"""The single shared hierarchical volume renderer.

Replaces the 8+ copy-pasted ``render_rays``/``batchify_rays``/
``render_dynamic_face`` implementations in the reference trainers
(SURVEY.md §2.3). One pure function, traced once by XLA; there is no
chunk/netchunk python looping — the whole ray batch is a single fused
program (full-frame eval tiles with ``lax.map`` in eval/renderer.py).

Field functions have signature ``field_fn(pts, viewdirs) -> raw`` with
``pts`` (R, S, 3), ``viewdirs`` (R, 3), ``raw`` (R, S, 4); conditioning is
closed over (models/face_nerf.py folds it into biases).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from idealnerf_tpu.core.composite import raw2outputs
from idealnerf_tpu.core.sampling import sample_pdf, stratified_sample

FieldFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Renderer knobs, names matching the reference flags (helper.py:65-127)."""

    n_samples: int = 64        # N_samples
    n_importance: int = 128    # N_importance
    perturb: bool = True       # perturb > 0
    lindisp: bool = False
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    density_activation: str = "relu"  # "relu" (reference) | "softplus"

    def eval_mode(self) -> "RenderConfig":
        """perturb=0, no noise — the reference's render_kwargs_test."""
        return dataclasses.replace(self, perturb=False, raw_noise_std=0.0)


def render_rays(
    coarse_fn: FieldFn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    near,
    far,
    cfg: RenderConfig,
    key: Optional[jax.Array] = None,
    fine_fn: Optional[FieldFn] = None,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical render of (R, 3) rays against coarse (+fine) fields.

    Returns the reference's output dict: rgb_map/disp_map/acc_map plus
    rgb0/disp0/acc0/z_std/last_weight/rgb_fg when n_importance > 0
    (audio_exp_nerf.py:357-365; rgb_fg from the torso variant).
    """
    n_rays = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    use_perturb = cfg.perturb and key is not None
    if use_perturb:
        key, k_strat, k_noise = jax.random.split(key, 3)
    else:
        k_strat = k_noise = None

    z_vals = stratified_sample(
        near, far, cfg.n_samples, n_rays,
        key=k_strat, lindisp=cfg.lindisp, dtype=rays_o.dtype,
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = coarse_fn(pts, viewdirs)
    coarse = raw2outputs(
        raw, z_vals, rays_d, bc_rgb,
        raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
        noise_key=k_noise, density_activation=cfg.density_activation,
    )

    out = {
        "rgb_map": coarse.rgb,
        "disp_map": coarse.disp,
        "depth_map": coarse.depth,
        "depth_std": coarse.depth_std,
        "depth_band": coarse.depth_band,
        "acc_map": coarse.acc,
        "rgb_fg": coarse.rgb_fg,
        "last_weight": coarse.last_weight,
        "weights": coarse.weights,
    }
    if cfg.n_importance <= 0:
        return out

    if use_perturb:
        key, k_pdf, k_noise2 = jax.random.split(key, 3)
    else:
        k_pdf = k_noise2 = None

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(
        z_mid, coarse.weights[..., 1:-1], cfg.n_importance, key=k_pdf
    )
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]

    raw_fine = (fine_fn or coarse_fn)(pts, viewdirs)
    fine = raw2outputs(
        raw_fine, z_all, rays_d, bc_rgb,
        raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
        noise_key=k_noise2, density_activation=cfg.density_activation,
    )

    out.update(
        rgb_map=fine.rgb,
        disp_map=fine.disp,
        depth_map=fine.depth,
        depth_std=fine.depth_std,
        depth_band=fine.depth_band,
        acc_map=fine.acc,
        rgb_fg=fine.rgb_fg,
        last_weight=fine.last_weight,
        weights=fine.weights,
        rgb0=coarse.rgb,
        disp0=coarse.disp,
        acc0=coarse.acc,
        rgb_fg0=coarse.rgb_fg,
        last_weight0=coarse.last_weight,
        z_std=jnp.std(z_samples, axis=-1),
    )
    return out
