"""Alpha compositing of raw field outputs along rays.

Matches the reference ``raw2outputs`` exactly (train/baseline.py:325-375 and
the torso variant run_nerf.py:715-766, which adds ``rgb_map_fg``): the final
sample's RGB is replaced by the known background-plate pixel ``bc_rgb`` so
the field only models the foreground over a static plate, and
``rgb_map_fg``/``last_weight`` enable layered head-over-torso compositing
(``rgb_com = rgb_head * last_weight_torso + rgb_fg_torso``,
run_nerf.py:610).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray          # (R, 3) composited color (bg plate included)
    disp: jnp.ndarray         # (R,) inverse depth
    acc: jnp.ndarray          # (R,) accumulated alpha
    weights: jnp.ndarray      # (R, S) per-sample compositing weights
    depth: jnp.ndarray        # (R,) expected depth
    rgb_fg: jnp.ndarray       # (R, 3) composite excluding the bg sample
    last_weight: jnp.ndarray  # (R,) weight of the bg (last) sample
    depth_std: jnp.ndarray    # (R,) weight-weighted depth std (surface
    #                           thickness; unlike z_std — which measures
    #                           SAMPLE spread — this stays tight on a
    #                           converged opaque surface)
    depth_band: jnp.ndarray   # (R, 2) z interval holding the central 96%
    #                           of FOREGROUND weight mass (plate sample
    #                           excluded) — robust to low-weight fog
    #                           tails, unlike the quadratic depth_std


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key: Optional[jax.Array] = None,
    density_activation: str = "relu",
) -> RenderOutputs:
    """raw (R, S, 4) [rgb logits, sigma] -> composited ray values.

    ``bc_rgb`` (R, 3): background-plate pixels substituted for the last
    sample's color (baseline.py:350).

    ``density_activation``: "relu" reproduces the reference
    (baseline.py:336-341). "softplus" is the robust alternative: with
    relu, a field driven toward transparency can push sigma negative at
    every sample and the density gradient dies permanently — observed in
    frozen-head torso training, where the torso collapses to full
    transparency and can never form the torso again. Softplus keeps the
    gradient alive; all other math is identical.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    rgb = jnp.concatenate([rgb[..., :-1, :], bc_rgb[..., None, :]], axis=-2)

    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std

    if density_activation not in ("relu", "softplus"):
        raise ValueError(
            f"density_activation must be 'relu' or 'softplus', got "
            f"{density_activation!r}"
        )
    act = jax.nn.relu if density_activation == "relu" else jax.nn.softplus
    alpha = 1.0 - jnp.exp(-(act(sigma) + 1e-6) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    rgb_fg = jnp.sum(weights[..., :-1, None] * rgb[..., :-1, :], axis=-2)

    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    # FOREGROUND-weighted depth variance (plate sample excluded — with
    # it, a semi-transparent ray reports plate distance as "thickness")
    w_fg = weights[..., :-1]
    z_fg = z_vals[..., :-1]
    fg_mass = jnp.maximum(jnp.sum(w_fg, axis=-1), 1e-10)
    depth_mean = jnp.sum(w_fg * z_fg, axis=-1) / fg_mass
    depth_std = jnp.sqrt(jnp.maximum(
        jnp.sum(w_fg * (z_fg - depth_mean[..., None]) ** 2, axis=-1)
        / fg_mass, 0.0))
    # central-96%-of-foreground-mass z interval (masked min/max — no
    # searchsorted, same trick as sampling.sample_pdf)
    cw = jnp.cumsum(w_fg, axis=-1)
    total = jnp.maximum(cw[..., -1:], 1e-10)
    big = jnp.asarray(1e10, z_vals.dtype)
    lo = jnp.min(jnp.where(cw >= 0.02 * total, z_fg, big), axis=-1)
    hi = jnp.min(jnp.where(cw >= 0.98 * total, z_fg, big), axis=-1)
    depth_band = jnp.stack(
        [jnp.minimum(lo, z_fg[..., -1]), jnp.minimum(hi, z_fg[..., -1])],
        axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])

    return RenderOutputs(
        rgb=rgb_map,
        disp=disp,
        acc=acc,
        weights=weights,
        depth=depth,
        rgb_fg=rgb_fg,
        last_weight=weights[..., -1],
        depth_std=depth_std,
        depth_band=depth_band,
    )


def layered_composite(
    rgb_head: jnp.ndarray,
    last_weight_torso: jnp.ndarray,
    rgb_fg_torso: jnp.ndarray,
) -> jnp.ndarray:
    """Head-over-torso layering: the torso field's transmittance-to-
    background (its last/bg sample weight) gates the head render behind
    the torso foreground — ``rgb_com = rgb_head · last_weight_torso +
    rgb_fg_torso`` (run_nerf.py:610, test_torso.py:523)."""
    return rgb_head * last_weight_torso[..., None] + rgb_fg_torso
