"""Multi-chip sharded training step.

Sharding layout (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives):

- params / latent table / optimizer state: replicated (the whole model is
  ~6 MB — replication is free, gradient psum rides ICI).
- frame batch (B frames per step): sharded over the 'data' mesh axis.
- each frame's ray budget: sharded over the 'ray' mesh axis via a
  with_sharding_constraint on the sampled coords — GSPMD then shards the
  entire PE→MLP→composite pipeline over rays with zero communication until
  the scalar loss reduction.

This generalizes the reference's two mechanisms at once: DataParallel
module replication and the manual einops ray reshape
(distribute_nerf.py:457-462).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.data.sampler import RayBudget, sample_ray_coords
from idealnerf_tpu.train.head import make_frame_loss
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.train.state import TrainState, make_optimizer


def _pad_rays(ro, rd, n_pad):
    """Pad flat (N,3) origins/directions with unit-origin, -z-direction
    dummy rays so N becomes a whole tile count (results are sliced back
    before assembly — every sharded renderer shares this convention)."""
    if not n_pad:
        return ro, rd
    ro = jnp.concatenate([ro, jnp.ones((n_pad, 3), ro.dtype)], 0)
    rd = jnp.concatenate(
        [rd, jnp.tile(jnp.array([[0.0, 0.0, -1.0]], rd.dtype),
                      (n_pad, 1))], 0)
    return ro, rd


def _pad_zeros(x, n_pad):
    if not n_pad:
        return x
    return jnp.concatenate([x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)], 0)


def make_sharded_train_step(
    cfg: ExperimentConfig,
    dataset: FrameDataset,
    mesh: Mesh,
    smooth_audio: bool = False,
    remat: bool = False,
):
    """Jitted ``step(state, data, indices (B,), key) -> (state, metrics)``
    with B = batch of frames; B must be divisible by the 'data' axis size
    and the ray budget by the 'ray' axis size.

    ``remat`` rematerializes each frame's forward during backward
    (jax.checkpoint). Measured on v5e at paper scale (3072 rays, 64+128):
    1 frame/chip runs 8.5 steps/s without remat and fills HBM (~5 GB
    backward residuals/frame); 2 frames/chip fit only WITH remat but the
    recompute drops throughput to 5.2 frames/s — so the recommended
    layout is one paper-scale frame per chip (remat off), scaling frames
    across the 'data' mesh axis; turn remat on only when a bigger
    per-chip batch is required for optimization reasons."""
    H, W = dataset.hw
    budget = RayBudget.from_config(
        cfg.N_rand, cfg.mouth_rays, cfg.torso_rays, cfg.sample_rate
    )
    optimizer = make_optimizer(cfg)
    lr_sched = exponential_lr(cfg.lrate, cfg.lrate_decay)
    frame_loss = make_frame_loss(cfg, dataset, smooth_audio)
    if remat:
        frame_loss = jax.checkpoint(frame_loss)

    coords_sharding = NamedSharding(mesh, P("data", "ray", None))
    replicated = NamedSharding(mesh, P())

    def batched_loss(diff, data, indices, coords, keys):
        losses, aux = jax.vmap(
            frame_loss, in_axes=(None, None, 0, 0, 0)
        )(diff, data, indices, coords, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, data, indices, key):
        batch = indices.shape[0]
        keys = jax.random.split(key, 2 * batch)
        k_sample, k_render = keys[:batch], keys[batch:]

        coords = jax.vmap(
            lambda k, i: sample_ray_coords(
                k, H, W,
                data["face_rects"][i], data["mouth_boxes"][i],
                data["torso_masks"][i], budget,
                approx=getattr(cfg, "sampler_approx", False),
            )
        )(k_sample, indices)
        coords = jax.lax.with_sharding_constraint(coords, coords_sharding)

        (loss, aux), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            (state.params, state.latent_codes), data, indices, coords, k_render
        )
        grads = jax.lax.with_sharding_constraint(grads, replicated)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.latent_codes)
        )
        params, latents = optax.apply_updates(
            (state.params, state.latent_codes), updates
        )
        new_state = TrainState(
            step=state.step + 1, params=params,
            latent_codes=latents, opt_state=opt_state,
        )
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0),
            "lr": lr_sched(state.step),
        }
        return new_state, metrics

    return train_step


def make_sharded_frame_renderer(
    nerf_cfg,
    mesh: Mesh,
    H: int, W: int, focal, near, far, render_cfg,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None,
):
    """Ray-sharded full-frame eval render — the eval-side counterpart of
    :func:`make_sharded_train_step`.

    ``render(params, pose, bc_img, aud, expr, latent) -> (H, W, 3)`` with
    each ray tile's leading axis split over the mesh's 'ray' axis (params
    and conditioning replicate; the whole PE→MLP→composite pipeline
    shards per-ray with zero collectives, rgb gathers at the output).
    The reference evaluates single-GPU with python-looped 8192-ray chunks
    (audio_exp_nerf.py:281-295); here an N-chip slice renders ~N× the
    rays/s behind the same call signature. ``tile`` must divide by the
    'ray' axis size.
    """
    from idealnerf_tpu.core.rays import get_rays
    from idealnerf_tpu.core.render import render_rays
    from idealnerf_tpu.models.face_nerf import make_field_fn

    n_ray = mesh.shape["ray"]
    if tile % n_ray:
        raise ValueError(f"tile {tile} not divisible by 'ray' axis {n_ray}")
    tile_sharding = NamedSharding(mesh, P(None, "ray", None))
    ecfg = render_cfg.eval_mode()

    @jax.jit
    def render(params, pose, bc_img, aud=None, expr=None, latent=None):
        coarse_fn = make_field_fn(params["coarse"], nerf_cfg, aud, expr,
                                  latent, compute_dtype=compute_dtype)
        fine_fn = make_field_fn(
            params["fine"], nerf_cfg, aud, expr, latent,
            compute_dtype=compute_dtype,
        ) if "fine" in params else None

        rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        bc = bc_img.reshape(-1, 3)
        n = rays_o.shape[0]
        n_pad = (-n) % tile
        rays_o, rays_d = _pad_rays(rays_o, rays_d, n_pad)
        bc = _pad_zeros(bc, n_pad)

        tiles = tuple(x.reshape(-1, tile, 3) for x in (rays_o, rays_d, bc))
        tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)

        def render_tile(args):
            o, d, b = args
            out = render_rays(coarse_fn, o, d, b, near, far, ecfg,
                              fine_fn=fine_fn)
            return out["rgb_map"]

        rgb = jax.lax.map(render_tile, tiles).reshape(-1, 3)[:n]
        return rgb.reshape(H, W, 3)

    return render


def make_sharded_video_renderer(
    nerf_cfg,
    mesh: Mesh,
    H: int, W: int, focal, near, far, render_cfg,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None,
):
    """Frame-batched multi-chip video rendering: ``render(params, poses
    (B,3,4), bc_img, auds (B,da), exprs (B,de), latents (B,dl)) ->
    (B,H,W,3)`` with frames sharded over the mesh's 'data' axis and each
    frame's rays over 'ray' — the eval counterpart of the data-parallel
    train step, for offline video production on a slice (the reference
    renders videos strictly frame-at-a-time on one GPU,
    eval_aud_exp_nerf.py:437-483). B must divide by the 'data' axis.
    Per-frame conditioning rides with its frame shard; parameters
    replicate; no collectives until the output gather."""
    from idealnerf_tpu.core.rays import get_rays
    from idealnerf_tpu.core.render import render_rays
    from idealnerf_tpu.models.face_nerf import make_field_fn

    n_ray = mesh.shape["ray"]
    if tile % n_ray:
        raise ValueError(f"tile {tile} not divisible by 'ray' axis {n_ray}")
    ecfg = render_cfg.eval_mode()
    ray_sharding = NamedSharding(mesh, P("data", None, "ray", None))
    cond_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def render(params, poses, bc_img, auds=None, exprs=None, latents=None):
        B = poses.shape[0]
        if B % mesh.shape["data"]:
            raise ValueError(
                f"frame batch {B} not divisible by 'data' axis "
                f"{mesh.shape['data']}")
        bc = bc_img.reshape(-1, 3)
        n = H * W
        n_pad = (-n) % tile

        def frame_rays(pose):
            ro, rd = get_rays(H, W, focal, pose, cx, cy)
            ro, rd = _pad_rays(ro.reshape(-1, 3), rd.reshape(-1, 3), n_pad)
            return (ro.reshape(-1, tile, 3), rd.reshape(-1, tile, 3))

        ro_t, rd_t = jax.vmap(frame_rays)(poses)  # (B, n_tiles, tile, 3)
        ro_t = jax.lax.with_sharding_constraint(ro_t, ray_sharding)
        rd_t = jax.lax.with_sharding_constraint(rd_t, ray_sharding)
        bc_t = _pad_zeros(bc, n_pad).reshape(-1, tile, 3)
        cond = tuple(
            None if c is None
            else jax.lax.with_sharding_constraint(c, cond_sharding)
            for c in (auds, exprs, latents))

        def render_frame(ro_f, rd_f, aud, expr, latent):
            coarse_fn = make_field_fn(params["coarse"], nerf_cfg, aud, expr,
                                      latent, compute_dtype=compute_dtype)
            fine_fn = make_field_fn(
                params["fine"], nerf_cfg, aud, expr, latent,
                compute_dtype=compute_dtype,
            ) if "fine" in params else None

            def render_tile(args):
                o, d, b = args
                out = render_rays(coarse_fn, o, d, b, near, far, ecfg,
                                  fine_fn=fine_fn)
                return out["rgb_map"]

            rgb = jax.lax.map(render_tile, (ro_f, rd_f, bc_t))
            return rgb.reshape(-1, 3)[:n].reshape(H, W, 3)

        in_axes = (0, 0) + tuple(None if c is None else 0 for c in cond)
        return jax.vmap(render_frame, in_axes=in_axes)(ro_t, rd_t, *cond)

    return render


def make_sharded_composite_video_renderer(
    head_cfg, torso_cfg,
    mesh: Mesh,
    H: int, W: int, focal, near, far, render_cfg,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None,
):
    """Frame-batched head+torso composite video rendering:
    ``render(head_params, torso_params, poses (B,3,4), pose0, bc_img,
    auds (B,da), signals (B,ds), exprs (B,de), latents (B,dl)) ->
    (B,H,W,3)`` — frames over the mesh's 'data' axis, rays over 'ray';
    the full talking-head video production workload on a slice
    (reference: one frame at a time on one GPU, test_torso.py:513-534).

    Torso rays come from the fixed ``pose0`` so they are identical for
    every frame: built once and closed over (replicated), only the
    torso's conditioning ``signals`` ride the 'data' axis."""
    from idealnerf_tpu.core.composite import layered_composite
    from idealnerf_tpu.core.rays import get_rays
    from idealnerf_tpu.core.render import render_rays
    from idealnerf_tpu.models.face_nerf import make_field_fn

    n_ray = mesh.shape["ray"]
    if tile % n_ray:
        raise ValueError(f"tile {tile} not divisible by 'ray' axis {n_ray}")
    ecfg = render_cfg.eval_mode()
    ray_sharding = NamedSharding(mesh, P("data", None, "ray", None))
    tile_sharding = NamedSharding(mesh, P(None, "ray", None))
    cond_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def render(head_params, torso_params, poses, pose0, bc_img,
               auds=None, signals=None, exprs=None, latents=None):
        B = poses.shape[0]
        if B % mesh.shape["data"]:
            raise ValueError(
                f"frame batch {B} not divisible by 'data' axis "
                f"{mesh.shape['data']}")
        bc = bc_img.reshape(-1, 3)
        n = H * W
        n_pad = (-n) % tile

        def flat_tiles(pose):
            ro, rd = get_rays(H, W, focal, pose, cx, cy)
            ro, rd = _pad_rays(ro.reshape(-1, 3), rd.reshape(-1, 3), n_pad)
            return (ro.reshape(-1, tile, 3), rd.reshape(-1, tile, 3))

        ho_t, hd_t = jax.vmap(flat_tiles)(poses)     # (B, T, tile, 3)
        ho_t = jax.lax.with_sharding_constraint(ho_t, ray_sharding)
        hd_t = jax.lax.with_sharding_constraint(hd_t, ray_sharding)
        to_t, td_t = flat_tiles(pose0)               # (T, tile, 3) fixed
        to_t = jax.lax.with_sharding_constraint(to_t, tile_sharding)
        td_t = jax.lax.with_sharding_constraint(td_t, tile_sharding)
        bc_t = _pad_zeros(bc, n_pad).reshape(-1, tile, 3)
        cond = tuple(
            None if c is None
            else jax.lax.with_sharding_constraint(c, cond_sharding)
            for c in (auds, signals, exprs, latents))

        def render_frame(ho_f, hd_f, aud, signal, expr, latent):
            h_coarse = make_field_fn(head_params["coarse"], head_cfg, aud,
                                     expr, latent,
                                     compute_dtype=compute_dtype)
            h_fine = make_field_fn(
                head_params["fine"], head_cfg, aud, expr, latent,
                compute_dtype=compute_dtype,
            ) if "fine" in head_params else None
            t_coarse = make_field_fn(torso_params["coarse"], torso_cfg,
                                     aud=signal,
                                     compute_dtype=compute_dtype)
            t_fine = make_field_fn(
                torso_params["fine"], torso_cfg, aud=signal,
                compute_dtype=compute_dtype,
            ) if "fine" in torso_params else None

            def render_tile(args):
                h_o, h_d, t_o, t_d, b = args
                head = render_rays(h_coarse, h_o, h_d, b, near, far, ecfg,
                                   fine_fn=h_fine)
                torso = render_rays(t_coarse, t_o, t_d, b, near, far,
                                    ecfg, fine_fn=t_fine)
                return layered_composite(
                    head["rgb_map"], torso["last_weight"],
                    torso["rgb_fg"])

            rgb = jax.lax.map(render_tile, (ho_f, hd_f, to_t, td_t, bc_t))
            return rgb.reshape(-1, 3)[:n].reshape(H, W, 3)

        in_axes = (0, 0) + tuple(None if c is None else 0 for c in cond)
        return jax.vmap(render_frame, in_axes=in_axes)(ho_t, hd_t, *cond)

    return render


def make_sharded_composite_renderer(
    head_cfg, torso_cfg,
    mesh: Mesh,
    H: int, W: int, focal, near, far, render_cfg,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None,
):
    """Ray-sharded head+torso composite — the multi-chip counterpart of
    eval.renderer.make_composite_frame_renderer (the north-star workload,
    reference test_torso.py:513-534).

    ``render(head_params, torso_params, pose, pose0, bc_img, aud, signal,
    expr, latent) -> (H, W, 3)``. Head rays come from ``pose``, torso rays
    from the fixed first-frame ``pose0``; both fields and the layered
    composite run per-ray inside one tile, so the whole pipeline shards
    over the mesh's 'ray' axis with zero collectives (params/conditioning
    replicate, rgb gathers at the output)."""
    from idealnerf_tpu.core.composite import layered_composite
    from idealnerf_tpu.core.rays import get_rays
    from idealnerf_tpu.core.render import render_rays
    from idealnerf_tpu.models.face_nerf import make_field_fn

    n_ray = mesh.shape["ray"]
    if tile % n_ray:
        raise ValueError(f"tile {tile} not divisible by 'ray' axis {n_ray}")
    tile_sharding = NamedSharding(mesh, P(None, "ray", None))
    ecfg = render_cfg.eval_mode()

    def _flat_rays(pose):
        ro, rd = get_rays(H, W, focal, pose, cx, cy)
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    @jax.jit
    def render(head_params, torso_params, pose, pose0, bc_img,
               aud=None, signal=None, expr=None, latent=None):
        h_coarse = make_field_fn(head_params["coarse"], head_cfg, aud, expr,
                                 latent, compute_dtype=compute_dtype)
        h_fine = make_field_fn(
            head_params["fine"], head_cfg, aud, expr, latent,
            compute_dtype=compute_dtype,
        ) if "fine" in head_params else None
        t_coarse = make_field_fn(torso_params["coarse"], torso_cfg,
                                 aud=signal, compute_dtype=compute_dtype)
        t_fine = make_field_fn(
            torso_params["fine"], torso_cfg, aud=signal,
            compute_dtype=compute_dtype,
        ) if "fine" in torso_params else None

        ho, hd = _flat_rays(pose)
        to, td = _flat_rays(pose0)
        bc = bc_img.reshape(-1, 3)
        n = ho.shape[0]
        n_pad = (-n) % tile
        ho, hd = _pad_rays(ho, hd, n_pad)
        to, td = _pad_rays(to, td, n_pad)
        bc = _pad_zeros(bc, n_pad)

        tiles = tuple(x.reshape(-1, tile, 3) for x in (ho, hd, to, td, bc))
        tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)

        def render_tile(args):
            h_o, h_d, t_o, t_d, b = args
            head = render_rays(h_coarse, h_o, h_d, b, near, far, ecfg,
                               fine_fn=h_fine)
            torso = render_rays(t_coarse, t_o, t_d, b, near, far, ecfg,
                                fine_fn=t_fine)
            return layered_composite(
                head["rgb_map"], torso["last_weight"], torso["rgb_fg"])

        rgb = jax.lax.map(render_tile, tiles).reshape(-1, 3)[:n]
        return rgb.reshape(H, W, 3)

    return render


def make_sharded_torso_train_step(
    cfg: ExperimentConfig,
    dataset: FrameDataset,
    mesh: Mesh,
    smooth_audio: bool = True,
    remat: bool = False,
):
    """Multi-chip torso step: ``step(torso_params, opt_state, head_params,
    step, data, indices (B,), key) -> (torso_params, opt_state, metrics)``
    — the sharded counterpart of train.torso.make_torso_train_step (same
    frame loss, frames batched over 'data', rays over 'ray'). The frozen
    head replicates with the rest of the params."""
    from idealnerf_tpu.train.torso import (
        make_torso_frame_loss, torso_ray_budget,
    )

    H, W = dataset.hw
    lr_sched = exponential_lr(cfg.lrate, cfg.lrate_decay)
    optimizer = optax.adam(lr_sched, b1=0.9, b2=0.999)
    budget, bottom_rect, zero_box = torso_ray_budget(cfg, H, W)
    frame_loss = make_torso_frame_loss(cfg, dataset, smooth_audio)
    if remat:
        frame_loss = jax.checkpoint(frame_loss)

    coords_sharding = NamedSharding(mesh, P("data", "ray", None))
    replicated = NamedSharding(mesh, P())
    zero_mask = jnp.zeros((H, W), jnp.uint8)

    def batched_loss(torso_params, head_params, data, indices, coords, keys):
        losses, aux = jax.vmap(
            frame_loss, in_axes=(None, None, None, 0, 0, 0)
        )(torso_params, head_params, data, indices, coords, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(torso_params, opt_state, head_params, step, data,
                   indices, key):
        batch = indices.shape[0]
        keys = jax.random.split(key, 2 * batch)
        coords = jax.vmap(
            lambda k: sample_ray_coords(
                k, H, W, bottom_rect, zero_box, zero_mask, budget,
                approx=getattr(cfg, "sampler_approx", False),
            )
        )(keys[:batch])
        coords = jax.lax.with_sharding_constraint(coords, coords_sharding)

        (loss, aux), grads = jax.value_and_grad(
            batched_loss, has_aux=True
        )(torso_params, head_params, data, indices, coords, keys[batch:])
        grads = jax.lax.with_sharding_constraint(grads, replicated)
        updates, opt_state = optimizer.update(grads, opt_state, torso_params)
        torso_params = optax.apply_updates(torso_params, updates)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0),
            "lr": lr_sched(step),
        }
        return torso_params, opt_state, metrics

    return train_step
