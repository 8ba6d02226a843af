"""Torso / composite trainer (reference: NeRFs/TorsoNeRF/run_nerf.py
train() :350-707 and the joint-module variant train_torso.py).

Semantics parity:
- Torso NeRF is a FaceNeRF whose "audio" conditioning is the torso signal
  ``aud_smo[:dim_aud_body] ‖ PE3(euler) ‖ PE3(trans)`` of the *head pose*
  (run_nerf.py:421-426, 522-526; pose_to_euler_trans), no expr/latent.
- Torso rays are cast from the FIXED first-frame pose while head rays use
  the per-frame pose, both at the same pixel coords (run_nerf.py:499,
  527-595).
- Composite ``rgb_com = rgb_head · last_weight_torso + rgb_fg_torso``
  (fine and coarse), loss = MSE(com) + MSE(com0) on com_imgs, and ONLY the
  torso networks receive gradient updates — the head (and audio encoders)
  stay frozen (run_nerf.py:610-627; train_torso.py:476-479, 512-513).
- Ray budget: bottom-half rect gets area-proportional rays
  (run_nerf.py:559-583); audio is always AudioNet→AudioAttNet smoothed
  here (run_nerf.py:495-521).

TPU-native: one jitted program per step, frozen head handled by taking
gradients only w.r.t. the torso param subtree (no stop_gradient scattering
or optimizer param-group surgery).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.core.composite import layered_composite
from idealnerf_tpu.core.embedding import pe_dim, positional_encoding
from idealnerf_tpu.core.rays import pose_to_euler_trans
from idealnerf_tpu.core.render import render_rays
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.data.sampler import RayBudget, rays_at_coords, sample_ray_coords
from idealnerf_tpu.models.face_nerf import init_face_nerf, make_field_fn
from idealnerf_tpu.models.variants import build_field_fns
from idealnerf_tpu.train.head import compute_aud_feature
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.torso")

TORSO_POSE_PE = 2 * pe_dim(3, 3)  # PE3(euler) ‖ PE3(trans) = 42 channels


def torso_signal(aud_feature: jnp.ndarray, pose: jnp.ndarray,
                 dim_aud_body: int) -> jnp.ndarray:
    """The torso conditioning vector (run_nerf.py:522-526)."""
    et = pose_to_euler_trans(pose[None])[0]
    pe_e = positional_encoding(et[:3], 3)
    pe_t = positional_encoding(et[3:], 3)
    return jnp.concatenate([aud_feature[:dim_aud_body], pe_e, pe_t], axis=-1)


def torso_nerf_config(cfg: ExperimentConfig):
    return cfg.face_nerf_config(
        dim_aud=cfg.dim_aud_body + TORSO_POSE_PE, dim_expr=0, dim_latent=0
    )


def init_torso_params(key, cfg: ExperimentConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 2)
    tcfg = torso_nerf_config(cfg)
    return {"coarse": init_face_nerf(ks[0], tcfg), "fine": init_face_nerf(ks[1], tcfg)}


def torso_ray_budget(cfg: ExperimentConfig, H: int, W: int):
    """Bottom-half rect, area-proportional budget (run_nerf.py:559-583):
    (budget, rect, zero_mouth_box) for sample_ray_coords."""
    rect_rays = int(cfg.N_rand * 0.5)
    budget = RayBudget(face=rect_rays, background=cfg.N_rand - rect_rays,
                       mouth=0, torso=0)
    bottom_rect = jnp.array([0, H // 2, W - 1, H - H // 2 - 1], jnp.int32)
    zero_box = jnp.array([-1.0, -1.0, -1.0, -1.0])
    return budget, bottom_rect, zero_box


def make_torso_frame_loss(cfg: ExperimentConfig, dataset: FrameDataset,
                          smooth_audio: bool = True):
    """Single-frame composite loss ``loss_fn(torso_params, head_params,
    data, index, coords, key) -> (loss, aux)`` — shared by the
    single-chip step and the multi-chip sharded step
    (parallel/sharded.make_sharded_torso_train_step)."""
    focal, cx, cy = dataset.focal, dataset.cx, dataset.cy
    near, far = dataset.near, dataset.far
    tcfg = torso_nerf_config(cfg)
    render_cfg = cfg.render_config()

    def loss_fn(torso_params, head_params, data, index, coords, key):
        aud = compute_aud_feature(
            head_params, data["auds"], data["aud_ids"], index, cfg, smooth_audio
        )
        pose = data["poses"][index]
        pose0 = data["poses"][0]
        signal = torso_signal(aud, pose, cfg.dim_aud_body)

        image = data["images"][index].astype(jnp.float32) / 255.0
        bc = data["bc_img"].astype(jnp.float32) / 255.0
        target = image[coords[:, 0], coords[:, 1]]
        bc_rgb = bc[coords[:, 0], coords[:, 1]]

        rays_o, rays_d = rays_at_coords(coords, focal, pose, cx, cy)
        rays_o_t, rays_d_t = rays_at_coords(coords, focal, pose0, cx, cy)

        expr = data["exprs"][index] if cfg.dim_expr > 0 else None
        latent = (
            head_params.get("latent_codes")[index]
            if head_params.get("latent_codes") is not None else None
        )
        k_h, k_t = (jax.random.split(key) if key is not None else (None, None))
        from idealnerf_tpu.train.head import train_use_pallas

        fused = train_use_pallas(cfg)
        # head fields are variant-aware: the frozen head may be any of the
        # face_nerf / agg / attention variants (models/variants.py)
        head_coarse, head_fine = build_field_fns(head_params, cfg, aud, expr,
                                                 latent, use_pallas=fused)
        head_out = render_rays(
            head_coarse, rays_o, rays_d, bc_rgb, near, far, render_cfg,
            key=k_h, fine_fn=head_fine,
        )
        torso_out = render_rays(
            make_field_fn(torso_params["coarse"], tcfg, aud=signal,
                          use_pallas=fused),
            rays_o_t, rays_d_t, bc_rgb, near, far, render_cfg, key=k_t,
            fine_fn=make_field_fn(torso_params["fine"], tcfg, aud=signal,
                                  use_pallas=fused),
        )

        rgb_com = layered_composite(
            head_out["rgb_map"], torso_out["last_weight"], torso_out["rgb_fg"]
        )
        loss = jnp.mean((rgb_com - target) ** 2)
        img_loss = loss
        if "rgb0" in torso_out:
            rgb_com0 = layered_composite(
                head_out["rgb0"], torso_out["last_weight0"], torso_out["rgb_fg0"]
            )
            loss = loss + jnp.mean((rgb_com0 - target) ** 2)
        return loss, {"img_loss": img_loss}

    return loss_fn


def make_torso_train_step(
    cfg: ExperimentConfig,
    dataset: FrameDataset,
    smooth_audio: bool = True,
):
    """Jitted ``step(torso_params, opt_state, head_params, step, data,
    index, key)``. ``head_params`` (frozen head nerfs + audio encoders +
    optional latent_codes) is a runtime argument, not a baked constant, so
    the same executable serves any head checkpoint."""
    H, W = dataset.hw
    lr_sched = exponential_lr(cfg.lrate, cfg.lrate_decay)
    optimizer = optax.adam(lr_sched, b1=0.9, b2=0.999)
    budget, bottom_rect, zero_box = torso_ray_budget(cfg, H, W)
    loss_fn = make_torso_frame_loss(cfg, dataset, smooth_audio)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(torso_params, opt_state, head_params, step, data, index, key):
        k_sample, k_render = jax.random.split(key)
        coords = sample_ray_coords(
            k_sample, H, W, bottom_rect, zero_box,
            jnp.zeros((H, W), jnp.uint8), budget,
            approx=getattr(cfg, "sampler_approx", False),
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            torso_params, head_params, data, index, coords, k_render
        )
        updates, opt_state = optimizer.update(grads, opt_state, torso_params)
        torso_params = optax.apply_updates(torso_params, updates)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0),
            "lr": lr_sched(step),
        }
        return torso_params, opt_state, metrics

    return train_step


class TorsoTrainer:
    """Driver: frozen head (from a head checkpoint / HeadTrainer state) +
    torso optimization on com_imgs."""

    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 head_params: Dict[str, Any],
                 latent_codes: Optional[jnp.ndarray] = None,
                 seed: int = 0, smooth_audio: bool = True,
                 ckpt_dir: Optional[str] = None, resume: bool = True):
        self.cfg = cfg
        self.dataset = dataset
        self.data = dataset.to_device()
        head_params = dict(head_params)
        head_params["latent_codes"] = latent_codes
        self.head_params = head_params
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.torso_params = init_torso_params(k, cfg)
        self.optimizer = optax.adam(
            exponential_lr(cfg.lrate, cfg.lrate_decay), b1=0.9, b2=0.999
        )
        self.opt_state = self.optimizer.init(self.torso_params)
        self.step = 0
        self._step_fn = make_torso_train_step(cfg, dataset, smooth_audio)
        self.ckpt = None
        if ckpt_dir is not None:
            from idealnerf_tpu.ckpt import CheckpointManager

            self.ckpt = CheckpointManager(ckpt_dir)
            if resume and self.ckpt.latest_step() is not None:
                like = {"torso_params": self.torso_params,
                        "opt_state": self.opt_state,
                        "step": jnp.asarray(0, jnp.int32)}
                back = self.ckpt.restore(like)
                self.torso_params = back["torso_params"]
                self.opt_state = back["opt_state"]
                self.step = int(back["step"])
                logger.info("torso resumed from step %d", self.step)

    def save(self):
        if self.ckpt is not None:
            self.ckpt.save(self.step, {
                "torso_params": self.torso_params,
                "opt_state": self.opt_state,
                "step": jnp.asarray(self.step, jnp.int32),
            })

    def run(self, n_steps: int, log_every: int = 50, on_metrics=None):
        metrics = {}
        for _ in range(n_steps):
            index = self.step % self.dataset.size
            self.key, k = jax.random.split(self.key)
            self.torso_params, self.opt_state, m = self._step_fn(
                self.torso_params, self.opt_state, self.head_params,
                jnp.asarray(self.step, jnp.int32), self.data, index, k,
            )
            if self.step % log_every == 0:
                metrics = {k2: float(v) for k2, v in m.items()}
                if on_metrics is not None:
                    on_metrics(self.step, metrics)
                else:
                    logger.info(
                        "[TORSO] step %d loss %.5f psnr %.2f",
                        self.step, metrics["loss"], metrics["psnr"],
                    )
            self.step += 1
        return metrics
