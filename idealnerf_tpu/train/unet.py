"""GRF-style UNet-attention trainer (reference:
NeRFs/HeadNeRF/train/unet_att_nerf.py + utils/load_data/get_data.py).

The reference pipeline: a FaceUNetCNN computes a feature map of the
PE-embedded source frame; every NeRF sample point projects into that
frame (make_indices/gather_indices) and gathers per-point CNN features;
an AttSets block aggregates; the fused feature conditions the NeRF
decoder (NeRFAttentionModel). Landmark pixels lead the ray batch
(get_data.py:122-132). As shipped, the reference path cannot run — it
passes FaceNeRF a nonexistent ``attention_cnn_features`` kwarg and
AttSets' final layer is shape-inconsistent (SURVEY.md §7 quirks). This is
the working realization of the same design:

  UNet(PE(frame)) -> (C, H, W) features
  per point: project -> gather (C+2) -> AttSets over the view axis
  decoder: FaceNeRF topology with PER-POINT conditioning
           (models/face_nerf.apply_point_conditioned)

Ray batches put the 68 landmark pixels first, then the regular budget.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.core.embedding import pe_dim, positional_encoding
from idealnerf_tpu.core.render import render_rays
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.data.sampler import RayBudget, rays_at_coords, sample_ray_coords
from idealnerf_tpu.models.attention import apply_attsets, init_attsets
from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, apply_point_conditioned, init_face_nerf,
)
from idealnerf_tpu.models.face_unet import apply_face_unet, init_face_unet
from idealnerf_tpu.models.projection import gather_image_features
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.unet")

ATT_OUT = 512           # attention_output_length (unet_att_nerf.py:68)
EMBED_IMG_MULTIRES = 5  # attention embedder (audio_exp_nerf.py:37 -> 33ch)


def unet_nerf_config(cfg: ExperimentConfig) -> FaceNeRFConfig:
    return cfg.face_nerf_config(dim_aud=ATT_OUT, dim_expr=0, dim_latent=0)


def init_unet_params(key, cfg: ExperimentConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    embed_ln = pe_dim(3, EMBED_IMG_MULTIRES)  # 33-ch embedded RGB
    ncfg = unet_nerf_config(cfg)
    feat_ch = 128 + embed_ln + 2  # unet features + embedded rgb + indices
    return {
        "unet": init_face_unet(ks[0], input_ch=embed_ln),
        "attsets": init_attsets(
            ks[1], input_ch=feat_ch + pe_dim(3, cfg.multires),
            attention_output_length=ATT_OUT,
        ),
        "coarse": init_face_nerf(ks[2], ncfg),
        "fine": init_face_nerf(ks[3], ncfg),
    }


def make_unet_train_step(cfg: ExperimentConfig, dataset: FrameDataset):
    H, W = dataset.hw
    focal, cx, cy = dataset.focal, dataset.cx, dataset.cy
    near, far = dataset.near, dataset.far
    ncfg = unet_nerf_config(cfg)
    render_cfg = cfg.render_config()
    lr_sched = exponential_lr(cfg.lrate, cfg.lrate_decay)
    optimizer = optax.adam(lr_sched, b1=0.9, b2=0.999)
    intrinsic = jnp.array(
        [[focal, 0.0, cx], [0.0, focal, cy], [0.0, 0.0, 1.0]]
    )
    budget = RayBudget.from_config(
        max(cfg.N_rand - 68, 68), cfg.mouth_rays, cfg.torso_rays,
        cfg.sample_rate,
    )

    def field_fn(params, feature_map, pose):
        def fn(pts, viewdirs):
            R, S, _ = pts.shape
            flat = pts.reshape(R * S, 3)
            pe_pts = positional_encoding(flat, cfg.multires)
            dirs = jnp.broadcast_to(
                viewdirs[:, None, :], (R, S, 3)
            ).reshape(R * S, 3)
            pe_dirs = positional_encoding(dirs, cfg.multires_views)
            feats = gather_image_features(flat, pose, intrinsic, feature_map,
                                          channels_first=True)
            att_in = jnp.concatenate([feats, pe_pts], axis=-1)[:, None, :]
            cond = apply_attsets(params["attsets"], att_in)  # (N, 512)
            raw = apply_point_conditioned(
                params["coarse_or_fine"], ncfg, pe_pts, pe_dirs, cond
            )
            return raw.reshape(R, S, 4)

        return fn

    def loss_fn(params, data, index, coords, key):
        pose = data["poses"][index]
        image = data["images"][index].astype(jnp.float32) / 255.0
        bc = data["bc_img"].astype(jnp.float32) / 255.0
        target = image[coords[:, 0], coords[:, 1]]
        bc_rgb = bc[coords[:, 0], coords[:, 1]]
        rays_o, rays_d = rays_at_coords(coords, focal, pose, cx, cy)

        embedded = positional_encoding(image, EMBED_IMG_MULTIRES)[None]
        feature_map = apply_face_unet(
            params["unet"], embedded, embed_ln=embedded.shape[-1]
        )[0]  # (C, H, W)

        def with_net(which):
            p = dict(params)
            p["coarse_or_fine"] = params[which]
            return field_fn(p, feature_map, pose)

        out = render_rays(
            with_net("coarse"), rays_o, rays_d, bc_rgb, near, far,
            render_cfg, key=key, fine_fn=with_net("fine"),
        )
        img_loss = jnp.mean((out["rgb_map"] - target) ** 2)
        loss = img_loss
        if "rgb0" in out:
            loss = loss + jnp.mean((out["rgb0"] - target) ** 2)
        return loss, {"img_loss": img_loss}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, global_step, data, index, key):
        k_sample, k_render = jax.random.split(key)
        coords = sample_ray_coords(
            k_sample, H, W, data["face_rects"][index],
            data["mouth_boxes"][index], data["torso_masks"][index], budget,
            approx=getattr(cfg, "sampler_approx", False),
        )
        # the frame's 68 landmark pixels lead the batch (get_data.py:133).
        # .lms rows are (x, y); coords are (row, col) = (y, x). (The
        # reference indexes the raw lms row-first — an x/y swap we do not
        # replicate.)
        lms = data["landmarks"][index]
        lm_rows = jnp.clip(jnp.round(lms[:, 1]), 0, H - 1).astype(jnp.int32)
        lm_cols = jnp.clip(jnp.round(lms[:, 0]), 0, W - 1).astype(jnp.int32)
        lm_coords = jnp.stack([lm_rows, lm_cols], axis=-1)
        coords = jnp.concatenate([lm_coords, coords], axis=0)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, index, coords, k_render
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0),
            "lr": lr_sched(global_step),
        }
        return params, opt_state, metrics

    return step


class UNetTrainer:
    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 seed: int = 0):
        self.cfg = cfg
        self.dataset = dataset
        self.data = dataset.to_device()
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.params = init_unet_params(k, cfg)
        self.optimizer = optax.adam(
            exponential_lr(cfg.lrate, cfg.lrate_decay), b1=0.9, b2=0.999
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self._step_fn = make_unet_train_step(cfg, dataset)

    def run(self, n_steps: int, log_every: int = 20, on_metrics=None):
        metrics = {}
        for _ in range(n_steps):
            index = self.step % self.dataset.size
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, m = self._step_fn(
                self.params, self.opt_state,
                jnp.asarray(self.step, jnp.int32), self.data, index, k,
            )
            if self.step % log_every == 0:
                metrics = {k2: float(v) for k2, v in m.items()}
                if on_metrics is not None:
                    on_metrics(self.step, metrics)
                else:
                    logger.info("[UNET] step %d loss %.5f psnr %.2f",
                                self.step, metrics["loss"], metrics["psnr"])
            self.step += 1
        return metrics
