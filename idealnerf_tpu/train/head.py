"""Head trainer — the paper model (reference:
NeRFs/HeadNeRF/train/audio_exp_nerf.py).

Semantics parity: FaceNeRF coarse+fine conditioned on aud(dim_aud) +
expr(dim_expr) + per-frame latent(32); region-stratified ray budget
(mouth/torso/face/background); loss = MSE(fine) + MSE(coarse) +
10·lc_weight·‖latent‖ (:540-548); Adam over params+latents with
exponential decay (:554-558); AudioNet → AudioAttNet smoothing switch at
nosmo_iters (:242-269).

TPU-native structure: the entire step — frame gather, ray sampling, audio
encoding, hierarchical render, backward, adam — is ONE jitted XLA program
over HBM-resident data. The nosmo switch is two compiled programs selected
by the driver (a one-time recompile instead of per-step python branching).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.data.sampler import RayBudget, rays_at_coords, sample_ray_coords
from idealnerf_tpu.core.render import render_rays
from idealnerf_tpu.models.audio_net import (
    apply_audio_att_net, apply_audio_net, apply_ds_aud_net,
)
from idealnerf_tpu.models.variants import build_field_fns
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.train.state import TrainState, init_train_state, make_optimizer
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf")


def compute_aud_feature(
    params: Dict[str, Any],
    auds: jnp.ndarray,        # (M, 16, 29) raw DeepSpeech windows
    aud_ids: jnp.ndarray,     # (N,) per-frame window index
    index,                    # frame index (traced scalar ok)
    cfg: ExperimentConfig,
    smooth: bool,
) -> jnp.ndarray:
    """Per-frame audio conditioning vector.

    Mirrors audio_exp_nerf.py:241-269: dim_aud>29 selects AudioNet (with
    AudioAttNet smoothing over smo_size neighboring frames once
    ``smooth``), else the DeepSpeechAudNet ablation path. The smoothing
    window indexes *frames* with zero padding at sequence edges.
    """
    if cfg.dim_aud <= 29:
        return apply_ds_aud_net(params["ds_aud"], auds[aud_ids[index]][None])[0]
    if not smooth:
        return apply_audio_net(
            params["aud_net"], auds[aud_ids[index]][None], win_size=cfg.win_size
        )[0]
    n = aud_ids.shape[0]
    half = cfg.smo_size // 2
    idx = index - half + jnp.arange(cfg.smo_size)
    valid = (idx >= 0) & (idx < n)
    windows = auds[aud_ids[jnp.clip(idx, 0, n - 1)]]
    windows = jnp.where(valid[:, None, None], windows, 0.0)
    feats = apply_audio_net(params["aud_net"], windows, win_size=cfg.win_size)
    return apply_audio_att_net(params["aud_att"], feats)


def train_use_pallas(cfg: ExperimentConfig):
    """The train-step MLP path selected by cfg.train_fused (TPU only):
    0 = XLA autodiff, 1 = fused kernel with exact f32 backward,
    2 = fused kernel with bf16 backward (kernels/fused_mlp_grad.py)."""
    if cfg.train_fused and jax.default_backend() == "tpu":
        return "train_bf16" if cfg.train_fused >= 2 else "train"
    return False


def make_frame_loss(cfg: ExperimentConfig, dataset: FrameDataset,
                    smooth_audio: bool):
    """Single-frame loss ``loss_fn((params, latents), data, index, coords,
    key) -> (loss, aux)`` — shared by the single-chip step (jit) and the
    multi-chip batched step (vmap over frames + ray sharding,
    parallel/sharded.py)."""
    focal, cx, cy = dataset.focal, dataset.cx, dataset.cy
    near, far = dataset.near, dataset.far
    render_cfg = cfg.render_config()

    def loss_fn(diff, data, index, coords, key):
        params, latent_codes = diff
        aud = compute_aud_feature(
            params, data["auds"], data["aud_ids"], index, cfg, smooth_audio
        )
        expr = data["exprs"][index] if cfg.dim_expr > 0 else None
        latent = latent_codes[index] if cfg.dim_latent > 0 else None

        pose = data["poses"][index]
        rays_o, rays_d = rays_at_coords(coords, focal, pose, cx, cy)
        image = data["images"][index].astype(jnp.float32) / 255.0
        bc = data["bc_img"].astype(jnp.float32) / 255.0
        target = image[coords[:, 0], coords[:, 1]]
        bc_rgb = bc[coords[:, 0], coords[:, 1]]

        use_pallas = train_use_pallas(cfg)
        coarse_fn, fine_fn = build_field_fns(params, cfg, aud, expr, latent,
                                             use_pallas=use_pallas)
        out = render_rays(
            coarse_fn, rays_o, rays_d, bc_rgb, near, far, render_cfg,
            key=key, fine_fn=fine_fn,
        )

        img_loss = jnp.mean((out["rgb_map"] - target) ** 2)
        loss = img_loss
        if "rgb0" in out:
            loss = loss + jnp.mean((out["rgb0"] - target) ** 2)
        latent_loss = 0.0
        if cfg.dim_latent > 0:
            latent_loss = jnp.linalg.norm(latent) * cfg.lc_weight
            loss = loss + latent_loss * 10.0
        return loss, {"img_loss": img_loss, "latent_loss": latent_loss}

    return loss_fn


def make_head_train_step(
    cfg: ExperimentConfig,
    dataset: FrameDataset,
    smooth_audio: bool,
    precrop: bool = False,
):
    """Build the jitted single-chip train step.

    ``precrop`` reproduces the baseline warmup (baseline.py:612-622): all
    rays come from the central precrop_frac crop; the driver switches to
    the full budget after precrop_iters (a one-time recompile)."""
    H, W = dataset.hw
    if precrop:
        dH = int(H // 2 * cfg.precrop_frac)
        dW = int(W // 2 * cfg.precrop_frac)
        budget = RayBudget(face=cfg.N_rand, background=0, mouth=0, torso=0)
        crop_rect = jnp.array(
            [W // 2 - dW, H // 2 - dH, 2 * dW - 1, 2 * dH - 1], jnp.int32
        )
    else:
        budget = RayBudget.from_config(
            cfg.N_rand, cfg.mouth_rays, cfg.torso_rays, cfg.sample_rate
        )
    optimizer = make_optimizer(cfg)
    lr_sched = exponential_lr(cfg.lrate, cfg.lrate_decay)
    loss_fn = make_frame_loss(cfg, dataset, smooth_audio)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, data, index, key):
        k_sample, k_render = jax.random.split(key)
        face_rect = crop_rect if precrop else data["face_rects"][index]
        coords = sample_ray_coords(
            k_sample, H, W,
            face_rect, data["mouth_boxes"][index],
            data["torso_masks"][index], budget,
            approx=getattr(cfg, "sampler_approx", False),
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.latent_codes), data, index, coords, k_render
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.latent_codes)
        )
        params, latents = optax.apply_updates(
            (state.params, state.latent_codes), updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            latent_codes=latents,
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log(aux["img_loss"]) / jnp.log(10.0),
            "latent_loss": aux["latent_loss"],
            "lr": lr_sched(state.step),
        }
        return new_state, metrics

    return train_step


class HeadTrainer:
    """Python driver: epochs over frames (sequential order, matching the
    reference's shuffle=False DataLoader — audio_exp_nerf.py:467), periodic
    logging, nosmo→smooth recompile, checkpointing via ckpt.manager."""

    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 seed: int = 0, ckpt_dir: Optional[str] = None,
                 resume: bool = True):
        self.cfg = cfg
        self.dataset = dataset
        self.data = dataset.to_device()
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.state = init_train_state(init_key, cfg, dataset.size)
        self._steps = {}
        self.ckpt = None
        if ckpt_dir is not None:
            from idealnerf_tpu.ckpt import CheckpointManager

            self.ckpt = CheckpointManager(ckpt_dir)
            if resume and self.ckpt.latest_step() is not None:
                # restore with opt_state layout migration: checkpoints
                # written under the other cfg.flat_optimizer setting
                # convert momenta exactly instead of failing
                from idealnerf_tpu.train.state import restore_train_state

                self.state = restore_train_state(self.ckpt, self.state,
                                                 cfg)
                logger.info("resumed from step %d", self.global_step)
            elif cfg.ft_path:
                # fine-tune surgery: load foreign checkpoint params with
                # shape-mismatch drop (audio_exp_nerf.py:498-514)
                from idealnerf_tpu.ckpt import CheckpointManager as CM
                from idealnerf_tpu.ckpt import partial_restore

                src = CM(cfg.ft_path)
                raw = src.restore_partial(
                    {"params": self.state.params}
                )[0]
                self.state = self.state._replace(params=raw["params"])
                logger.info("fine-tune init from %s", cfg.ft_path)

    def save(self):
        if self.ckpt is not None:
            self.ckpt.save(self.global_step, self.state)

    def _step_fn(self, smooth: bool, precrop: bool = False):
        key = (smooth, precrop)
        if key not in self._steps:
            self._steps[key] = make_head_train_step(
                self.cfg, self.dataset, smooth, precrop=precrop
            )
        return self._steps[key]

    @property
    def global_step(self) -> int:
        return int(self.state.step)

    def run(self, n_epochs: Optional[int] = None, log_every: Optional[int] = None,
            on_metrics=None, frame_order: str = "sequential") -> Dict[str, float]:
        n_epochs = self.cfg.N_iters if n_epochs is None else n_epochs
        log_every = self.cfg.i_print if log_every is None else log_every
        metrics = {}
        t0 = time.time()
        rng = np.random.RandomState(0)
        # host-side step mirror: ``self.global_step`` fetches
        # ``state.step`` from the device, which through a remote-TPU
        # tunnel is a blocking round trip that serializes the step loop
        # (measured 11.5 steps/s vs 23.6 for the bare step). The loop
        # must never touch device data between log points so dispatches
        # pipeline ahead of execution.
        step = int(self.state.step)
        s0 = step  # exclude checkpoint-restored steps from rates
        t_log, s_log = t0, step
        for epoch in range(n_epochs):
            if frame_order == "random":
                # baseline.py:578 — one random train frame per iteration
                order = rng.randint(0, self.dataset.size, size=self.dataset.size)
            else:
                order = range(self.dataset.size)
            for index in order:
                index = int(index)
                smooth = (
                    self.cfg.dim_aud > 29 and step >= self.cfg.nosmo_iters
                )
                precrop = step < self.cfg.precrop_iters
                step_fn = self._step_fn(smooth, precrop)
                self.key, k = jax.random.split(self.key)
                self.state, m = step_fn(self.state, self.data, index, k)
                step += 1
                if step % log_every == 0:
                    metrics = {k2: float(v) for k2, v in m.items()}
                    now = time.time()
                    metrics["steps_per_sec"] = (
                        (step - s0) / max(now - t0, 1e-9)
                    )
                    # sustained rate since the previous log point
                    # (excludes compile/restore stalls before t_log)
                    metrics["steps_per_sec_rolling"] = (
                        (step - s_log) / max(now - t_log, 1e-9)
                    )
                    t_log, s_log = now, step
                    if on_metrics is not None:
                        on_metrics(step, metrics)
                    else:
                        logger.info(
                            "[TRAIN] epoch %d step %d loss %.5f psnr %.2f lr %.2e",
                            epoch, step, metrics["loss"],
                            metrics["psnr"], metrics["lr"],
                        )
                if (
                    self.ckpt is not None
                    and step > 0
                    and step % self.cfg.i_weights == 0
                ):
                    self.save()
        return metrics
