"""Multi-chip trainer drivers behind the CLI mesh flags.

The reference exposes multi-GPU training only through nn.DataParallel
inside the trainer scripts (distribute_nerf.py:423, 457-462); here the
same entry points (cli/train_head.py, cli/train_torso.py) grow
``--data_devices/--ray_devices`` flags that route through these drivers:
a ('data', 'ray') Mesh, one frame per 'data' shard, each frame's ray
budget sharded over 'ray' (parallel/sharded.py), params/optimizer
replicated, gradient psum over ICI inserted by GSPMD.

API mirrors the single-chip HeadTrainer / TorsoTrainer (run/save/
global_step), so the CLIs switch implementation on the flag only.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.parallel.sharded import (
    make_sharded_torso_train_step, make_sharded_train_step,
)
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.train.state import init_train_state
from idealnerf_tpu.train.torso import init_torso_params
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.parallel")


def _check_divisible(cfg: ExperimentConfig, mesh: Mesh):
    n_ray = mesh.shape["ray"]
    if cfg.N_rand % n_ray:
        raise ValueError(
            f"N_rand={cfg.N_rand} must divide by the ray axis ({n_ray})"
        )


class ShardedHeadTrainer:
    """Data+ray-parallel head training: batch = one frame per 'data'
    shard per step (the measured-optimal v5e layout — sharded.py:48-54),
    sequential frame order within the batch dimension."""

    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 mesh: Mesh, seed: int = 0,
                 ckpt_dir: Optional[str] = None, resume: bool = True,
                 remat: bool = False):
        _check_divisible(cfg, mesh)
        self.cfg = cfg
        self.dataset = dataset
        self.mesh = mesh
        self.batch = mesh.shape["data"]
        self.remat = remat
        replicated = NamedSharding(mesh, P())
        self.data = jax.device_put(dataset.to_device(), replicated)
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        state = init_train_state(init_key, cfg, dataset.size)
        self.ckpt = None
        if ckpt_dir is not None:
            from idealnerf_tpu.ckpt import CheckpointManager

            self.ckpt = CheckpointManager(ckpt_dir)
            if resume and self.ckpt.latest_step() is not None:
                from idealnerf_tpu.train.state import restore_train_state

                state = restore_train_state(self.ckpt, state, cfg)
                logger.info("resumed from step %d", int(state.step))
        self.state = jax.device_put(state, replicated)
        self._steps: Dict[bool, Any] = {}

    @property
    def global_step(self) -> int:
        return int(self.state.step)

    def save(self):
        if self.ckpt is not None:
            self.ckpt.save(self.global_step, self.state)

    def _step_fn(self, smooth: bool):
        if smooth not in self._steps:
            self._steps[smooth] = make_sharded_train_step(
                self.cfg, self.dataset, self.mesh,
                smooth_audio=smooth, remat=self.remat,
            )
        return self._steps[smooth]

    def run(self, n_epochs: Optional[int] = None,
            log_every: Optional[int] = None, on_metrics=None):
        n_epochs = self.cfg.N_iters if n_epochs is None else n_epochs
        log_every = self.cfg.i_print if log_every is None else log_every
        size = self.dataset.size
        metrics: Dict[str, float] = {}
        t0 = time.time()
        # host-side step mirror (see train/head.py run): fetching
        # state.step per iteration is a blocking device round trip that
        # serializes the loop; keep the loop free of device reads so
        # dispatches pipeline.
        step = int(self.state.step)
        s0 = step  # exclude checkpoint-restored steps from rates
        t_log, s_log = t0, step
        with self.mesh:
            for epoch in range(n_epochs):
                for start in range(0, size, self.batch):
                    idx = (np.arange(start, start + self.batch) % size)
                    smooth = (
                        self.cfg.dim_aud > 29
                        and step >= self.cfg.nosmo_iters
                    )
                    step_fn = self._step_fn(smooth)
                    self.key, k = jax.random.split(self.key)
                    self.state, m = step_fn(
                        self.state, self.data,
                        jnp.asarray(idx, jnp.int32), k,
                    )
                    step += 1
                    if step % log_every == 0:
                        metrics = {k2: float(v) for k2, v in m.items()}
                        now = time.time()
                        metrics["steps_per_sec"] = (step - s0) / max(
                            now - t0, 1e-9
                        )
                        # sustained rate since the previous log point
                        metrics["steps_per_sec_rolling"] = (
                            (step - s_log) / max(now - t_log, 1e-9)
                        )
                        t_log, s_log = now, step
                        metrics["frames_per_step"] = float(self.batch)
                        if on_metrics is not None:
                            on_metrics(step, metrics)
                    if (
                        self.ckpt is not None
                        and step > 0
                        and step % self.cfg.i_weights == 0
                    ):
                        self.save()
        return metrics


class ShardedTorsoTrainer:
    """Data+ray-parallel torso training against a frozen, replicated
    head (train.torso semantics: only torso params receive updates)."""

    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 head_params: Dict[str, Any], mesh: Mesh,
                 latent_codes: Optional[jnp.ndarray] = None,
                 seed: int = 0, smooth_audio: bool = True,
                 ckpt_dir: Optional[str] = None, resume: bool = True):
        _check_divisible(cfg, mesh)
        self.cfg = cfg
        self.dataset = dataset
        self.mesh = mesh
        self.batch = mesh.shape["data"]
        replicated = NamedSharding(mesh, P())
        self.data = jax.device_put(dataset.to_device(), replicated)
        head_params = dict(head_params)
        head_params["latent_codes"] = latent_codes
        self.head_params = jax.device_put(head_params, replicated)
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        torso_params = init_torso_params(k, cfg)
        optimizer = optax.adam(
            exponential_lr(cfg.lrate, cfg.lrate_decay), b1=0.9, b2=0.999
        )
        opt_state = optimizer.init(torso_params)
        self.step = 0
        self.ckpt = None
        if ckpt_dir is not None:
            from idealnerf_tpu.ckpt import CheckpointManager

            self.ckpt = CheckpointManager(ckpt_dir)
            if resume and self.ckpt.latest_step() is not None:
                like = {"torso_params": torso_params,
                        "opt_state": opt_state,
                        "step": jnp.asarray(0, jnp.int32)}
                back = self.ckpt.restore(like)
                torso_params = back["torso_params"]
                opt_state = back["opt_state"]
                self.step = int(back["step"])
                logger.info("torso resumed from step %d", self.step)
        self.torso_params = jax.device_put(torso_params, replicated)
        self.opt_state = jax.device_put(opt_state, replicated)
        self._step_fn = make_sharded_torso_train_step(
            cfg, dataset, mesh, smooth_audio=smooth_audio
        )

    def save(self):
        if self.ckpt is not None:
            self.ckpt.save(self.step, {
                "torso_params": self.torso_params,
                "opt_state": self.opt_state,
                "step": jnp.asarray(self.step, jnp.int32),
            })

    def run(self, n_steps: int, log_every: int = 50, on_metrics=None):
        metrics: Dict[str, float] = {}
        size = self.dataset.size
        with self.mesh:
            for _ in range(n_steps):
                idx = (self.step * self.batch
                       + np.arange(self.batch)) % size
                self.key, k = jax.random.split(self.key)
                self.torso_params, self.opt_state, m = self._step_fn(
                    self.torso_params, self.opt_state, self.head_params,
                    jnp.asarray(self.step, jnp.int32), self.data,
                    jnp.asarray(idx, jnp.int32), k,
                )
                if self.step % log_every == 0:
                    metrics = {k2: float(v) for k2, v in m.items()}
                    if on_metrics is not None:
                        on_metrics(self.step, metrics)
                self.step += 1
        return metrics
