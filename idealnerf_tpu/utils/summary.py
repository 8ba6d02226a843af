"""Experiment observability (reference: TensorBoard SummaryWriter scalars
train/loss, train/psnr, train/learning_rate, train/latent_code_loss +
val image panels — audio_exp_nerf.py:560-580).

Writes TensorBoard events when torch's SummaryWriter is importable (torch
is a baked dependency here) and always writes a JSONL metrics stream —
machine-readable without TB."""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class SummaryWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(logdir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, "time": time.time()}
        rec.update({f"{prefix}/{k}": float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), global_step=step)

    def image(self, step: int, tag: str, img: np.ndarray):
        """img (H, W, 3) float [0,1]; saved as jpg + TB image panel."""
        import imageio.v2 as imageio

        img8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(
            os.path.join(self.logdir, f"{tag.replace('/', '_')}_{step:08d}.jpg"),
            img8,
        )
        if self._tb is not None:
            self._tb.add_image(tag, img8.transpose(2, 0, 1), global_step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
