"""AD-NeRF baseline trainer (reference: NeRFs/HeadNeRF/train/baseline.py
and its module-class twin head_baseline.py).

Differences from the paper head trainer, reproduced here:
- no expression or latent-code conditioning (dim_expr=0, dim_latent=0 —
  head_baseline.py:186-196);
- one random train frame per iteration instead of sequential epochs
  (baseline.py:578);
- central-crop ray warmup for the first precrop_iters steps
  (baseline.py:612-622);
- rect-stratified sampling with sample_rate, no mouth/torso budgets.

The reference keeps three separate Adam optimizers (net, audnet,
audattnet) at the same learning rate (baseline.py:500-505, 688-692); Adam
state is per-parameter, so a single Adam over the union is mathematically
identical — used here. (Disk reads inside the hot loop — baseline.py:580
imageio.imread per step — are replaced by the HBM-resident dataset.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.train.head import HeadTrainer


def baseline_config(cfg: ExperimentConfig) -> ExperimentConfig:
    """Strip conditioning to the baseline's: audio only."""
    return dataclasses.replace(
        cfg, dim_expr=0, dim_latent=0, mouth_rays=0, torso_rays=0,
        model_variant="face_nerf",
    )


class BaselineTrainer(HeadTrainer):
    def __init__(self, cfg: ExperimentConfig, dataset: FrameDataset,
                 seed: int = 0, ckpt_dir: Optional[str] = None,
                 resume: bool = True):
        super().__init__(baseline_config(cfg), dataset, seed=seed,
                         ckpt_dir=ckpt_dir, resume=resume)

    def run(self, n_epochs=None, log_every=None, on_metrics=None,
            frame_order: str = "random"):
        return super().run(n_epochs=n_epochs, log_every=log_every,
                           on_metrics=on_metrics, frame_order=frame_order)
