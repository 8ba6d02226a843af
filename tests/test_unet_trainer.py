"""GRF-style UNet-attention trainer (working realization of the
reference's unet_att_nerf path) learns on synthetic data; image tools
and diagnostics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data import make_synthetic_dataset
from idealnerf_tpu.train.unet import UNetTrainer, init_unet_params, unet_nerf_config
from idealnerf_tpu.utils.diagnostics import StepTimer, finite_check
from idealnerf_tpu.utils.image_tools import (
    blackout_background, crop_face, visualize_mouth_region,
)

TINY = dict(
    dim_aud=64, dim_expr=8, dim_latent=32,
    N_rand=196, mouth_rays=16, torso_rays=16, sample_rate=0.9,
    N_samples=8, N_importance=8, lrate=5e-4, nosmo_iters=10**9,
)


@pytest.mark.slow
def test_unet_trainer_learns():
    cfg = ExperimentConfig(**TINY)
    # 66² satisfies the UNet's 450-style stage alignment (see face_unet)
    ds = make_synthetic_dataset(n_frames=3, H=66, W=66, dim_expr=8)
    trainer = UNetTrainer(cfg, ds, seed=0)
    assert set(trainer.params) == {"unet", "attsets", "coarse", "fine"}
    assert unet_nerf_config(cfg).dim_aud == 512

    hist = []
    trainer.run(n_steps=31, log_every=15, on_metrics=lambda s, m: hist.append(m))
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["psnr"] > hist[0]["psnr"], hist


def test_image_tools():
    img = np.full((20, 20, 3), 120, np.uint8)
    parse = np.zeros((20, 20, 3), np.uint8)
    parse[5:10] = [255, 0, 0]
    out = blackout_background(img, parse)
    assert (out[5:10] == 120).all() and (out[0] == 0).all()

    crop = crop_face(img, [4, 4, 8, 8], size=16)
    assert crop.shape == (16, 16, 3)

    lms = np.zeros((68, 2))
    lms[48:, 0] = np.linspace(6, 12, 20)
    lms[48:, 1] = np.linspace(8, 11, 20)
    vis = visualize_mouth_region(img, lms, margin=2)
    assert (vis != img).any()


def test_finite_check_and_timer():
    tree = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))], "n": jnp.array(3)}
    assert float(finite_check(tree)) == 1.0
    tree["a"] = tree["a"].at[0].set(jnp.nan)
    assert float(finite_check(tree)) == 0.0

    t = StepTimer(warmup=1)
    out = {}
    for _ in range(4):
        out = t.tick(fetch=jnp.ones(()))
    assert out["steps_per_sec"] > 0
