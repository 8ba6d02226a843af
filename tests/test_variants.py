"""Attention/aggregation model family: module math, variant trainers
(agg + self-attention) learning on synthetic data, UNet shape pipeline,
point projection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data import make_synthetic_dataset
from idealnerf_tpu.models.attention import (
    apply_attsets, apply_self_attention, apply_slot_attention,
    init_attsets, init_self_attention, init_slot_attention,
)
from idealnerf_tpu.models.face_unet import apply_face_unet, init_face_unet
from idealnerf_tpu.models.projection import gather_image_features, project_points
from idealnerf_tpu.models.variants import (
    build_field_fns, init_variant_extras, variant_nerf_config,
)
from idealnerf_tpu.train import HeadTrainer
from idealnerf_tpu.train.state import init_train_state

TINY = dict(
    dim_aud=64, dim_expr=8, dim_latent=32,
    N_rand=256, mouth_rays=32, torso_rays=32, sample_rate=0.9,
    N_samples=12, N_importance=12, lrate=5e-4, nosmo_iters=10**9,
)


# ----------------------------------------------------------- modules

def test_self_attention_shapes_and_residual():
    p = init_self_attention(jax.random.PRNGKey(0), input_ch=143)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 143))
    y = apply_self_attention(p, x)
    assert y.shape == (7, 143)
    # broadcast-identical rows -> identical outputs (per-frame constant),
    # the property the trainer exploits to fold conditioning
    xs = jnp.tile(x[:1], (5, 1))
    ys = apply_self_attention(p, xs)
    np.testing.assert_allclose(np.asarray(ys - ys[0]), 0, atol=1e-5)
    y1 = apply_self_attention(p, x[:1])
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y1[0]), atol=1e-5)


def test_attsets_pooling():
    p = init_attsets(jax.random.PRNGKey(0), input_ch=57, attention_output_length=512)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 57))
    out = apply_attsets(p, x)
    assert out.shape == (4, 512)
    # permutation-invariant over the view axis (softmax-pool property)
    perm = x[:, ::-1, :]
    np.testing.assert_allclose(
        np.asarray(apply_attsets(p, perm)), np.asarray(out), atol=1e-4
    )


def test_slot_attention():
    p = init_slot_attention(jax.random.PRNGKey(0), dim=64, input_ch=57, embed_ch=91)
    inputs = jnp.ones((5, 12, 57))
    embed = jnp.ones((5, 12, 91))
    out = apply_slot_attention(p, inputs, embed, num_slots=4,
                               key=jax.random.PRNGKey(2))
    assert out.shape == (5, 4 * 64)
    assert jnp.isfinite(out).all()


def test_face_unet_450_pipeline_shapes():
    embed_ln = 66
    p = init_face_unet(jax.random.PRNGKey(0), input_ch=embed_ln)
    x = jnp.ones((1, 450, 450, embed_ln))
    out = apply_face_unet(p, x, embed_ln=embed_ln)
    # 128 decoder channels + embed_ln carried through, back at 450²
    assert out.shape == (1, 128 + embed_ln, 450, 450)


def test_project_points_center():
    # a point straight ahead of an identity camera projects near (cy, cx)
    H = W = 40
    intr = jnp.array([[50.0, 0, 20.0], [0, 50.0, 20.0], [0, 0, 1.0]])
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [1.0]])], 1)
    pts = jnp.array([[0.0, 0.0, 0.5]])  # 0.5 in front (camera looks -z... z<cam)
    idx = project_points(pts, pose, intr, H, W)
    assert idx.shape == (1, 2)
    assert 0 <= int(idx[0, 0]) < H and 0 <= int(idx[0, 1]) < W
    feats = gather_image_features(
        pts, pose, intr, jnp.ones((H, W, 194))
    )
    assert feats.shape == (1, 196)  # 194 + 2 indices (helper.py:368)


# ----------------------------------------------------------- variants

@pytest.mark.parametrize("variant", ["face_nerf_agg", "attention_nerf"])
@pytest.mark.slow
def test_variant_trainers_learn(variant):
    cfg = ExperimentConfig(model_variant=variant, **TINY)
    ncfg = variant_nerf_config(cfg)
    if variant == "face_nerf_agg":
        assert ncfg.dim_aud == 0 and ncfg.dim_expr == cfg.dim_agg
    else:
        assert ncfg.dim_aud == 64 + 8 and ncfg.dim_expr == 0

    ds = make_synthetic_dataset(n_frames=4, H=40, W=40, dim_expr=8)
    trainer = HeadTrainer(cfg, ds, seed=0)
    extras = init_variant_extras(jax.random.PRNGKey(0), cfg)
    for k in extras:
        assert k in trainer.state.params

    hist = []
    trainer.run(n_epochs=25, log_every=8, on_metrics=lambda s, m: hist.append(m))
    assert hist[-1]["psnr"] > hist[0]["psnr"] + 3.0, (variant, hist[0], hist[-1])


def test_variant_field_fns_differ_from_plain():
    """The agg/attention conditioning paths actually change the field."""
    ds = make_synthetic_dataset(n_frames=2, H=24, W=24, dim_expr=8)
    pts = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    outs = {}
    for variant in ("face_nerf", "face_nerf_agg", "attention_nerf"):
        cfg = ExperimentConfig(model_variant=variant, **TINY)
        state = init_train_state(jax.random.PRNGKey(3), cfg, 2)
        coarse, fine = build_field_fns(
            state.params, cfg, jnp.ones((64,)), jnp.ones((8,)), jnp.ones((32,))
        )
        outs[variant] = np.asarray(coarse(pts, dirs))
        assert outs[variant].shape == (4, 3, 4)
    assert not np.allclose(outs["face_nerf"], outs["face_nerf_agg"])
    assert not np.allclose(outs["face_nerf"], outs["attention_nerf"])


def test_unknown_variant_raises():
    cfg = ExperimentConfig(model_variant="bogus", **TINY)
    with pytest.raises(ValueError, match="bogus"):
        variant_nerf_config(cfg)
