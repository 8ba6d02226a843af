"""End-to-end: synthetic dataset -> on-device ray sampling -> head trainer
overfits (loss drops, PSNR rises) -> full-frame eval renders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data import (
    RayBudget, make_synthetic_dataset, rays_at_coords, sample_ray_coords,
)
from idealnerf_tpu.core.rays import get_rays
from idealnerf_tpu.eval.renderer import make_frame_renderer
from idealnerf_tpu.train.head import HeadTrainer


TINY = dict(
    dim_aud=64, dim_expr=8, dim_latent=32,
    N_rand=256, mouth_rays=32, torso_rays=32, sample_rate=0.9,
    N_samples=12, N_importance=12, lrate=5e-4, lrate_decay=500,
    nosmo_iters=10**9,
)


def test_ray_budget_split():
    b = RayBudget.from_config(3072, 512, 512, 0.95)
    assert b.mouth == 512 and b.torso == 512
    assert b.face == int(2048 * 0.95) and b.background == 2048 - b.face
    assert b.total == 3072


def test_sample_ray_coords_regions():
    key = jax.random.PRNGKey(0)
    H = W = 40
    face_rect = jnp.array([10, 8, 16, 20])     # x, y, w, h
    mouth_box = jnp.array([14.0, 20.0, 18.0, 24.0])
    torso = jnp.zeros((H, W), jnp.uint8).at[36:, :].set(1)
    b = RayBudget(face=64, background=32, mouth=16, torso=8)
    coords = np.asarray(sample_ray_coords(key, H, W, face_rect, mouth_box, torso, b))
    assert coords.shape == (120, 2)
    rows, cols = coords[:, 0], coords[:, 1]
    face_c = coords[:64]
    assert (face_c[:, 1] >= 10).all() and (face_c[:, 1] <= 26).all()
    assert (face_c[:, 0] >= 8).all() and (face_c[:, 0] <= 28).all()
    bg_c = coords[64:96]
    in_rect = (
        (bg_c[:, 1] >= 10) & (bg_c[:, 1] <= 26)
        & (bg_c[:, 0] >= 8) & (bg_c[:, 0] <= 28)
    )
    assert not in_rect.any()
    mouth_c = coords[96:112]
    assert (mouth_c[:, 1] >= 14).all() and (mouth_c[:, 1] <= 20).all()
    assert (mouth_c[:, 0] >= 18).all() and (mouth_c[:, 0] <= 24).all()
    torso_c = coords[112:]
    assert (torso_c[:, 0] >= 36).all()
    # no duplicate pixels within a region (sampling w/o replacement)
    face_ids = face_c[:, 0] * W + face_c[:, 1]
    assert len(np.unique(face_ids)) == 64


def test_sample_ray_coords_approx_mode():
    """approx=True (lax.approx_max_k sampler) keeps the region contract:
    distinct pixels, nearly all inside the requested mask (imperfect
    recall may misplace a few onto other pixels — emphasis, not
    correctness). On CPU approx_max_k falls back to exact; the property
    still holds."""
    key = jax.random.PRNGKey(3)
    H = W = 64
    face_rect = jnp.array([8, 8, 40, 40])
    mouth_box = jnp.array([20.0, 36.0, 24.0, 40.0])
    torso = jnp.zeros((H, W), jnp.uint8).at[56:, :].set(1)
    b = RayBudget(face=128, background=64, mouth=32, torso=16)
    coords = np.asarray(sample_ray_coords(
        key, H, W, face_rect, mouth_box, torso, b, approx=True))
    assert coords.shape == (240, 2)
    assert (coords >= 0).all() and (coords < 64).all()
    face_c = coords[:128]
    in_face = ((face_c[:, 1] >= 8) & (face_c[:, 1] <= 48)
               & (face_c[:, 0] >= 8) & (face_c[:, 0] <= 48))
    assert in_face.mean() >= 0.9, in_face.mean()
    face_ids = face_c[:, 0] * W + face_c[:, 1]
    assert len(np.unique(face_ids)) == 128      # still w/o replacement


def test_flat_optimizer_converges_identically():
    """optax.flatten-wrapped Adam performs the same per-element update:
    a few train steps from the same init give (near-)identical params."""
    import dataclasses

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.train import HeadTrainer

    base = dict(dim_aud=64, dim_expr=8, dim_latent=8, N_rand=64,
                mouth_rays=8, torso_rays=8, N_samples=6, N_importance=0,
                lrate=5e-4)
    ds = make_synthetic_dataset(n_frames=2, H=24, W=24, dim_expr=8)
    outs = []
    for flat in (False, True):
        cfg = ExperimentConfig(**base, flat_optimizer=flat)
        tr = HeadTrainer(cfg, ds, seed=0)
        tr.run(n_epochs=3, log_every=100, on_metrics=lambda s, m: None)
        outs.append(np.asarray(tr.state.params["coarse"]["pts"][0]["w"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-6)


def test_flat_optimizer_resume_migrates_layout(tmp_path):
    """A checkpoint written with the OTHER flat_optimizer layout resumes
    through HeadTrainer's migration fallback: momenta carry over exactly
    (ravel_pytree order) and training continues bit-identically to a
    same-layout resume."""
    import dataclasses

    from jax.flatten_util import ravel_pytree

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.train import HeadTrainer

    base = dict(dim_aud=64, dim_expr=8, dim_latent=8, N_rand=64,
                mouth_rays=8, torso_rays=8, N_samples=6, N_importance=0,
                lrate=5e-4)
    ds = make_synthetic_dataset(n_frames=2, H=24, W=24, dim_expr=8)
    for old_flat in (False, True):
        d = str(tmp_path / f"ck_{old_flat}")
        cfg_old = ExperimentConfig(**base, flat_optimizer=old_flat)
        tr = HeadTrainer(cfg_old, ds, seed=0, ckpt_dir=d)
        tr.run(n_epochs=3, log_every=100, on_metrics=lambda s, m: None)
        tr.save()
        mu_old = tr.state.opt_state[0].mu

        cfg_new = ExperimentConfig(**base, flat_optimizer=not old_flat)
        tr2 = HeadTrainer(cfg_new, ds, seed=0, ckpt_dir=d)
        assert tr2.global_step == tr.global_step
        mu_new = tr2.state.opt_state[0].mu
        np.testing.assert_allclose(
            np.asarray(ravel_pytree(mu_old)[0]),
            np.asarray(ravel_pytree(mu_new)[0]), rtol=0, atol=0)
        # continuing from the migrated state == a native-layout resume
        # (same seed => same ray stream; flat vs tree Adam is the same
        # per-element update, so only accumulation-order noise remains)
        tr3 = HeadTrainer(cfg_old, ds, seed=0, ckpt_dir=d)
        tr2.run(n_epochs=1, log_every=100, on_metrics=lambda s, m: None)
        tr3.run(n_epochs=1, log_every=100, on_metrics=lambda s, m: None)
        np.testing.assert_allclose(
            np.asarray(tr2.state.params["coarse"]["pts"][0]["w"]),
            np.asarray(tr3.state.params["coarse"]["pts"][0]["w"]),
            rtol=2e-4, atol=2e-6)


def test_rays_at_coords_matches_full_grid():
    H, W, focal, cx, cy = 24, 30, 50.0, 14.0, 11.0
    q = np.linalg.qr(np.random.RandomState(0).randn(3, 3))[0].astype(np.float32)
    c2w = jnp.asarray(np.concatenate([q, np.ones((3, 1), np.float32)], -1))
    full_o, full_d = get_rays(H, W, focal, c2w, cx, cy)
    coords = jnp.array([[0, 0], [5, 7], [23, 29], [11, 3]])
    o, d = rays_at_coords(coords, focal, c2w, cx, cy)
    for k, (r, c) in enumerate([(0, 0), (5, 7), (23, 29), (11, 3)]):
        np.testing.assert_allclose(np.asarray(o[k]), np.asarray(full_o[r, c]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d[k]), np.asarray(full_d[r, c]), rtol=1e-5, atol=1e-6)


def test_synthetic_dataset_consistency():
    ds = make_synthetic_dataset(n_frames=6, H=48, W=48, dim_expr=8)
    assert ds.images.shape == (6, 48, 48, 3)
    assert ds.poses.shape == (6, 3, 4)
    assert ds.exprs.shape == (6, 8)
    # pose is a valid rotation
    R = ds.poses[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera looks at the origin: sphere visible near image center
    cimg = ds.images[0, 20:28, 20:28]
    bg = ds.bc_img[20:28, 20:28]
    assert np.abs(cimg.astype(int) - bg.astype(int)).mean() > 10
    assert 0 < ds.near < ds.far


@pytest.mark.slow
def test_head_trainer_overfits_synthetic():
    cfg = ExperimentConfig(**TINY)
    ds = make_synthetic_dataset(n_frames=4, H=48, W=48, dim_expr=8)
    trainer = HeadTrainer(cfg, ds, seed=0)

    first = None
    history = []

    def capture(step, m):
        history.append(m)

    trainer.run(n_epochs=25, log_every=4, on_metrics=capture)
    first, last = history[0], history[-1]
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first, last)
    # PSNR is the signal: the latent-norm regularizer dominates total loss
    assert last["psnr"] > first["psnr"] + 4.0, (first, last)
    # lr decays monotonically
    assert last["lr"] < first["lr"]


def test_eval_frame_renderer_runs_and_composites_background():
    cfg = ExperimentConfig(**TINY)
    ds = make_synthetic_dataset(n_frames=2, H=32, W=32, dim_expr=8)
    trainer = HeadTrainer(cfg, ds, seed=0)
    nerf_cfg = cfg.face_nerf_config()
    render = make_frame_renderer(
        nerf_cfg, 32, 32, ds.focal, ds.near, ds.far, cfg.render_config(),
        cx=ds.cx, cy=ds.cy, tile=256,
    )
    from idealnerf_tpu.train.head import compute_aud_feature

    data = trainer.data
    aud = compute_aud_feature(
        trainer.state.params, data["auds"], data["aud_ids"], 0, cfg, False
    )
    frame = render(
        trainer.state.params, data["poses"][0],
        data["bc_img"].astype(jnp.float32) / 255.0,
        aud=aud, expr=data["exprs"][0], latent=trainer.state.latent_codes[0],
    )
    assert frame.shape == (32, 32, 3)
    assert jnp.isfinite(frame).all()


def test_export_roundtrip_through_loader(tmp_path):
    """write_reference_format -> load_transforms_dataset roundtrip: the
    on-disk subject reproduces poses/exprs/landmarks/audio and the
    images within jpg tolerance (the rehearsal pipeline's data path)."""
    from idealnerf_tpu.data.export import write_reference_format
    from idealnerf_tpu.data.dataset import load_transforms_dataset

    ds = make_synthetic_dataset(n_frames=6, H=48, W=48, dim_expr=5, seed=2)
    out = str(tmp_path / "subj")
    cfg_path = write_reference_format(ds, out, subject="t")
    assert cfg_path.endswith("HeadNeRF_config.txt")

    loaded = load_transforms_dataset(out, mode="train", gt_dirs="head_imgs")
    split = int(6 * 10 / 11)  # 5 train frames
    assert loaded.size == split
    np.testing.assert_allclose(loaded.poses, ds.poses[:split], atol=1e-5)
    np.testing.assert_allclose(loaded.exprs, ds.exprs[:split], atol=1e-5)
    np.testing.assert_allclose(loaded.landmarks, ds.landmarks[:split],
                               atol=0.01)
    np.testing.assert_array_equal(loaded.auds, ds.auds)
    err = np.abs(loaded.images.astype(np.int16)
                 - ds.images[:split].astype(np.int16)).mean()
    assert err < 6.0, f"jpg roundtrip error {err}"
    val = load_transforms_dataset(out, mode="val", gt_dirs="head_imgs")
    assert val.size == 6 - split

    # driving-clip export (round 5): train_fraction=1.0 puts ALL frames
    # in the train json — the held-out reenactment clip the temporal
    # gates are measured on (same geometry, fresh seed)
    drv = str(tmp_path / "drive")
    write_reference_format(ds, drv, subject="t", train_fraction=1.0)
    clip = load_transforms_dataset(drv, mode="train", gt_dirs="com_imgs")
    assert clip.size == 6
    np.testing.assert_allclose(clip.poses, ds.poses, atol=1e-5)
