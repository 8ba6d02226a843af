"""Eval subsystem: metrics sanity, video writer output, cross-subject
reenactment driver end-to-end on synthetic subjects."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data import make_synthetic_dataset
from idealnerf_tpu.eval import VideoWriter, psnr, reenact, ssim
from idealnerf_tpu.eval.metrics import lpips
from idealnerf_tpu.eval.reenact import smoothed_audio_features
from idealnerf_tpu.train import HeadTrainer

TINY = dict(
    dim_aud=64, dim_expr=8, dim_latent=32,
    N_rand=256, mouth_rays=32, torso_rays=32, sample_rate=0.9,
    N_samples=10, N_importance=10, lrate=5e-4, nosmo_iters=10**9,
)


def test_psnr_ssim_basics():
    a = jnp.zeros((16, 16, 3))
    assert abs(float(psnr(a, a + 0.1)) - 20.0) < 1e-4
    assert abs(float(ssim(a + 0.5, a + 0.5)) - 1.0) < 1e-5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    assert float(ssim(x, y)) < 0.2  # independent noise ~ 0
    assert float(ssim(x, x)) > 0.99
    # bf16 frames (the TPU renderers' output dtype) must not blow up the
    # variance cancellation — SSIM stays in [-1, 1] and near the f32 value
    xb = x.astype(jnp.bfloat16)
    yn = jnp.clip(x + 0.02 * jnp.asarray(
        rng.standard_normal(x.shape).astype(np.float32)), 0, 1)
    s32, sbf = float(ssim(x, yn)), float(ssim(xb, yn))
    assert -1.0 <= sbf <= 1.0 and abs(sbf - s32) < 0.05


def test_cached_depth_band(tmp_path):
    """The tightened band memoizes per (field, ckpt step) — the probe is
    a per-checkpoint constant that costs minutes on-chip."""
    from idealnerf_tpu.eval.renderer import cached_depth_band

    calls = []

    def probe():
        calls.append(1)
        return (jnp.asarray(0.5), jnp.asarray(1.25))

    b1 = cached_depth_band(str(tmp_path), "head", 100, probe)
    b2 = cached_depth_band(str(tmp_path), "head", 100, probe)
    assert b1 == b2 == (0.5, 1.25) and len(calls) == 1
    # a different step or field re-probes
    cached_depth_band(str(tmp_path), "head", 200, probe)
    cached_depth_band(str(tmp_path), "torso", 100, probe)
    assert len(calls) == 3
    # cache_dir=None bypasses
    cached_depth_band(None, "head", 100, probe)
    assert len(calls) == 4


def test_lpips_gated():
    # must not crash without network; returns float or None
    out = lpips(np.zeros((32, 32, 3), np.float32), np.ones((32, 32, 3), np.float32))
    assert out is None or isinstance(out, float)


def test_video_writer(tmp_path):
    path = str(tmp_path / "out.avi")
    with VideoWriter(path, fps=25, frame_jpg_every=2) as w:
        for i in range(5):
            w.add(np.full((32, 32, 3), i * 50, np.uint8))
    assert os.path.exists(path) and os.path.getsize(path) > 0
    jpgs = [f for f in os.listdir(tmp_path) if f.endswith(".jpg")]
    assert len(jpgs) == 3  # frames 0, 2, 4


def test_smoothed_audio_features_shape():
    cfg = ExperimentConfig(**TINY)
    from idealnerf_tpu.train.state import init_train_state

    state = init_train_state(jax.random.PRNGKey(0), cfg, 4)
    auds = jnp.asarray(np.random.RandomState(0).randn(12, 16, 29), jnp.float32)
    feats = smoothed_audio_features(state.params, auds, cfg, smooth=True)
    assert feats.shape == (12, 64)
    raw = smoothed_audio_features(state.params, auds, cfg, smooth=False)
    assert raw.shape == (12, 64)
    assert not np.allclose(np.asarray(feats), np.asarray(raw))


def test_reenactment_cross_subject(tmp_path):
    """Subject A's trained head driven by subject B's audio+expressions."""
    cfg = ExperimentConfig(**TINY)
    subject_a = make_synthetic_dataset(n_frames=4, H=40, W=40, dim_expr=8, seed=0)
    subject_b = make_synthetic_dataset(n_frames=6, H=40, W=40, dim_expr=8, seed=99)

    trainer = HeadTrainer(cfg, subject_a, seed=0)
    trainer.run(n_epochs=10, log_every=100, on_metrics=lambda s, m: None)

    out = str(tmp_path / "reenact.avi")
    times: list = []
    frames = reenact(
        cfg, trainer.state.params, subject_a,
        driving_auds=subject_b.auds, driving_exprs=subject_b.exprs,
        latent_codes=trainer.state.latent_codes,
        out_path=out, max_frames=3, smooth_audio=False,
        use_pallas=False, compute_dtype=None, tile=400,
        frame_times=times,
    )
    # per-frame wall clock (steady-state fps comes from times[1:] — the
    # jitted renderer is a fresh closure per reenact() call)
    assert len(times) == 3 and all(t > 0 for t in times)
    assert frames.shape == (3, 40, 40, 3)
    assert np.isfinite(frames).all()
    assert os.path.getsize(out) > 0
    # driving audio actually changes the output
    frames2 = reenact(
        cfg, trainer.state.params, subject_a,
        driving_auds=subject_b.auds * -1.0, driving_exprs=subject_b.exprs,
        latent_codes=trainer.state.latent_codes,
        max_frames=3, smooth_audio=False, use_pallas=False,
        compute_dtype=None, tile=400,
    )
    assert np.abs(frames - frames2).max() > 1e-4


def test_reenact_mesh_matches_single_device():
    """reenact(mesh=...) routes through the ray-sharded renderers and
    reproduces the single-device frames (head-only and composite)."""
    from idealnerf_tpu.parallel import make_mesh
    from idealnerf_tpu.train.state import init_train_state
    from idealnerf_tpu.train.torso import init_torso_params

    cfg = ExperimentConfig(**TINY, density_activation="softplus")
    subject = make_synthetic_dataset(n_frames=3, H=24, W=24, dim_expr=8,
                                     seed=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg, subject.size)
    torso_params = init_torso_params(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh(n_ray=8, devices=jax.devices())

    for tp in (None, torso_params):
        kw = dict(driving_auds=subject.auds, driving_exprs=subject.exprs,
                  latent_codes=state.latent_codes, torso_params=tp,
                  max_frames=2, smooth_audio=False, use_pallas=False,
                  compute_dtype=None, tile=288)
        plain = reenact(cfg, state.params, subject, **kw)
        sharded = reenact(cfg, state.params, subject, mesh=mesh, **kw)
        np.testing.assert_allclose(sharded, plain, atol=1e-5)

    # frame-batched path: 'data' axis 4 x 'ray' axis 2, 3 frames (pads
    # the last batch), head-only and composite
    mesh_dr = make_mesh(n_data=4, n_ray=2, devices=jax.devices())
    for tp in (None, torso_params):
        kw = dict(driving_auds=subject.auds, driving_exprs=subject.exprs,
                  latent_codes=state.latent_codes, torso_params=tp,
                  max_frames=3, smooth_audio=False, use_pallas=False,
                  compute_dtype=None, tile=288)
        plain = reenact(cfg, state.params, subject, **kw)
        batched = reenact(cfg, state.params, subject, mesh=mesh_dr, **kw)
        np.testing.assert_allclose(batched, plain, atol=1e-4)

    with pytest.raises(ValueError, match="full fidelity"):
        reenact(cfg, state.params, subject, driving_auds=subject.auds,
                mesh=mesh, fast_keep=0.4)
    with pytest.raises(ValueError, match="use_prior"):
        reenact(cfg, state.params, subject, driving_auds=subject.auds,
                use_prior=True)


def test_field_occupancy_prior_zero_mass_cut(trained_head_torso, tmp_path):
    """Zero-foreground-mass ray cut (field_occupancy_prior): the cut is
    a subset of the geometric prior; rendering with the occupancy prior
    reproduces the base-prior masked render (cut rays composite the
    plate — exact by the plate-composite construction, the reference's
    raw2outputs rgb = Σw·rgb + last_weight·plate); disk cache
    roundtrips."""
    from idealnerf_tpu.eval.renderer import (
        cached_occupancy_prior, field_occupancy_prior, foreground_prior,
        make_pruned_frame_renderer,
    )
    from idealnerf_tpu.models.variants import variant_conditioning
    from idealnerf_tpu.train.head import compute_aud_feature

    fx = trained_head_torso
    cfg, ds, head = fx["cfg"], fx["ds_head"], fx["head"]
    H, W = ds.hw
    params = head.state.params
    base, k_base = foreground_prior(ds, margin=4)

    auds_d = jnp.asarray(ds.auds)
    ids_d = jnp.asarray(ds.aud_ids)
    conds, poses_p = [], []
    for i in range(3):
        aud = compute_aud_feature(params, auds_d, ids_d, i, cfg, False)
        conds.append(variant_conditioning(
            params, cfg, aud, jnp.asarray(ds.exprs[i])))
        poses_p.append(ds.poses[i])
    latent = head.state.latent_codes[0]

    occ, k_occ = field_occupancy_prior(
        cfg.face_nerf_config(), params, H, W, ds.focal, poses_p, conds,
        ds.near, ds.far, cfg.render_config(), base, cx=ds.cx, cy=ds.cy,
        thresh=1e-3, margin=2, latent=latent)
    assert occ.dtype == bool and occ.shape == (H, W)
    assert not (occ & ~base).any()          # strict subset of the prior
    assert occ.sum() > 0

    # the masked renders agree everywhere: inside occ both render the
    # same rays; on the CUT rays the trained field carries ~no mass, so
    # the base render composites (nearly) the plate there — which is
    # exactly what the occupancy render outputs
    kw = dict(cx=ds.cx, cy=ds.cy, tile=256, keep_fraction=0.5,
              keep_basis="frame")
    r_base = make_pruned_frame_renderer(
        cfg.face_nerf_config(), H, W, ds.focal, ds.near, ds.far,
        cfg.render_config(), prior_mask=jnp.asarray(base),
        k_coarse=k_base, **kw)
    r_occ = make_pruned_frame_renderer(
        cfg.face_nerf_config(), H, W, ds.focal, ds.near, ds.far,
        cfg.render_config(), prior_mask=jnp.asarray(occ),
        k_coarse=k_occ, **kw)
    aud0, expr0 = conds[0]
    bc = jnp.asarray(ds.bc_img, jnp.float32) / 255.0
    fa = np.asarray(r_base(params, jnp.asarray(ds.poses[0]), bc,
                           aud=aud0, expr=expr0, latent=latent))
    fo = np.asarray(r_occ(params, jnp.asarray(ds.poses[0]), bc,
                          aud=aud0, expr=expr0, latent=latent))
    cut = base & ~occ
    if cut.any():
        assert np.abs(fa - fo)[cut].max() < 0.05
    agree = -10.0 * np.log10(np.mean((fa - fo) ** 2) + 1e-12)
    assert agree > 35.0, agree

    # disk cache: first call computes + writes, second loads
    calls = []

    def compute():
        calls.append(1)
        return occ, k_occ

    m1, k1 = cached_occupancy_prior(str(tmp_path), 123, compute)
    m2, k2 = cached_occupancy_prior(str(tmp_path), 123, compute)
    assert len(calls) == 1 and (m1 == m2).all() and k1 == k2
    assert os.path.exists(tmp_path / "occ_prior_123.npy")


def test_pruned_renderer_keep_all_matches_full():
    """keep_fraction=1.0 must reproduce the full hierarchical render
    exactly (validates selection/scatter plumbing); lower fractions are a
    speed/quality trade documented in render_frame_pruned."""
    import jax

    from idealnerf_tpu.eval.renderer import render_frame, render_frame_pruned
    from idealnerf_tpu.models.face_nerf import make_field_fn
    from idealnerf_tpu.train.state import init_train_state

    cfg = ExperimentConfig(**TINY)
    ds = make_synthetic_dataset(n_frames=2, H=32, W=32, dim_expr=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, 2)
    ncfg = cfg.face_nerf_config()
    aud = jnp.ones((64,))
    cf = make_field_fn(state.params["coarse"], ncfg, aud, ds.exprs[0], state.latent_codes[0])
    ff = make_field_fn(state.params["fine"], ncfg, aud, ds.exprs[0], state.latent_codes[0])
    bc = jnp.asarray(ds.bc_img, jnp.float32) / 255.0
    pose = jnp.asarray(ds.poses[0])
    args = (32, 32, ds.focal, pose, bc, ds.near, ds.far, cfg.render_config())
    kw = dict(cx=ds.cx, cy=ds.cy, tile=256)
    full = render_frame(cf, *args, fine_fn=ff, **kw)
    pruned = render_frame_pruned(cf, ff, *args, keep_fraction=1.0, **kw)
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(full), atol=1e-5)
    half = render_frame_pruned(cf, ff, *args, keep_fraction=0.5, **kw)
    assert half.shape == (32, 32, 3) and jnp.isfinite(half).all()


def test_prior_masked_renderer_full_mask_matches_full():
    """All-true prior + keep_fraction=1.0 must equal the full render
    exactly; a partial prior still yields a valid image with plate pixels
    outside the prior."""
    import jax

    from idealnerf_tpu.eval.renderer import (
        foreground_prior, render_frame, render_frame_prior_masked,
    )
    from idealnerf_tpu.models.face_nerf import make_field_fn
    from idealnerf_tpu.train.state import init_train_state

    cfg = ExperimentConfig(**TINY)
    ds = make_synthetic_dataset(n_frames=2, H=32, W=32, dim_expr=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, 2)
    ncfg = cfg.face_nerf_config()
    aud = jnp.ones((64,))
    cf = make_field_fn(state.params["coarse"], ncfg, aud, ds.exprs[0],
                       state.latent_codes[0])
    ff = make_field_fn(state.params["fine"], ncfg, aud, ds.exprs[0],
                       state.latent_codes[0])
    bc = jnp.asarray(ds.bc_img, jnp.float32) / 255.0
    pose = jnp.asarray(ds.poses[0])
    args = (32, 32, ds.focal, pose, bc, ds.near, ds.far, cfg.render_config())
    full = render_frame(cf, *args, fine_fn=ff, cx=ds.cx, cy=ds.cy, tile=256)
    exact = render_frame_prior_masked(
        cf, ff, *args, jnp.ones((32, 32), bool), 1024,
        cx=ds.cx, cy=ds.cy, keep_fraction=1.0,
        coarse_tile=256, fine_tile=256,
    )
    np.testing.assert_allclose(np.asarray(exact), np.asarray(full), atol=1e-5)

    mask, kc = foreground_prior(ds, margin=2)
    assert 0 < kc <= 1024
    partial = render_frame_prior_masked(
        cf, ff, *args, jnp.asarray(mask), kc,
        cx=ds.cx, cy=ds.cy, keep_fraction=0.5,
        coarse_tile=256, fine_tile=256,
    )
    assert jnp.isfinite(partial).all()
    # k_coarse pads up to a tile multiple, so a few outside-prior rays
    # also get rendered; the REST must be exactly the plate
    outside = ~np.asarray(mask)
    n_padded = kc - int(np.asarray(mask).sum())
    eq_plate = (
        np.abs(np.asarray(partial)[outside] - np.asarray(bc)[outside]).max(-1)
        < 1e-6
    )
    assert (~eq_plate).sum() <= n_padded, ((~eq_plate).sum(), n_padded)
