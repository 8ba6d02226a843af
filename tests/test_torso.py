"""Torso/composite system: torso signal construction, frozen-head torso
training on com_imgs (composite loss drops), and the layered full-frame
composite renderer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.core.composite import layered_composite
from idealnerf_tpu.data import make_synthetic_dataset
from idealnerf_tpu.eval.renderer import make_composite_frame_renderer
from idealnerf_tpu.train import HeadTrainer
from idealnerf_tpu.train.head import compute_aud_feature
from idealnerf_tpu.train.torso import (
    TORSO_POSE_PE, TorsoTrainer, torso_nerf_config, torso_signal,
)

TINY = dict(
    dim_aud=64, dim_expr=8, dim_latent=32, dim_aud_body=32,
    N_rand=256, mouth_rays=32, torso_rays=32, sample_rate=0.9,
    N_samples=10, N_importance=10, lrate=5e-4, nosmo_iters=10**9,
    # relu density lets the frozen-head torso collapse to permanent
    # transparency (dead density gradient); softplus keeps it alive
    density_activation="softplus",
)


def test_depth_range_functions_return_valid_bounds():
    """subject_depth_range / torso_depth_range return a sub-interval of
    [near, far] with near' < far' on arbitrary (untrained) fields."""
    from idealnerf_tpu.eval.renderer import (
        subject_depth_range, torso_depth_range,
    )
    from idealnerf_tpu.train.state import init_train_state
    from idealnerf_tpu.train.torso import init_torso_params

    cfg = ExperimentConfig(**TINY)
    ds = make_synthetic_dataset(n_frames=3, H=24, W=24, dim_expr=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    tp = init_torso_params(jax.random.PRNGKey(1), cfg)
    for lo, hi in (
        subject_depth_range(cfg, state.params, state.latent_codes, ds,
                            n_frames=2),
        torso_depth_range(cfg, tp, state.params, ds, n_frames=2),
    ):
        assert ds.near <= lo < hi <= ds.far, (lo, hi)


def test_torso_signal_dims():
    cfg = ExperimentConfig(**TINY)
    aud = jnp.ones((64,))
    pose = jnp.eye(4)[:3]
    sig = torso_signal(aud, pose, cfg.dim_aud_body)
    assert sig.shape == (32 + TORSO_POSE_PE,)
    assert TORSO_POSE_PE == 42  # 2 × pe_dim(3, 3), run_nerf.py:421
    tcfg = torso_nerf_config(cfg)
    assert tcfg.dim_aud == 32 + 42 and tcfg.dim_expr == 0 and tcfg.dim_latent == 0


def test_layered_composite_limits():
    rgb_head = jnp.ones((5, 3)) * 0.8
    # transparent torso (last_weight=1, fg=0) -> pure head
    out = layered_composite(rgb_head, jnp.ones(5), jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(out), 0.8, atol=1e-6)
    # opaque torso -> pure torso fg
    fg = jnp.ones((5, 3)) * 0.3
    out = layered_composite(rgb_head, jnp.zeros(5), fg)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-6)


def test_torso_trainer_learns_composite(trained_head_torso):
    # shared session fixture (conftest.trained_head_torso): head 20
    # epochs + torso 121 steps at TINY config, seeds 0/1 — the same
    # training this test ran inline before round 4
    cfg = trained_head_torso["cfg"]
    ds_head = trained_head_torso["ds_head"]
    ds_com = trained_head_torso["ds_com"]
    head = trained_head_torso["head"]
    torso = trained_head_torso["torso"]
    hist = trained_head_torso["torso_hist"]
    # the com frames really differ from head frames (torso band present)
    assert np.abs(ds_com.images[0].astype(int) - ds_head.images[0].astype(int)).max() > 30
    assert hist[-1]["psnr"] > hist[0]["psnr"] + 1.5, (hist[0], hist[-1])
    # frozen head: params untouched by torso training
    h0 = head.state.params["coarse"]["pts"][0]["w"]
    np.testing.assert_array_equal(
        np.asarray(h0), np.asarray(torso.head_params["coarse"]["pts"][0]["w"])
    )

    # full-frame composite render
    tcfg = torso_nerf_config(cfg)
    render = make_composite_frame_renderer(
        cfg.face_nerf_config(), tcfg, 48, 48, ds_com.focal,
        ds_com.near, ds_com.far, cfg.render_config(),
        cx=ds_com.cx, cy=ds_com.cy, tile=576,
    )
    data = torso.data
    aud = compute_aud_feature(head.state.params, data["auds"], data["aud_ids"],
                              0, cfg, False)
    sig = torso_signal(aud, data["poses"][0], cfg.dim_aud_body)
    frame = render(
        head.state.params, torso.torso_params,
        data["poses"][0], data["poses"][0],
        data["bc_img"].astype(jnp.float32) / 255.0,
        aud=aud, signal=sig, expr=data["exprs"][0],
        latent=head.state.latent_codes[0],
    )
    assert frame.shape == (48, 48, 3)
    gt = ds_com.images[0].astype(np.float32) / 255.0
    psnr = -10 * np.log10(float(jnp.mean((frame - gt) ** 2)))
    assert psnr > 14.0, psnr


@pytest.mark.slow
def test_composite_fast_renderer_matches_full():
    """make_composite_fast_renderer at keep=1.0 (unmasked and all-true
    prior) must reproduce the full fused composite exactly; pruned +
    partial-prior output stays finite and equals the plate outside the
    prior (the trained-field assumption the fast mode rests on)."""
    from idealnerf_tpu.eval.renderer import make_composite_fast_renderer
    from idealnerf_tpu.models.face_nerf import init_face_nerf

    H = W = 32
    focal, cx, cy = 48.0, 16.0, 16.0
    near, far = 0.5, 1.5
    cfg = ExperimentConfig(dim_aud=16, dim_expr=8, dim_latent=4,
                           N_samples=16, N_importance=16)
    ncfg = cfg.face_nerf_config()
    tcfg = ExperimentConfig(dim_aud=20, dim_expr=0, dim_latent=0,
                            N_samples=16, N_importance=16).face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    hp = {"coarse": init_face_nerf(ks[0], ncfg),
          "fine": init_face_nerf(ks[1], ncfg)}
    tp = {"coarse": init_face_nerf(ks[2], tcfg),
          "fine": init_face_nerf(ks[3], tcfg)}
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[0.], [0.], [0.9]])], 1)
    pose0 = jnp.concatenate([jnp.eye(3), jnp.array([[0.05], [0.], [0.95]])], 1)
    bc = jax.random.uniform(ks[4], (H, W, 3))
    aud = jax.random.normal(ks[5], (16,))
    expr = jax.random.normal(ks[6], (8,))
    sig = jax.random.normal(ks[7], (20,))
    lat = jnp.ones((4,))
    rc = cfg.render_config()
    kw = dict(cx=cx, cy=cy)
    call = dict(aud=aud, signal=sig, expr=expr, latent=lat)

    full = make_composite_frame_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, use_pallas="ray", **kw)
    ref = full(hp, tp, pose, pose0, bc, **call)

    exact = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        keep_head=1.0, keep_torso=1.0, **kw)
    np.testing.assert_allclose(
        np.asarray(exact(hp, tp, pose, pose0, bc, **call)),
        np.asarray(ref), atol=2e-5)

    exact_m = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        prior_mask=jnp.ones((H, W), bool), k_coarse=H * W,
        keep_head=1.0, keep_torso=1.0, **kw)
    np.testing.assert_allclose(
        np.asarray(exact_m(hp, tp, pose, pose0, bc, **call)),
        np.asarray(ref), atol=2e-5)

    mask = np.zeros((H, W), bool)
    mask[4:30, 6:26] = True
    kc = ((int(mask.sum()) + 255) // 256) * 256
    fast = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        prior_mask=jnp.asarray(mask), k_coarse=kc,
        keep_head=0.5, keep_torso=0.5, **kw)
    out = np.asarray(fast(hp, tp, pose, pose0, bc, **call))
    assert np.isfinite(out).all()
    outside = ~mask
    n_padded = kc - int(mask.sum())
    eq_plate = np.abs(out[outside] - np.asarray(bc)[outside]).max(-1) < 1e-6
    assert (~eq_plate).sum() <= n_padded, ((~eq_plate).sum(), n_padded)

    # per-field priors (round 3): all-true per-field masks must equal
    # the full fused composite exactly at keep=1.0 (the index maps are
    # identities there in effect, but exercise the per_field code path)
    exact_pf = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        prior_mask_head=jnp.ones((H, W), bool),
        prior_mask_torso=jnp.ones((H, W), bool),
        keep_head=1.0, keep_torso=1.0, **kw)
    np.testing.assert_allclose(
        np.asarray(exact_pf(hp, tp, pose, pose0, bc, **call)),
        np.asarray(ref), atol=2e-5)

    # per-field bounds plumbing (round 3): identity bounds must change
    # nothing at keep=1.0; genuinely tightened bounds stay finite
    exact_b = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        keep_head=1.0, keep_torso=1.0,
        bounds_head=(near, far), bounds_torso=(near, far), **kw)
    np.testing.assert_allclose(
        np.asarray(exact_b(hp, tp, pose, pose0, bc, **call)),
        np.asarray(ref), atol=2e-5)
    tight_b = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        keep_head=0.5, keep_torso=0.5,
        bounds_head=(near + 0.1, far - 0.2),
        bounds_torso=(near + 0.05, far - 0.1), **kw)
    assert np.isfinite(
        np.asarray(tight_b(hp, tp, pose, pose0, bc, **call))).all()

    # distinct overlapping per-field supports: finite everywhere,
    # plate outside the union (modulo the tile-padding rays)
    mask_h = np.zeros((H, W), bool)
    mask_h[4:20, 6:26] = True
    mask_t = np.zeros((H, W), bool)
    mask_t[14:30, 4:28] = True
    fast_pf = make_composite_fast_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc,
        prior_mask_head=jnp.asarray(mask_h),
        prior_mask_torso=jnp.asarray(mask_t),
        keep_head=0.5, keep_torso=0.5, **kw)
    out_pf = np.asarray(fast_pf(hp, tp, pose, pose0, bc, **call))
    assert np.isfinite(out_pf).all()
    union = mask_h | mask_t
    ku = min(H * W, ((int(union.sum()) + 255) // 256) * 256)
    n_padded_u = ku - int(union.sum())
    eq_plate_u = np.abs(
        out_pf[~union] - np.asarray(bc)[~union]).max(-1) < 1e-6
    assert (~eq_plate_u).sum() <= n_padded_u, (
        (~eq_plate_u).sum(), n_padded_u)
