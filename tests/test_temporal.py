"""Temporal depth-cache composite renderer (eval/temporal.py): band
estimation + dilation units, keyframe exactness vs the full fused
composite, and delta-frame quality tracking on trained fields."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.eval.temporal import (
    dilate_bands, fg_band, make_temporal_composite_renderer,
)


def test_fg_band_brackets_concentrated_mass():
    """A ray whose weight sits in a narrow z range gets a band bracketing
    it; the plate sample (last column) never contributes."""
    S = 33
    z = jnp.tile(jnp.linspace(0.5, 1.5, S)[None], (3, 1))
    w = np.zeros((3, S), np.float32)
    w[0, 10:14] = 0.25            # surface near z~0.81-0.9
    w[1, -1] = 0.9                # plate-only ray: no fg mass
    w[2, 5] = 0.5
    w[2, 20] = 0.5                # bimodal: band spans both
    lo, hi, mass = fg_band(z, jnp.asarray(w))
    zv = np.asarray(z[0])
    assert zv[9] <= float(lo[0]) <= zv[11]
    assert zv[12] <= float(hi[0]) <= zv[14]
    assert float(mass[0]) > 0.9
    assert float(mass[1]) < 1e-6          # plate mass excluded
    assert float(lo[2]) <= zv[5] + 1e-6 and float(hi[2]) >= zv[20] - 1e-6


def test_dilate_bands_propagates_and_falls_back():
    H = W = 8
    sel = jnp.arange(H * W, dtype=jnp.int32)
    lo = jnp.full((H * W,), 0.9)
    hi = jnp.full((H * W,), 1.1)
    valid = jnp.zeros((H * W,), bool).at[3 * W + 3].set(True)
    lo_d, hi_d = dilate_bands(lo, hi, valid, sel, H, W, radius=1,
                              fb_lo=0.5, fb_hi=1.5)
    lo_d, hi_d = np.asarray(lo_d).reshape(H, W), np.asarray(hi_d).reshape(H, W)
    # the valid ray's band reaches its 8-neighbourhood
    assert np.allclose(lo_d[2:5, 2:5], 0.9) and np.allclose(hi_d[2:5, 2:5], 1.1)
    # everywhere else falls back to the field interval
    assert np.allclose(lo_d[0, 0], 0.5) and np.allclose(hi_d[7, 7], 1.5)


def _random_setup(H=32, W=32):
    from idealnerf_tpu.models.face_nerf import init_face_nerf

    focal, cx, cy = 48.0, H / 2.0, W / 2.0
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
    call = dict(aud=jax.random.normal(ks[5], (16,)),
                expr=jax.random.normal(ks[6], (8,)),
                signal=jax.random.normal(ks[7], (20,)),
                latent=jnp.ones((4,)))
    return (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
            pose, pose0, bc, call)


def test_temporal_keyframe_matches_full_composite():
    """A keyframe (cache=None) IS the full fused hierarchical composite:
    coarse_hier + fine over the merged depths is the identical
    computation to render_rays_fused's hier path."""
    from idealnerf_tpu.eval.renderer import make_composite_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()

    full = make_composite_frame_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, use_pallas="ray",
        cx=cx, cy=cy)
    ref = np.asarray(full(hp, tp, pose, pose0, bc, **call))

    temporal = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8)
    frame, cache = temporal(hp, tp, pose, pose0, bc, **call, cache=None)
    np.testing.assert_allclose(np.asarray(frame), ref, atol=2e-5)

    # cache invariants: bands are valid sub-intervals of [near, far]
    for f in ("head", "torso"):
        lo, hi = (np.asarray(cache[f][0]), np.asarray(cache[f][1]))
        assert (lo >= near - 1e-6).all() and (hi <= far + 1e-6).all()
        assert (lo <= hi + 1e-6).all()

    # all-true per-field priors exercise the masked path; still exact
    temporal_pf = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        prior_mask_head=np.ones((H, W), bool),
        prior_mask_torso=np.ones((H, W), bool))
    frame_pf, _ = temporal_pf(hp, tp, pose, pose0, bc, **call, cache=None)
    np.testing.assert_allclose(np.asarray(frame_pf), ref, atol=2e-5)

    # delta frame on the cache: finite, plate outside the union when
    # per-field priors restrict the rays
    mask_h = np.zeros((H, W), bool)
    mask_h[4:20, 6:26] = True
    mask_t = np.zeros((H, W), bool)
    mask_t[14:30, 4:28] = True
    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        prior_mask_head=mask_h, prior_mask_torso=mask_t)
    f0, c0 = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    f1, c1 = tm(hp, tp, pose, pose0, bc, **call, cache=c0)
    f1 = np.asarray(f1)
    assert np.isfinite(f1).all()
    union = mask_h | mask_t
    ku = min(H * W, ((int(union.sum()) + 255) // 256) * 256)
    n_padded = ku - int(union.sum())
    eq_plate = np.abs(f1[~union] - np.asarray(bc)[~union]).max(-1) < 1e-6
    assert (~eq_plate).sum() <= n_padded


def test_temporal_head_only_keyframe_matches_full():
    """Single-field temporal keyframe == the full fused frame render;
    delta frames stay finite and respect the prior mask."""
    from idealnerf_tpu.eval.renderer import make_frame_renderer
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])

    full = make_frame_renderer(ncfg, H, W, focal, near, far, rc,
                               cx=cx, cy=cy, use_pallas="ray")
    ref = np.asarray(full(hp, pose, bc, **hcall))

    tm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                      cx=cx, cy=cy, s_delta=8)
    frame, cache = tm(hp, pose, bc, **hcall, cache=None)
    np.testing.assert_allclose(np.asarray(frame), ref, atol=2e-5)

    mask = np.zeros((H, W), bool)
    mask[4:28, 6:26] = True
    tmm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                       cx=cx, cy=cy, s_delta=8,
                                       prior_mask=mask)
    f0, c0 = tmm(hp, pose, bc, **hcall, cache=None)
    f1, c1 = tmm(hp, pose, bc, **hcall, cache=c0)
    f1 = np.asarray(f1)
    assert np.isfinite(f1).all()
    k = min(H * W, ((int(mask.sum()) + 255) // 256) * 256)
    n_padded = k - int(mask.sum())
    eq_plate = np.abs(f1[~mask] - np.asarray(bc)[~mask]).max(-1) < 1e-6
    assert (~eq_plate).sum() <= n_padded


def test_temporal_delta_keep_freezes_weak_rays():
    """delta_keep < 1: a pruned delta frame re-renders at most k_keep
    rays (the keyframe's top foreground-mass set, 256-aligned); every
    other pixel holds the keyframe's value exactly."""
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])

    tm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                      cx=cx, cy=cy, s_delta=8,
                                      delta_keep=0.5)
    f0, c0 = tm(hp, pose, bc, **hcall, cache=None)
    assert int(c0["keep"].shape[0]) == 512        # 1024 rays * 0.5
    # a different pose forces every re-rendered ray to change
    pose2 = jnp.concatenate(
        [jnp.eye(3), jnp.array([[0.2], [0.1], [1.1]])], 1)
    f1, c1 = tm(hp, pose2, bc, **hcall, cache=c0)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    assert np.isfinite(f1).all()
    changed = (np.abs(f1 - f0).max(-1) > 1e-7).sum()
    assert 0 < changed <= 512, changed
    # second delta frame consumes the delta-shaped cache (retrace path)
    f2, _ = tm(hp, pose, bc, **hcall, cache=c1)
    assert np.isfinite(np.asarray(f2)).all()


def test_temporal_per_field_s_delta():
    """s_delta_torso gives the torso field its own delta sample count
    (its band is much wider than the head's); the two field caches then
    carry different depth-grid widths."""
    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
        s_delta=8, s_delta_torso=12)
    f0, c0 = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    f1, c1 = tm(hp, tp, pose, pose0, bc, **call, cache=c0)
    assert np.isfinite(np.asarray(f1)).all()
    assert c1["head"][2].shape[-1] == 8      # head z grid: s_delta
    assert c1["torso"][2].shape[-1] == 12    # torso z grid: s_delta_torso
    # second delta consumes the delta-shaped caches
    f2, _ = tm(hp, tp, pose, pose0, bc, **call, cache=c1)
    assert np.isfinite(np.asarray(f2)).all()


def test_temporal_delta_rays_match_keyframe_geometry():
    """Delta frames compute rays from a static per-field direction table
    (one (n, 3) x (3, 3) matmul against the pose) instead of get_rays
    over the full grid. With a ROTATED pose and an off-center principal
    point — which the other temporal tests never use — a transposed
    rotation or a cx/cy sign error in the table would misalign the
    delta frame against the keyframe. Rendering the SAME pose as both a
    keyframe and a delta frame must agree closely; geometry bugs drop
    agreement to ~10 dB."""
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, _, _, near, far, hp, tp,
     pose_id, pose0, bc, call) = _random_setup()
    cx, cy = W * 0.41, H * 0.57          # deliberately off-center
    th = 0.35                            # a real rotation
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    pose = jnp.asarray(np.concatenate(
        [R, np.array([[0.3], [0.1], [0.9]], np.float32)], 1))
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])

    tm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                      cx=cx, cy=cy, s_delta=32)
    kf, c0 = tm(hp, pose, bc, **hcall, cache=None)
    delta, _ = tm(hp, pose, bc, **hcall, cache=c0)   # same pose
    err = float(np.mean((np.asarray(kf) - np.asarray(delta)) ** 2))
    psnr = -10.0 * np.log10(err + 1e-12)
    assert psnr > 20.0, psnr


def test_temporal_per_field_delta_keep():
    """delta_keep_head != delta_keep_torso: each field prunes its delta
    frames to its own keep fraction (the torso's rays come from the
    fixed first-frame pose, so it tolerates a lower keep than the
    moving head); kept-set sizes differ accordingly."""
    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
        s_delta=8, delta_keep_head=1.0, delta_keep_torso=0.5)
    f0, c0 = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    f1, c1 = tm(hp, tp, pose, pose0, bc, **call, cache=c0)
    assert np.isfinite(np.asarray(f1)).all()
    # head unpruned: plain band tuple; torso pruned: kept-space cache
    assert isinstance(c1["head"], tuple)
    assert int(c1["torso"]["keep"].shape[0]) == 512   # 1024 * 0.5
    f2, _ = tm(hp, tp, pose, pose0, bc, **call, cache=c1)
    assert np.isfinite(np.asarray(f2)).all()


def test_temporal_freeze_z_torso_exact_at_same_conditioning():
    """freeze_z_torso: torso delta frames re-evaluate the keyframe's
    exact depth grid. With the SAME conditioning a delta frame must
    reproduce the keyframe's torso outputs exactly (same rays — fixed
    pose0 — same depths, same network); with different conditioning it
    must track (outputs change) while the cache passes through
    unchanged."""
    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
        s_delta=8, freeze_z_torso=True, _expose_stages=True)
    torso = tm.stages["torso"]
    cond = (call["signal"], None, None)
    rgb0, lw0, fg0, band = torso(tp, pose0, bc, cond, None)
    rgb1, lw1, fg1, band1 = torso.delta_step(tp, pose0, bc, cond, band)
    # keyframe and delta are separately jitted programs (get_rays grid
    # vs the static direction-table matmul), so identical math still
    # reassociates differently — bound the fp noise, not bit-equality
    np.testing.assert_allclose(np.asarray(lw1), np.asarray(lw0),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(fg1), np.asarray(fg0),
                               atol=1e-3)
    # cache (incl. the frozen z grid) passes through unchanged
    np.testing.assert_array_equal(np.asarray(band1[2]),
                                  np.asarray(band[2]))
    # different conditioning -> outputs track it on the same grid
    cond2 = (call["signal"] + 1.0, None, None)
    _, lw2, fg2, _ = torso.delta_step(tp, pose0, bc, cond2, band)
    assert float(np.abs(np.asarray(fg2) - np.asarray(fg0)).max()) > 1e-4

    # end-to-end: the composite renderer runs with the frozen torso
    f0, c0 = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    f1, c1 = tm(hp, tp, pose, pose0, bc, **call, cache=c0)
    f2, _ = tm(hp, tp, pose, pose0, bc, **call, cache=c1)
    assert np.isfinite(np.asarray(f2)).all()


# slow (42s): kf_blend measured quality-NEGATIVE in round 3-4 and is
# excluded from every gated operating point; depth-placement coverage
# for production configs lives in the quick dilate_every/delta tests
@pytest.mark.slow
def test_temporal_kf_blend_and_uni_frac():
    """kf_blend anchors part of each delta frame's importance draw to
    the KEYFRAME's full-resolution CDF: keyframes are unchanged (still
    the exact full render), delta caches carry the keyframe (z, w)
    through the cycle, and the delta z-grid width stays s_delta. Both
    pruned and unpruned paths."""
    from idealnerf_tpu.eval.renderer import make_composite_frame_renderer
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()

    full = make_composite_frame_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, use_pallas="ray",
        cx=cx, cy=cy)
    ref = np.asarray(full(hp, tp, pose, pose0, bc, **call))

    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
        s_delta=8, uni_frac=0.5, kf_blend=0.5)
    f0, c0 = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    np.testing.assert_allclose(np.asarray(f0), ref, atol=2e-5)
    # keyframe cache carries the anchor distribution (6-tuple)
    assert len(c0["head"]) == 6
    kf_w = int(cfg.N_samples + cfg.N_importance)
    assert c0["head"][4].shape[-1] == kf_w
    f1, c1 = tm(hp, tp, pose, pose0, bc, **call, cache=c0)
    assert np.isfinite(np.asarray(f1)).all()
    assert c1["head"][2].shape[-1] == 8      # delta grid width: s_delta
    assert c1["head"][4].shape[-1] == kf_w   # anchor kept through cycle
    np.testing.assert_allclose(np.asarray(c1["head"][4]),
                               np.asarray(c0["head"][4]))
    f2, _ = tm(hp, tp, pose, pose0, bc, **call, cache=c1)
    assert np.isfinite(np.asarray(f2)).all()

    # pruned path: kept-space anchor rides the dict cache
    tmp = make_temporal_frame_renderer(
        ncfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        delta_keep=0.5, kf_blend=0.5)
    hcall = dict(aud=call["aud"], expr=call["expr"],
                 latent=call["latent"])
    g0, d0 = tmp(hp, pose, bc, **hcall, cache=None)
    assert d0["kz"].shape == (512, kf_w)
    g1, d1 = tmp(hp, pose, bc, **hcall, cache=d0)
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(d1["kz"]), np.asarray(d0["kz"]))
    g2, _ = tmp(hp, pose, bc, **hcall, cache=d1)
    assert np.isfinite(np.asarray(g2)).all()


def test_temporal_cycle_matches_per_frame():
    """render.cycle (one lax.scan program per keyframe cycle) computes
    exactly the per-frame delta path: same frames, same final cache —
    the fps win is dispatch/fetch structure, not different math. Richest
    cache shape: pruned (delta_keep) + keyframe anchor (kf_blend)."""
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    T = 3
    ks = jax.random.split(jax.random.PRNGKey(42), 4)
    poses_c = jnp.stack([
        jnp.concatenate(
            [jnp.eye(3), jnp.array([[0.02 * i], [0.01 * i], [0.9]])], 1)
        for i in range(T)])
    auds_c = jax.random.normal(ks[0], (T, 16))
    exprs_c = jax.random.normal(ks[1], (T, 8))
    sigs_c = jax.random.normal(ks[2], (T, 20))
    lats_c = jnp.tile(call["latent"][None], (T, 1))

    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        delta_keep_head=0.5, delta_keep_torso=0.5, kf_blend=0.5)
    _, cache = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    # one per-frame delta reshapes the cache to the scan carry's
    # (s_delta-wide) shape — the cycle's entry contract
    _, cache = tm(hp, tp, pose, pose0, bc, **call, cache=cache)

    ref_frames, c_ref = [], cache
    for i in range(T):
        f, c_ref = tm(hp, tp, poses_c[i], pose0, bc, aud=auds_c[i],
                      signal=sigs_c[i], expr=exprs_c[i],
                      latent=call["latent"], cache=c_ref)
        ref_frames.append(np.asarray(f))

    frames, c_cyc = tm.cycle(hp, tp, poses_c, pose0, bc, cache,
                             auds=auds_c, signals=sigs_c, exprs=exprs_c,
                             latents=lats_c)
    np.testing.assert_allclose(np.asarray(frames), np.stack(ref_frames),
                               atol=2e-5)
    for a, b in zip(jax.tree.leaves(c_cyc), jax.tree.leaves(c_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)

    # head-only cycle, unpruned tuple cache
    tmh = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                       cx=cx, cy=cy, s_delta=8)
    hcall = dict(aud=call["aud"], expr=call["expr"],
                 latent=call["latent"])
    _, hc = tmh(hp, pose, bc, **hcall, cache=None)
    _, hc = tmh(hp, pose, bc, **hcall, cache=hc)
    ref_h, c_ref = [], hc
    for i in range(T):
        f, c_ref = tmh(hp, poses_c[i], bc, aud=auds_c[i],
                       expr=exprs_c[i], latent=call["latent"],
                       cache=c_ref)
        ref_h.append(np.asarray(f))
    frames_h, _ = tmh.cycle(hp, poses_c, bc, hc, auds=auds_c,
                            exprs=exprs_c, latents=lats_c)
    np.testing.assert_allclose(np.asarray(frames_h), np.stack(ref_h),
                               atol=2e-5)


# slow (60s): long trained-field quality tracking; the quick tier keeps
# keyframe-exactness + cycle-equivalence, the chip evidence runs carry
# the real quality gates
@pytest.mark.slow
def test_temporal_video_tracks_trained_fields(trained_head_torso):
    """On TRAINED head+torso fields, delta frames must stay close to the
    per-frame full render across a moving 4-frame clip (the quality
    contract of the temporal mode; random fog fields would fail this).
    Fields come from the shared session fixture (conftest) — the same
    head-20-epoch + torso-121-step training this test ran inline."""
    from idealnerf_tpu.eval.renderer import make_composite_frame_renderer
    from idealnerf_tpu.train.head import compute_aud_feature
    from idealnerf_tpu.train.torso import torso_nerf_config, torso_signal

    cfg = trained_head_torso["cfg"]
    ds_com = trained_head_torso["ds_com"]
    head = trained_head_torso["head"]
    torso = trained_head_torso["torso"]

    rc = cfg.render_config()
    ncfg = cfg.face_nerf_config()
    tcfg = torso_nerf_config(cfg)
    data = torso.data
    bc = data["bc_img"].astype(jnp.float32) / 255.0
    pose0 = data["poses"][0]
    full = make_composite_frame_renderer(
        ncfg, tcfg, 48, 48, ds_com.focal, ds_com.near, ds_com.far, rc,
        cx=ds_com.cx, cy=ds_com.cy, use_pallas="ray")
    temporal = make_temporal_composite_renderer(
        ncfg, tcfg, 48, 48, ds_com.focal, ds_com.near, ds_com.far, rc,
        cx=ds_com.cx, cy=ds_com.cy, s_delta=8, dilate_px=3)

    hp, tp = head.state.params, torso.torso_params
    cache = None
    psnrs = []
    for i in range(4):      # keyframe + 3 moving delta frames
        aud = compute_aud_feature(hp, data["auds"], data["aud_ids"], i,
                                  cfg, False)
        sig = torso_signal(aud, data["poses"][i], cfg.dim_aud_body)
        call = dict(aud=aud, signal=sig, expr=data["exprs"][i],
                    latent=head.state.latent_codes[i])
        ref = np.asarray(full(hp, tp, data["poses"][i], pose0, bc, **call))
        frame, cache = temporal(hp, tp, data["poses"][i], pose0, bc,
                                **call, cache=cache)
        err = float(np.mean((np.asarray(frame) - ref) ** 2))
        psnrs.append(-10.0 * np.log10(err + 1e-12))
    # keyframe is exact; every delta frame stays close to per-frame full
    assert psnrs[0] > 50.0, psnrs
    assert min(psnrs[1:]) > 24.0, psnrs

    # pruned delta frames (delta_keep) must hold the same quality bar on
    # trained fields: the frozen rays are exactly the weak-foreground
    # ones whose full render is (nearly) the plate
    pruned = make_temporal_composite_renderer(
        ncfg, tcfg, 48, 48, ds_com.focal, ds_com.near, ds_com.far, rc,
        cx=ds_com.cx, cy=ds_com.cy, s_delta=8, dilate_px=3,
        delta_keep_head=0.5, delta_keep_torso=0.5)
    cache = None
    psnrs_p = []
    for i in range(4):
        aud = compute_aud_feature(hp, data["auds"], data["aud_ids"], i,
                                  cfg, False)
        sig = torso_signal(aud, data["poses"][i], cfg.dim_aud_body)
        call = dict(aud=aud, signal=sig, expr=data["exprs"][i],
                    latent=head.state.latent_codes[i])
        ref = np.asarray(full(hp, tp, data["poses"][i], pose0, bc, **call))
        frame, cache = pruned(hp, tp, data["poses"][i], pose0, bc,
                              **call, cache=cache)
        err = float(np.mean((np.asarray(frame) - ref) ** 2))
        psnrs_p.append(-10.0 * np.log10(err + 1e-12))
    assert psnrs_p[0] > 50.0, psnrs_p
    assert min(psnrs_p[1:]) > 23.0, psnrs_p


@pytest.mark.slow
def test_reenact_temporal_mode_runs():
    """reenact(..., temporal=2) threads the cache through the frame loop
    and produces finite frames of the right shape."""
    from idealnerf_tpu.data import make_synthetic_dataset
    from idealnerf_tpu.eval.reenact import reenact
    from idealnerf_tpu.train.state import init_train_state
    from idealnerf_tpu.train.torso import init_torso_params

    cfg = ExperimentConfig(dim_aud=64, dim_expr=8, dim_latent=32,
                           N_samples=8, N_importance=8)
    ds = make_synthetic_dataset(n_frames=3, H=24, W=24, dim_expr=8,
                                with_torso=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    tparams = init_torso_params(jax.random.PRNGKey(1), cfg)
    frames = reenact(
        cfg, state.params, ds, driving_auds=ds.auds[:3],
        driving_exprs=ds.exprs[:3], latent_codes=state.latent_codes,
        torso_params=tparams, max_frames=3, smooth_audio=False,
        temporal=2, s_delta=6, use_prior=True,
    )
    assert frames.shape == (3, 24, 24, 3)
    assert np.isfinite(frames).all()

    # head-only temporal through the same loop
    frames_h = reenact(
        cfg, state.params, ds, driving_auds=ds.auds[:3],
        driving_exprs=ds.exprs[:3], latent_codes=state.latent_codes,
        max_frames=3, smooth_audio=False, temporal=2, s_delta=6,
        use_prior=True,
    )
    assert frames_h.shape == (3, 24, 24, 3)
    assert np.isfinite(frames_h).all()

    # scanned-cycle flag: same frames as the per-frame temporal loop
    # (temporal=3 so the 3-frame clip exercises keyframe + per-frame
    # first delta + a scanned chunk of 1)
    com = dict(driving_auds=ds.auds[:3], driving_exprs=ds.exprs[:3],
               latent_codes=state.latent_codes, torso_params=tparams,
               max_frames=3, smooth_audio=False, temporal=3, s_delta=6,
               use_prior=True)
    ref = reenact(cfg, state.params, ds, **com)
    cyc = reenact(cfg, state.params, ds, cycle=True, **com)
    np.testing.assert_allclose(cyc, ref, atol=2e-5)


def test_temporal_dilate_every_thins_band_maintenance():
    """dilate_every=k runs the spatial band dilation only on every k-th
    delta frame (invalid rays carry their previous band in between);
    k=1 keeps the original cache layout (no frame counter), and the
    scanned cycle computes the counter/cond machinery exactly like the
    per-frame path."""
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"],
                 latent=call["latent"])

    # k=1 (default): unpruned tuple cache stays counter-free
    tm1 = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                       cx=cx, cy=cy, s_delta=8)
    _, c1 = tm1(hp, pose, bc, **hcall, cache=None)
    assert isinstance(c1, tuple) and len(c1) == 4

    # k=2: counter rides the cache; delta frames alternate carry/dilate
    tm2 = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                       cx=cx, cy=cy, s_delta=8,
                                       dilate_every=2)
    f2, c2 = tm2(hp, pose, bc, **hcall, cache=None)
    assert len(c2) == 5 and int(c2[-1]) == 0
    frames = []
    for i in range(4):
        f2, c2 = tm2(hp, pose, bc, **hcall, cache=c2)
        frames.append(np.asarray(f2))
        assert int(c2[-1]) == i + 1
    assert all(np.isfinite(f).all() for f in frames)

    # same static scene rendered with per-frame dilation: the thinned
    # path tracks it closely (no motion -> carry vs dilate is benign)
    f1, c1 = tm1(hp, pose, bc, **hcall, cache=None)
    for _ in range(4):
        f1, c1 = tm1(hp, pose, bc, **hcall, cache=c1)
    assert np.mean(np.abs(np.asarray(f1) - frames[-1])) < 0.02

    # pruned composite cache gains the counter too, and the scanned
    # cycle (lax.cond inside lax.scan) is EXACT vs the per-frame loop
    tmc = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        delta_keep_head=0.5, delta_keep_torso=0.5, dilate_every=2)
    _, cc = tmc(hp, tp, pose, pose0, bc, **call, cache=None)
    assert int(cc["head"]["i"]) == 0
    _, cc = tmc(hp, tp, pose, pose0, bc, **call, cache=cc)
    assert int(cc["head"]["i"]) == 1

    T = 3
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    poses_c = jnp.stack([
        jnp.concatenate(
            [jnp.eye(3), jnp.array([[0.02 * i], [0.01 * i], [0.9]])], 1)
        for i in range(T)])
    auds_c = jax.random.normal(ks[0], (T, 16))
    exprs_c = jax.random.normal(ks[1], (T, 8))
    sigs_c = jax.random.normal(ks[2], (T, 20))
    lats_c = jnp.tile(call["latent"][None], (T, 1))
    ref_frames, c_ref = [], cc
    for i in range(T):
        f, c_ref = tmc(hp, tp, poses_c[i], pose0, bc, aud=auds_c[i],
                       signal=sigs_c[i], expr=exprs_c[i],
                       latent=call["latent"], cache=c_ref)
        ref_frames.append(np.asarray(f))
    frames_c, c_cyc = tmc.cycle(hp, tp, poses_c, pose0, bc, cc,
                                auds=auds_c, signals=sigs_c,
                                exprs=exprs_c, latents=lats_c)
    np.testing.assert_allclose(np.asarray(frames_c),
                               np.stack(ref_frames), atol=2e-5)
    assert int(c_cyc["head"]["i"]) == int(c_ref["head"]["i"]) == 4


@pytest.mark.slow
def test_temporal_in_kernel_delta_matches_xla_path():
    """in_kernel_delta=True (fused_render_delta: depth placement +
    render + fg band in one launch) reproduces the XLA delta path over
    a multi-frame cycle, cache threading included — both unpruned and
    delta_keep-pruned, composite and head-only.

    Tolerance note: the kernel computes the importance CDF as a
    HIGHEST-precision triangular matmul while sample_pdf uses
    jnp.cumsum; the f32 rounding difference occasionally flips a
    sample into the adjacent CDF bin (a handful of pixels per frame;
    each flip moves one of s_delta samples by up to a bin width), and
    the cache feedback carries flips across the cycle. Same
    distribution, not a drift — asserted as >=60 dB frame agreement,
    three orders of magnitude under the 0.05 dB quality gates the
    committed evidence holds."""

    def assert_agrees(fk, fx):
        assert np.isfinite(fk).all()
        mse = float(np.mean((fk - fx) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        assert psnr >= 60.0, psnr
        assert np.abs(fk - fx).max() < 2e-2
    from idealnerf_tpu.eval.temporal import (
        make_temporal_composite_renderer, make_temporal_frame_renderer,
    )

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])

    poses = [pose,
             jnp.concatenate([jnp.eye(3),
                              jnp.array([[0.03], [0.02], [0.92]])], 1),
             jnp.concatenate([jnp.eye(3),
                              jnp.array([[-0.02], [0.04], [0.88]])], 1)]

    for dk in (1.0, 0.5):
        tms = [make_temporal_frame_renderer(
                   ncfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
                   s_delta=8, delta_keep=dk, in_kernel_delta=ik)
               for ik in (False, True)]
        frames = []
        for tm in tms:
            cache, out = None, []
            for p in poses:
                f, cache = tm(hp, p, bc, **hcall, cache=cache)
                out.append(np.asarray(f))
            frames.append(out)
        for fx, fk in zip(*frames):
            assert_agrees(fk, fx)

    tms = [make_temporal_composite_renderer(
               ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
               s_delta=8, delta_keep_head=0.5, delta_keep_torso=0.5,
               in_kernel_delta=ik)
           for ik in (False, True)]
    frames = []
    for tm in tms:
        cache, out = None, []
        for p in poses:
            f, cache = tm(hp, tp, p, pose0, bc, **call, cache=cache)
            out.append(np.asarray(f))
        frames.append(out)
    for fx, fk in zip(*frames):
        assert_agrees(fk, fx)


def test_temporal_rolling_refresh():
    """Rolling keyframe refresh (roll_k): frame 0 == the full fused
    render; a refresh slice's full-schedule render equals the matching
    strided rows of a monolithic keyframe (the (m, K) view maps slice p
    to sel rows p::K); the phase wraps and re-ranks delta_keep; frames
    stay finite throughout a full comb cycle."""
    from idealnerf_tpu.eval.renderer import make_frame_renderer
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])
    K = 4

    full = make_frame_renderer(ncfg, H, W, focal, near, far, rc,
                               cx=cx, cy=cy, use_pallas="ray")
    ref = np.asarray(full(hp, pose, bc, **hcall))

    tm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                      cx=cx, cy=cy, s_delta=8,
                                      delta_keep=0.75, roll_k=K)
    frame0, cache = tm(hp, pose, bc, **hcall, cache=None)
    np.testing.assert_allclose(np.asarray(frame0), ref, atol=2e-5)
    assert cache["phase"] == 0
    keep0 = np.asarray(cache["dev"]["keep"])

    # drive one full comb cycle; every frame finite, phase cycles
    for i in range(K):
        assert cache["phase"] == i % K
        frame, cache = tm(hp, pose, bc, **hcall, cache=cache)
        assert np.isfinite(np.asarray(frame)).all()
    assert cache["phase"] == 0          # wrapped
    assert cache["dev"]["keep"].shape == keep0.shape

    # cache invariants: bands inside the field interval, uniform widths
    dev = cache["dev"]
    assert dev["z"].shape[-1] == 8 and dev["w"].shape[-1] == 8
    lo, hi = np.asarray(dev["lo"]), np.asarray(dev["hi"])
    assert (lo >= near - 1e-6).all() and (hi <= far + 1e-6).all()


def test_temporal_rolling_slice_matches_keyframe_rows():
    """The slice-refresh programs are the keyframe schedule restricted
    to the comb: slice p's fine rgb == rows p::K of the monolithic
    keyframe's fine rgb at the same conditioning."""
    import jax.numpy as jnp
    from idealnerf_tpu.eval.temporal import make_temporal_composite_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    K = 4

    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        roll_k=K, _expose_stages=True)
    head = tm.stages["head"]
    cond = (call["aud"], call["expr"], call["latent"])

    st_kf = head.kf_coarse(hp, pose, bc, cond)
    rgb_kf, _, _, band_kf = head.kf_fine(hp, st_kf, cond)
    rgb_kf = np.asarray(rgb_kf)

    for p in (0, K - 1):
        st = head.roll.slice_coarse(hp, pose, bc, cond, jnp.int32(p))
        sl = head.roll.slice_fine(hp, st, cond)
        # slice rays come from the delta path's einsum (dirs @ R) while
        # the keyframe gathers get_rays' full grid — f32 reduction-order
        # noise in the ray directions bounds the pixel delta (same
        # tolerance as test_temporal_delta_rays_match_keyframe_geometry)
        d = np.abs(np.asarray(sl["rgb"]) - rgb_kf[p::K])
        assert d.max() < 5e-3, d.max()
        assert (d <= 2e-5).mean() > 0.9, (d > 2e-5).mean()
        # downsampled cache rows carry the uniform delta width
        assert sl["z"].shape[-1] == 8 and sl["w"].shape[-1] == 8
        z = np.asarray(sl["z"])
        assert (np.diff(z[:, :-1], axis=-1) >= -1e-6).all()
        assert np.allclose(z[:, -1], far)


# slow (54s): advisor-repro edge case (unmasked non-divisible H*W);
# the quick tier keeps the main rolling-refresh + slice-match tests
@pytest.mark.slow
def test_temporal_rolling_unmasked_nondivisible():
    """roll_k with NO prior mask and H·W % K != 0 (round-4 advisor
    repro, H=23/W=25/K=4): _pad_sel_for_roll pads sel past H·W, so
    assembly must scatter through sel instead of dense-reshaping the
    padded rgb. Frame 0 must equal the full render; delta frames stay
    finite through a comb wrap; composite path likewise."""
    from idealnerf_tpu.eval.renderer import make_frame_renderer
    from idealnerf_tpu.eval.temporal import (
        make_temporal_composite_renderer, make_temporal_frame_renderer,
    )

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup(H=23, W=25)
    rc = cfg.render_config()
    hcall = dict(aud=call["aud"], expr=call["expr"], latent=call["latent"])
    K = 4
    assert (H * W) % K != 0

    full = make_frame_renderer(ncfg, H, W, focal, near, far, rc,
                               cx=cx, cy=cy, use_pallas="ray")
    ref = np.asarray(full(hp, pose, bc, **hcall))

    tm = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                      cx=cx, cy=cy, s_delta=8,
                                      delta_keep=0.75, roll_k=K)
    frame0, cache = tm(hp, pose, bc, **hcall, cache=None)
    np.testing.assert_allclose(np.asarray(frame0), ref, atol=2e-5)
    for _ in range(K + 1):
        frame, cache = tm(hp, pose, bc, **hcall, cache=cache)
        assert frame.shape == (H, W, 3)
        assert np.isfinite(np.asarray(frame)).all()

    tmc = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
        s_delta=8, roll_k=K)
    ccall = dict(aud=call["aud"], signal=call["signal"],
                 expr=call["expr"], latent=call["latent"])
    f0, cc = tmc(hp, tp, pose, pose0, bc, **ccall, cache=None)
    assert f0.shape == (H, W, 3)
    for _ in range(K + 1):
        f, cc = tmc(hp, tp, pose, pose0, bc, **ccall, cache=cc)
        assert f.shape == (H, W, 3)
        assert np.isfinite(np.asarray(f)).all()


def test_temporal_composite_roll_torso_refresh_only():
    """roll_k_torso (torso REFRESH-ONLY rolling): frame 0 == the plain
    temporal keyframe; with CONSTANT conditioning the torso cache after
    a full comb cycle reproduces its keyframe values (slices re-render
    deterministic identical inputs); frames stay finite; the mode
    excludes roll_k and the scanned cycle."""
    from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    K = 4

    plain = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8)
    ref0, _ = plain(hp, tp, pose, pose0, bc, **call, cache=None)

    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        delta_keep_head=0.75, roll_k_torso=K, _expose_stages=True)
    f0, cache = tm(hp, tp, pose, pose0, bc, **call, cache=None)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(ref0),
                               atol=2e-5)
    assert cache["torso"]["phase"] == 0
    rgb_kf = np.asarray(cache["torso"]["dev"]["rgb"])

    for i in range(K + 1):
        assert cache["torso"]["phase"] == i % K
        f, cache = tm(hp, tp, pose, pose0, bc, **call, cache=cache)
        assert np.isfinite(np.asarray(f)).all()
    # full comb cycle at constant conditioning: every torso ray was
    # re-rendered once from identical inputs -> cache rgb ~= keyframe
    # rgb (slice rays use the einsum path, keyframes the full grid —
    # same f32 tolerance as the slice-vs-keyframe-rows test)
    d = np.abs(np.asarray(cache["torso"]["dev"]["rgb"]) - rgb_kf)
    assert d.max() < 5e-3, d.max()
    assert (d <= 2e-5).mean() > 0.9

    with pytest.raises(ValueError, match="exclusive"):
        make_temporal_composite_renderer(
            ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy,
            s_delta=8, roll_k=K, roll_k_torso=K)
    with pytest.raises(RuntimeError, match="scanned-cycle"):
        tm.cycle(hp, tp, pose[None], pose0, bc, cache)
    # head-only renderer is unaffected by the torso-roll knob
    tmh = make_temporal_frame_renderer(ncfg, H, W, focal, near, far, rc,
                                       cx=cx, cy=cy, s_delta=8)
    fh, _ = tmh(hp, pose, bc, aud=call["aud"], expr=call["expr"],
                latent=call["latent"], cache=None)
    assert np.isfinite(np.asarray(fh)).all()


def test_temporal_roll_invalid_slice_band_carry():
    """A refreshed roll slice whose rays found NO foreground mass must
    CARRY those rays' previous bands through the merge instead of
    widening them to the full field interval (the widened band would
    collapse in-band sample density until the comb revisits)."""
    (cfg, ncfg, tcfg, H, W, focal, cx, cy, near, far, hp, tp,
     pose, pose0, bc, call) = _random_setup()
    rc = cfg.render_config()
    K = 4

    tm = make_temporal_composite_renderer(
        ncfg, tcfg, H, W, focal, near, far, rc, cx=cx, cy=cy, s_delta=8,
        roll_k=K, _expose_stages=True)
    head = tm.stages["head"]
    cond = (call["aud"], call["expr"], call["latent"])

    st = head.kf_coarse(hp, pose, bc, cond)
    rgb, lw, fg, band = head.kf_fine(hp, st, cond)
    cache = dict(head.roll.init(rgb, lw, fg, band))
    lo0 = np.asarray(cache["lo"]).copy()
    hi0 = np.asarray(cache["hi"]).copy()

    p = 1
    st_sl = head.roll.slice_coarse(hp, pose, bc, cond, jnp.int32(p))
    sl = dict(head.roll.slice_fine(hp, st_sl, cond))
    # force the whole slice invalid with interval-wide bands (what
    # slice_fine emits for massless rays)
    sl["valid"] = jnp.zeros_like(sl["valid"])
    sl["lo"] = jnp.full_like(sl["lo"], near)
    sl["hi"] = jnp.full_like(sl["hi"], far)
    merged = head.roll.merge(cache, sl, jnp.int32(p))

    # slice rows keep their previous bands...
    np.testing.assert_allclose(np.asarray(merged["lo"])[p::K], lo0[p::K],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged["hi"])[p::K], hi0[p::K],
                               atol=1e-6)
    # ...and a VALID slice does overwrite them
    sl2 = dict(head.roll.slice_fine(hp, st_sl, cond))
    sl2["valid"] = jnp.ones_like(sl2["valid"])
    sl2["lo"] = jnp.full_like(sl2["lo"], 0.7)
    sl2["hi"] = jnp.full_like(sl2["hi"], 0.8)
    merged2 = head.roll.merge(cache, sl2, jnp.int32(p))
    np.testing.assert_allclose(np.asarray(merged2["lo"])[p::K], 0.7,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged2["hi"])[p::K], 0.8,
                               atol=1e-6)


def test_stream_rolling_emits_and_bounds_cache():
    """TemporalStream with roll_k: only frame 0 is a keyframe, every
    push emits (after the lookahead), frames finite, and the cache's
    phase keeps cycling (never reset)."""
    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data import make_synthetic_dataset
    from idealnerf_tpu.eval.stream import TemporalStream
    from idealnerf_tpu.train.state import init_train_state

    cfg = ExperimentConfig(dim_aud=64, dim_expr=8, dim_latent=32,
                           N_samples=8, N_importance=8)
    ds = make_synthetic_dataset(n_frames=6, H=24, W=24, dim_expr=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    stream = TemporalStream(cfg, state.params, ds,
                            latent_codes=state.latent_codes,
                            s_delta=6, delta_keep=0.75, roll_k=3,
                            use_prior=True, smooth_audio=False)
    frames = []
    n = 7
    for i in range(n):
        f = stream.push(ds.auds[i % ds.auds.shape[0]],
                        expr=ds.exprs[i % ds.size])
        if f is not None:
            frames.append(f)
    frames.extend(stream.flush())
    assert len(frames) == n
    assert all(np.isfinite(f).all() for f in frames)
    assert stream._cache["phase"] == (n - 1) % 3
