"""Model tests: the folded-bias FaceNeRF must be exactly equivalent to a
naive per-point-concat forward (the reference's formulation,
models/face_nerf.py:40-80), plus shape/behavior tests for the audio
encoders (reference models/audio_net.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, apply_face_nerf, fold_conditioning, apply_folded,
    init_face_nerf, make_field_fn,
)
from idealnerf_tpu.models.audio_net import (
    apply_audio_att_net, apply_audio_net, apply_ds_aud_net,
    gather_aud_window, init_audio_att_net, init_audio_net, init_ds_aud_net,
)


def naive_face_nerf(params, cfg, pe_pts, pe_dirs, aud, expr, latent):
    """Reference formulation: broadcast conditioning to every point and
    concat (the slow path the folded implementation must match)."""
    n = pe_pts.shape[0]
    parts = [pe_pts]
    if cfg.dim_aud:
        parts.append(jnp.broadcast_to(aud, (n, cfg.dim_aud)))
    expr_s = None
    if cfg.dim_expr:
        expr_s = expr / 3.0
        parts.append(jnp.broadcast_to(expr_s, (n, cfg.dim_expr)))
    if cfg.dim_latent:
        parts.append(jnp.broadcast_to(latent, (n, cfg.dim_latent)))
    initial = jnp.concatenate(parts, -1)
    h = initial
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
        if i in cfg.skips:
            h = jnp.concatenate([initial, h], -1)
    alpha = h @ params["alpha"]["w"] + params["alpha"]["b"]
    hv = jnp.concatenate([h, pe_dirs], -1)
    if expr_s is not None:
        hv = jnp.concatenate([hv, jnp.broadcast_to(expr_s, (n, cfg.dim_expr))], -1)
    for layer in params["views"]:
        hv = jax.nn.relu(hv @ layer["w"] + layer["b"])
    rgb = hv @ params["rgb"]["w"] + params["rgb"]["b"]
    return jnp.concatenate([rgb, alpha], -1)


def test_folded_equals_naive_full_conditioning():
    cfg = FaceNeRFConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    key = jax.random.PRNGKey(0)
    params = init_face_nerf(key, cfg)
    ks = jax.random.split(key, 5)
    pe_pts = jax.random.normal(ks[0], (37, cfg.input_ch))
    pe_dirs = jax.random.normal(ks[1], (37, cfg.input_ch_views))
    aud = jax.random.normal(ks[2], (64,))
    expr = jax.random.normal(ks[3], (79,))
    latent = jax.random.normal(ks[4], (32,))

    got = apply_face_nerf(params, cfg, pe_pts, pe_dirs, aud, expr, latent)
    want = naive_face_nerf(params, cfg, pe_pts, pe_dirs, aud, expr, latent)
    assert got.shape == (37, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_folded_equals_naive_aud_only():
    cfg = FaceNeRFConfig(dim_aud=64, dim_expr=0, dim_latent=0)
    params = init_face_nerf(jax.random.PRNGKey(1), cfg)
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    pe_pts = jax.random.normal(k[0], (16, 63))
    pe_dirs = jax.random.normal(k[1], (16, 27))
    aud = jax.random.normal(k[2], (64,))
    got = apply_face_nerf(params, cfg, pe_pts, pe_dirs, aud=aud)
    want = naive_face_nerf(params, cfg, pe_pts, pe_dirs, aud, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_no_viewdirs_output_head():
    cfg = FaceNeRFConfig(dim_aud=0, use_viewdirs=False, output_ch=4)
    params = init_face_nerf(jax.random.PRNGKey(3), cfg)
    out = apply_face_nerf(params, cfg, jnp.ones((5, 63)))
    assert out.shape == (5, 4)


def test_field_fn_shapes():
    cfg = FaceNeRFConfig(dim_aud=64, dim_expr=76, dim_latent=32)
    params = init_face_nerf(jax.random.PRNGKey(4), cfg)
    k = jax.random.split(jax.random.PRNGKey(5), 3)
    fn = make_field_fn(
        params, cfg,
        aud=jax.random.normal(k[0], (64,)),
        expr=jax.random.normal(k[1], (76,)),
        latent=jax.random.normal(k[2], (32,)),
    )
    pts = jax.random.normal(jax.random.PRNGKey(6), (8, 5, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    raw = fn(pts, dirs)
    assert raw.shape == (8, 5, 4)
    assert jnp.isfinite(raw).all()


def test_skip_layer_widths():
    cfg = FaceNeRFConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    params = init_face_nerf(jax.random.PRNGKey(0), cfg)
    in_all = 63 + 64 + 79 + 32
    assert params["pts"][0]["w"].shape == (in_all, 256)
    assert params["pts"][5]["w"].shape == (256 + in_all, 256)  # skip at 4
    assert params["views"][0]["w"].shape == (27 + 256 + 79, 128)
    assert len(params["views"]) == 1 + cfg.depth // 4


# ----------------------------------------------------------- audio nets

def test_audio_net_shapes_and_determinism():
    params = init_audio_net(jax.random.PRNGKey(0), dim_aud=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 29))
    y = apply_audio_net(params, x)
    assert y.shape == (8, 64)
    # centered slice: frames outside [8-w/2, 8+w/2) must not affect output
    x2 = x.at[:, 0, :].set(99.0)  # win_size=16 uses all 16 -> affects
    assert not jnp.allclose(apply_audio_net(params, x2), y)
    y8 = apply_audio_net(params, x, win_size=8)
    x3 = x.at[:, 0, :].set(99.0)
    np.testing.assert_allclose(
        np.asarray(apply_audio_net(params, x3, win_size=8)), np.asarray(y8),
        rtol=1e-6,
    )


def test_audio_att_net_is_convex_combination():
    dim = 32
    params = init_audio_att_net(jax.random.PRNGKey(0), dim_aud=dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dim))
    y = apply_audio_att_net(params, x)
    assert y.shape == (dim,)
    # output lies within the per-channel min/max of the window (softmax weights)
    assert (y <= x.max(0) + 1e-5).all() and (y >= x.min(0) - 1e-5).all()


def test_ds_aud_net():
    params = init_ds_aud_net(jax.random.PRNGKey(0))
    y = apply_ds_aud_net(params, jnp.ones((4, 16, 29)))
    assert y.shape == (4, 29)


def test_gather_aud_window_padding():
    auds = jnp.arange(10, dtype=jnp.float32)[:, None, None] * jnp.ones((10, 16, 29))
    # interior: indices 2..9? index=5 -> 1..8
    w = gather_aud_window(auds, 5, smo_size=8)
    np.testing.assert_allclose(np.asarray(w[:, 0, 0]), np.arange(1, 9, dtype=np.float32))
    # left edge: index=1 -> [-3..4] with 3 zero pads
    w = gather_aud_window(auds, 1, smo_size=8)
    np.testing.assert_allclose(np.asarray(w[:, 0, 0]), [0, 0, 0, 0, 1, 2, 3, 4])
    # right edge: index=9 -> [5..12] with 3 zero pads
    w = gather_aud_window(auds, 9, smo_size=8)
    np.testing.assert_allclose(np.asarray(w[:, 0, 0]), [5, 6, 7, 8, 9, 0, 0, 0])
