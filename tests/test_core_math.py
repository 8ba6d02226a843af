"""Golden tests for the volume-rendering core against independent numpy
re-derivations of the reference semantics (the deterministic ``pytest=``/
perturb=0 paths define the oracle — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idealnerf_tpu.core.embedding import pe_dim, positional_encoding
from idealnerf_tpu.core.rays import get_rays, ndc_rays, pose_to_euler_trans
from idealnerf_tpu.core.sampling import sample_pdf, stratified_sample
from idealnerf_tpu.core.composite import raw2outputs


# ------------------------------------------------------------- embedding

def np_positional_encoding(x, num_freqs):
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    out = [x]
    for f in freqs:
        out.append(np.sin(x * f))
        out.append(np.cos(x * f))
    return np.concatenate(out, -1)


def test_pe_dims():
    assert pe_dim(3, 10) == 63
    assert pe_dim(3, 4) == 27
    assert pe_dim(3, 5) == 33  # attention embedder (audio_exp_nerf.py:37)
    assert pe_dim(3, 3) == 21  # torso pose embedder (run_nerf.py:421)


def test_pe_values_and_order():
    x = np.random.RandomState(0).randn(17, 3).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 10))
    want = np_positional_encoding(x, 10)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pe_identity():
    x = jnp.ones((4, 3))
    assert positional_encoding(x, 0).shape == (4, 3)


# ------------------------------------------------------------------ rays

def np_get_rays(H, W, focal, c2w, cx, cy):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - cx) / focal, -(j - cy) / focal, -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def test_get_rays_matches_reference_convention():
    rng = np.random.RandomState(1)
    # a valid-ish pose: orthonormal rotation + translation
    q = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    c2w = np.concatenate([q, rng.randn(3, 1).astype(np.float32)], -1)
    H, W, focal, cx, cy = 12, 10, 30.0, 5.5, 6.5
    o, d = get_rays(H, W, focal, jnp.asarray(c2w), cx, cy)
    o_np, d_np = np_get_rays(H, W, focal, c2w, cx, cy)
    np.testing.assert_allclose(np.asarray(o), o_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_np, rtol=1e-5, atol=1e-5)
    # origin is the camera center for every pixel
    assert np.allclose(np.asarray(o)[0, 0], c2w[:3, -1])


def test_ndc_rays_z_convention():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    o2, d2 = ndc_rays(8, 8, 10.0, 1.0, o, d)
    assert o2.shape == (1, 3) and d2.shape == (1, 3)
    assert np.isfinite(np.asarray(o2)).all()


def test_pose_to_euler_trans_roundtrip():
    # identity rotation: e2=atan2(1,0)=pi/2, e1=asin(0)=0, e0=atan2(1,0)=pi/2
    pose = jnp.eye(4)[None]
    et = np.asarray(pose_to_euler_trans(pose))
    np.testing.assert_allclose(et[0, :3], [np.pi / 2, 0.0, np.pi / 2], atol=1e-6)
    np.testing.assert_allclose(et[0, 3:], [0, 0, 0], atol=1e-6)


# -------------------------------------------------------------- sampling

def test_stratified_deterministic_linspace():
    z = stratified_sample(2.0, 6.0, 5, 3, key=None)
    want = np.broadcast_to(np.linspace(2.0, 6.0, 5), (3, 5))
    np.testing.assert_allclose(np.asarray(z), want, rtol=1e-6)


def test_stratified_lindisp():
    z = np.asarray(stratified_sample(1.0, 2.0, 3, 1, key=None, lindisp=True))
    want = 1.0 / (1.0 * (1 - np.linspace(0, 1, 3)) + 0.5 * np.linspace(0, 1, 3))
    np.testing.assert_allclose(z[0], want, rtol=1e-6)


def test_stratified_perturb_last_sample_pinned_to_far():
    key = jax.random.PRNGKey(0)
    z = np.asarray(stratified_sample(2.0, 6.0, 64, 128, key=key))
    # monotone, inside [near, far], last sample exactly far
    assert (np.diff(z, axis=-1) > 0).all()
    assert z.min() >= 2.0 and z.max() <= 6.0 + 1e-6
    np.testing.assert_allclose(z[:, -1], 6.0, rtol=1e-6)


def np_sample_pdf_det(bins, weights, N):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, N), cdf.shape[:-1] + (N,))
    inds = np.stack([np.searchsorted(c, uu, side="right")
                     for c, uu in zip(cdf, u)])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = np.take_along_axis(cdf, below, -1)
    cdf_a = np.take_along_axis(cdf, above, -1)
    bins_b = np.take_along_axis(bins, below, -1)
    bins_a = np.take_along_axis(bins, above, -1)
    denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def test_sample_pdf_deterministic_matches_numpy():
    rng = np.random.RandomState(3)
    bins = np.sort(rng.rand(4, 9).astype(np.float32), -1)
    weights = rng.rand(4, 8).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16))
    want = np_sample_pdf_det(bins, weights, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(2, 0)
    w = jnp.zeros((2, 10)).at[:, 5].set(100.0)
    s = np.asarray(sample_pdf(bins, w, 64, key=jax.random.PRNGKey(0)))
    # nearly all mass should fall in bin 5 => samples in [0.5, 0.6]
    frac = ((s >= 0.45) & (s <= 0.65)).mean()
    assert frac > 0.9


# ------------------------------------------------------------- composite

def np_raw2outputs(raw, z_vals, rays_d, bc_rgb):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1 / (1 + np.exp(-raw[..., :3]))
    rgb = np.concatenate([rgb[:, :-1, :], bc_rgb[:, None, :]], 1)
    alpha = 1.0 - np.exp(-(np.maximum(raw[..., 3], 0) + 1e-6) * dists)
    ones = np.ones((alpha.shape[0], 1))
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1), -1)[:, :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    rgb_fg = (weights[:, :-1, None] * rgb[:, :-1, :]).sum(-2)
    depth = (weights * z_vals).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    return rgb_map, disp, acc, weights, depth, rgb_fg


def test_raw2outputs_matches_numpy():
    rng = np.random.RandomState(7)
    R, S = 6, 11
    raw = rng.randn(R, S, 4).astype(np.float32)
    z = np.sort(rng.rand(R, S).astype(np.float32) + 0.5, -1)
    rd = rng.randn(R, 3).astype(np.float32)
    bc = rng.rand(R, 3).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), jnp.asarray(bc))
    rgb, disp, acc, weights, depth, rgb_fg = np_raw2outputs(raw, z, rd, bc)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.disp), disp, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), acc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), weights, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb_fg), rgb_fg, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.last_weight), weights[:, -1], rtol=1e-4, atol=1e-5)


def test_raw2outputs_background_dominates_empty_ray():
    """With sigma=0 everywhere except a huge final-sample distance, the ray
    should composite to (approximately) the background pixel — the bc_rgb
    last-sample trick."""
    R, S = 2, 8
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., 3] = -100.0  # relu(sigma)=0 -> alpha≈1e-6*dist; last dist=1e10
    z = np.broadcast_to(np.linspace(0.5, 1.2, S), (R, S)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    bc = np.array([[1.0, 0.0, 0.5], [0.2, 0.9, 0.1]], np.float32)
    out = raw2outputs(jnp.asarray(raw.copy()), jnp.asarray(z.copy()), jnp.asarray(rd), jnp.asarray(bc))
    np.testing.assert_allclose(np.asarray(out.rgb), bc, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.last_weight), [1.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rgb_fg), 0.0, atol=1e-3)


def test_depth_band_brackets_opaque_surface():
    """depth_band (central 96% of foreground weight mass) collapses onto
    an opaque surface and ignores empty space — the statistic behind
    eval.renderer.subject_depth_range's tightened sampling bounds."""
    R, S = 3, 64
    z = np.broadcast_to(np.linspace(0.5, 2.5, S), (R, S)).astype(np.float32)
    raw = np.full((R, S, 4), -100.0, np.float32)
    # opaque surface at z≈1.4-1.5 (two adjacent hot samples)
    surf = np.argmin(np.abs(z[0] - 1.45))
    raw[:, surf:surf + 2, 3] = 200.0
    rd = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    bc = np.zeros((R, 3), np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd),
                      jnp.asarray(bc))
    band = np.asarray(out.depth_band)
    assert band.shape == (R, 2)
    assert (band[:, 0] >= 1.3).all() and (band[:, 1] <= 1.6).all(), band
    assert (band[:, 1] >= band[:, 0]).all()
    # and the std statistic agrees on a crisp surface
    assert (np.asarray(out.depth_std) < 0.1).all()
