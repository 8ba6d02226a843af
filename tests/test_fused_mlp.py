"""Fused Pallas point-MLP must match the XLA folded path (interpret mode
on CPU; the same kernel compiles on TPU — exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from idealnerf_tpu.core.embedding import positional_encoding
from idealnerf_tpu.kernels.fused_mlp import fused_point_mlp
from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, apply_folded, fold_conditioning, init_face_nerf,
)


def _setup(dim_aud=64, dim_expr=79, dim_latent=32, n=300, seed=0):
    cfg = FaceNeRFConfig(dim_aud=dim_aud, dim_expr=dim_expr, dim_latent=dim_latent)
    params = init_face_nerf(jax.random.PRNGKey(seed), cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 5)
    pts = jax.random.normal(ks[0], (n, 3))
    dirs = jax.random.normal(ks[1], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    aud = jax.random.normal(ks[2], (dim_aud,)) if dim_aud else None
    expr = jax.random.normal(ks[3], (dim_expr,)) if dim_expr else None
    latent = jax.random.normal(ks[4], (dim_latent,)) if dim_latent else None
    folded = fold_conditioning(params, cfg, aud, expr, latent)
    return cfg, params, folded, pts, dirs


def _reference(cfg, params, folded, pts, dirs):
    pe = positional_encoding(pts, cfg.multires)
    ped = positional_encoding(dirs, cfg.multires_views)
    return apply_folded(params, folded, cfg, pe, ped)


def test_fused_matches_xla_path():
    cfg, params, folded, pts, dirs = _setup()
    want = np.asarray(_reference(cfg, params, folded, pts, dirs))
    got = np.asarray(
        fused_point_mlp(params, folded, cfg, pts, dirs, tile=128, interpret=True)
    )
    assert got.shape == want.shape == (300, 4)
    # bf16 weights in the kernel vs f32 XLA: compare loosely but meaningfully
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 0.08, (
        np.max(np.abs(got - want) / denom)
    )
    # correlation must be ~1 (same function, lower precision)
    for c in range(4):
        r = np.corrcoef(got[:, c], want[:, c])[0, 1]
        assert r > 0.999, (c, r)


def test_fused_exact_padding_boundary():
    """n exactly divisible by tile and n = 1 both work."""
    cfg, params, folded, pts, dirs = _setup(n=256)
    out = fused_point_mlp(params, folded, cfg, pts, dirs, tile=128, interpret=True)
    assert out.shape == (256, 4)
    out1 = fused_point_mlp(params, folded, cfg, pts[:1], dirs[:1], tile=128,
                           interpret=True)
    assert out1.shape == (1, 4)
    np.testing.assert_allclose(
        np.asarray(out[:1]), np.asarray(out1), rtol=1e-2, atol=1e-2
    )


def test_fused_no_conditioning():
    cfg, params, folded, pts, dirs = _setup(dim_aud=0, dim_expr=0, dim_latent=0, n=64)
    want = np.asarray(_reference(cfg, params, folded, pts, dirs))
    got = np.asarray(
        fused_point_mlp(params, folded, cfg, pts, dirs, tile=64, interpret=True)
    )
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 0.08
