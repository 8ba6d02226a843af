"""Custom-VJP fused MLP backward kernel vs XLA autodiff
(kernels/fused_mlp_grad.py; interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.kernels.fused_mlp_grad import fused_point_mlp_train
from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, apply_folded, fold_conditioning, init_face_nerf,
)
from idealnerf_tpu.core.embedding import positional_encoding


def _setup(seed=0, n=192):
    cfg = FaceNeRFConfig(depth=8, width=256, dim_aud=16, dim_expr=8,
                         dim_latent=4)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    params = init_face_nerf(ks[0], cfg)
    pts = jax.random.uniform(ks[1], (n, 3), minval=-0.6, maxval=0.6)
    dirs = jax.random.normal(ks[2], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    aud = jax.random.normal(ks[3], (16,)) * 0.3
    expr = jax.random.normal(ks[4], (8,)) * 0.3
    latent = jnp.ones((4,)) * 0.1
    return cfg, params, pts, dirs, aud, expr, latent


def _loss_weights(n):
    # a fixed non-uniform cotangent so every output lane matters
    w = jnp.linspace(0.5, 1.5, n)[:, None] * jnp.asarray([1.0, -0.7, 0.3, 0.05])
    return w


def test_vjp_matches_xla_autodiff():
    cfg, params, pts, dirs, aud, expr, latent = _setup()
    n = pts.shape[0]
    w = _loss_weights(n)

    def loss_xla(params):
        folded = fold_conditioning(params, cfg, aud, expr, latent)
        pe = positional_encoding(pts, cfg.multires)
        ped = positional_encoding(dirs, cfg.multires_views)
        raw = apply_folded(params, folded, cfg, pe, ped)
        return jnp.sum(raw * w)

    def loss_kernel(params, grad_dtype):
        folded = fold_conditioning(params, cfg, aud, expr, latent)
        raw = fused_point_mlp_train(cfg, params, folded, pts, dirs,
                                    128, True, grad_dtype)
        return jnp.sum(raw * w)

    # pin matmul precision: XLA CPU's default f32 dot degrades to a bf16
    # pass under oneDNN (environment-dependent — differs between the
    # plain and 8-virtual-device CPU backends), which would corrupt the
    # REFERENCE, not the kernel
    with jax.default_matmul_precision("highest"):
        v_ref, g_ref = jax.value_and_grad(loss_xla)(params)
        v_k, g_k = jax.value_and_grad(
            lambda p: loss_kernel(p, jnp.float32))(params)
        g_k16 = jax.grad(lambda p: loss_kernel(p, jnp.bfloat16))(params)

    # forward: bf16 kernel vs f32 XLA
    assert abs(float(v_ref - v_k)) < 0.02 * abs(float(v_ref)) + 0.05

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_k = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_k)}
    flat_k16 = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_k16)}
    for path, ref in flat_ref:
        name = jax.tree_util.keystr(path)
        ref = np.asarray(ref, np.float32).ravel()
        nref = np.linalg.norm(ref) + 1e-9
        got = np.asarray(flat_k[name], np.float32).ravel()
        # f32 backward reproduces XLA autodiff exactly (measured ~9e-8)
        err = np.linalg.norm(got - ref) / nref
        assert err < 1e-4, f"{name}: f32 norm rel err {err:.2e}"
        # bf16 backward: within bf16 rounding noise (all-bf16 XLA shows
        # 0.018-0.128 on the same leaves)
        got16 = np.asarray(flat_k16[name], np.float32).ravel()
        err16 = np.linalg.norm(got16 - ref) / nref
        assert err16 < 0.15, f"{name}: bf16 norm rel err {err16:.4f}"


def test_vjp_conditioning_gradients_flow():
    """d(loss)/d(aud, expr, latent) arrives via fold_conditioning and
    matches the XLA path (the folded-bias route is the only conditioning
    touchpoint)."""
    cfg, params, pts, dirs, aud, expr, latent = _setup(seed=1, n=128)
    w = _loss_weights(128)

    def loss(cond, use_kernel):
        aud_, expr_, latent_ = cond
        folded = fold_conditioning(params, cfg, aud_, expr_, latent_)
        if use_kernel:
            raw = fused_point_mlp_train(cfg, params, folded, pts, dirs,
                                        128, True)
        else:
            pe = positional_encoding(pts, cfg.multires)
            ped = positional_encoding(dirs, cfg.multires_views)
            raw = apply_folded(params, folded, cfg, pe, ped)
        return jnp.sum(raw * w)

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(lambda c: loss(c, False))((aud, expr, latent))
        g_k = jax.grad(lambda c: loss(c, True))((aud, expr, latent))
    for a, b, name in zip(g_ref, g_k, ("aud", "expr", "latent")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 0.05, name
        assert np.abs(a).max() > 0, f"{name} gradient is zero"


def test_vjp_inside_jit_and_pts_zero_grad():
    cfg, params, pts, dirs, aud, expr, latent = _setup(seed=2, n=128)

    @jax.jit
    def loss(params, pts):
        folded = fold_conditioning(params, cfg, aud, expr, latent)
        raw = fused_point_mlp_train(cfg, params, folded, pts, dirs,
                                    128, True)
        return jnp.mean(raw ** 2)

    g_pts = jax.grad(loss, argnums=1)(params, pts)
    assert g_pts.shape == pts.shape
    np.testing.assert_array_equal(np.asarray(g_pts), 0.0)
    g_params = jax.grad(loss)(params, pts)
    assert float(jnp.abs(g_params["pts"][0]["w"]).max()) > 0
