"""Equivalence of the per-ray fused render kernel vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.core.composite import raw2outputs
from idealnerf_tpu.core.sampling import stratified_sample
from idealnerf_tpu.kernels.fused_render import fused_render_rays
from idealnerf_tpu.models.face_nerf import (
    fold_conditioning, init_face_nerf, make_field_fn,
)


@pytest.mark.parametrize("n_rays,n_samples,density", [
    (64, 32, "relu"), (100, 64, "relu"), (64, 32, "softplus")])
def test_fused_render_matches_xla(n_rays, n_samples, density):
    # the softplus case guards against the kernel silently compositing
    # with relu for softplus-configured fields (it did until round 3 —
    # every pallas eval path rendered softplus models wrong)
    cfg = ExperimentConfig(dim_aud=16, dim_expr=8, dim_latent=4,
                           N_samples=n_samples, N_importance=0,
                           density_activation=density)
    nerf_cfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    params = init_face_nerf(ks[0], nerf_cfg)
    aud = jax.random.normal(ks[1], (16,))
    expr = jax.random.normal(ks[2], (8,))
    latent = jax.random.normal(ks[3], (4,)) * 0.1
    folded = fold_conditioning(params, nerf_cfg, aud, expr, latent)

    rays_o = jnp.zeros((n_rays, 3)) + jnp.array([0.0, 0.0, 1.5])
    rays_d = (jax.random.normal(ks[4], (n_rays, 3)) * 0.08
              + jnp.array([0.0, 0.0, -1.0]))
    bc = jax.random.uniform(ks[5], (n_rays, 3))
    near, far = 0.6, 2.2
    z_vals = stratified_sample(near, far, n_samples, n_rays, key=None)

    out = fused_render_rays(params, folded, nerf_cfg, rays_o, rays_d,
                            z_vals, bc, point_tile=512)

    # XLA reference: bf16 compute to match the kernel's MXU dtype
    field_fn = make_field_fn(params, nerf_cfg, aud, expr, latent,
                             compute_dtype=jnp.bfloat16)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    raw = field_fn(pts, viewdirs)
    ref = raw2outputs(raw, z_vals, rays_d, bc, density_activation=density)

    np.testing.assert_allclose(out["rgb_map"], ref.rgb, atol=3e-2)
    np.testing.assert_allclose(out["acc_map"], ref.acc, atol=3e-2)
    np.testing.assert_allclose(out["weights"], ref.weights, atol=3e-2)
    np.testing.assert_allclose(out["last_weight"], ref.last_weight, atol=3e-2)
    np.testing.assert_allclose(out["rgb_fg"], ref.rgb_fg, atol=3e-2)
    # correlation check: bf16 tolerances above must not hide structure loss
    c = np.corrcoef(np.asarray(out["rgb_map"]).ravel(),
                    np.asarray(ref.rgb).ravel())[0, 1]
    assert c > 0.999


def test_fused_render_bg_ray_is_plate():
    """A ray that misses all density must composite exactly to the plate."""
    cfg = ExperimentConfig(dim_aud=8, dim_expr=0, dim_latent=0,
                           N_samples=32, N_importance=0)
    nerf_cfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    params = init_face_nerf(ks[0], nerf_cfg)
    # force density head to strongly negative -> alpha ~ 0 everywhere
    params["alpha"]["b"] = params["alpha"]["b"] - 100.0
    aud = jax.random.normal(ks[1], (8,))
    folded = fold_conditioning(params, nerf_cfg, aud)

    n = 16
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    bc = jax.random.uniform(ks[2], (n, 3))
    z_vals = stratified_sample(0.5, 1.5, 32, n, key=None)
    out = fused_render_rays(params, folded, nerf_cfg, rays_o, rays_d,
                            z_vals, bc, point_tile=512)
    np.testing.assert_allclose(out["rgb_map"], bc, atol=1e-3)
    np.testing.assert_allclose(out["rgb_fg"], jnp.zeros((n, 3)), atol=1e-3)


def test_hier_in_kernel_matches_xla_pdf_path():
    """Coarse+importance-sampling-in-kernel (fused_render_coarse_hier:
    ascending-overwrite inverse CDF + bitonic merge) reproduces the XLA
    sample_pdf + sort path bit-for-bit at f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.kernels.fused_render import render_rays_fused
    from idealnerf_tpu.models.face_nerf import (
        fold_conditioning, init_face_nerf,
    )

    cfg = ExperimentConfig(dim_aud=16, dim_expr=8, dim_latent=4)
    ncfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    params = init_face_nerf(ks[0], ncfg)
    folded = fold_conditioning(params, ncfg,
                               jax.random.normal(ks[1], (16,)),
                               jax.random.normal(ks[2], (8,)),
                               jnp.ones((4,)))
    R = 64
    ro = jax.random.uniform(ks[3], (R, 3), minval=-0.2, maxval=0.2)
    rd = jax.random.normal(ks[4], (R, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    bc = jax.random.uniform(ks[5], (R, 3))
    # 64+128 (paper) and 16+16 (a power-of-two total: the bitonic-merge
    # filler is zero-width there — regression for a Mosaic lowering crash
    # on the sample-sweep rungs)
    for n_s, n_i in ((64, 128), (16, 16)):
        kw = dict(near=0.5772, far=1.1772, n_samples=n_s,
                  n_importance=n_i, point_tile=1024)
        out_h = render_rays_fused(params, folded, cfg=ncfg, rays_o=ro,
                                  rays_d=rd, bc_rgb=bc,
                                  hier_in_kernel=True, **kw)
        out_x = render_rays_fused(params, folded, cfg=ncfg, rays_o=ro,
                                  rays_d=rd, bc_rgb=bc,
                                  hier_in_kernel=False, **kw)
        for k in ("rgb_map", "acc_map", "last_weight", "depth", "rgb0",
                  "acc0"):
            np.testing.assert_allclose(np.asarray(out_h[k]),
                                       np.asarray(out_x[k]), atol=2e-6), k


def test_fused_delta_matches_xla_chain():
    """fused_render_delta (temporal delta frame in ONE launch: per-ray
    inverse CDF over the previous frame's weights + uniform band samples
    + bitonic merge + plate pin + render + next fg band) reproduces the
    XLA chain eval.temporal builds from sample_pdf/sort/fused_render_rays
    /fg_band, at f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.core.sampling import sample_pdf
    from idealnerf_tpu.eval.temporal import fg_band
    from idealnerf_tpu.kernels.fused_render import (
        fused_render_delta, fused_render_rays,
    )
    from idealnerf_tpu.models.face_nerf import (
        fold_conditioning, init_face_nerf,
    )

    cfg = ExperimentConfig(dim_aud=16, dim_expr=8, dim_latent=4)
    ncfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    params = init_face_nerf(ks[0], ncfg)
    folded = fold_conditioning(params, ncfg,
                               jax.random.normal(ks[1], (16,)),
                               jax.random.normal(ks[2], (8,)),
                               jnp.ones((4,)))
    R = 48
    near, far = 0.5772, 1.1772
    ro = jax.random.uniform(ks[3], (R, 3), minval=-0.2, maxval=0.2)
    rd = jax.random.normal(ks[4], (R, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    bc = jax.random.uniform(ks[5], (R, 3))

    def imp_from(z_src, w_src, count):     # eval.temporal._imp_from
        zin = z_src[..., :-1]
        win = w_src[..., :-1]
        mids = 0.5 * (zin[..., 1:] + zin[..., :-1])
        return sample_pdf(mids, win[..., 1:-1], count, key=None)

    # s_prev = steady-state s_delta width AND a keyframe-rung width
    # (the first delta frame of a cycle consumes the keyframe's grid)
    for s_prev, (s_uni, s_imp) in ((16, (3, 12)), (24, (4, 11))):
        kz = jax.random.split(ks[6], 2)
        z_in = jnp.sort(jax.random.uniform(
            kz[0], (R, s_prev - 1), minval=near, maxval=far), axis=-1)
        z_prev = jnp.concatenate(
            [z_in, jnp.full((R, 1), far, jnp.float32)], axis=1)
        w_prev = jax.random.uniform(kz[1], (R, s_prev), minval=0.0,
                                    maxval=0.1)
        lo = jnp.full((R,), near + 0.1) + 0.05 * jax.random.uniform(
            ks[7], (R,))
        hi = lo + 0.2 + 0.1 * jax.random.uniform(ks[8], (R,))

        out_k = fused_render_delta(
            params, folded, ncfg, ro, rd, z_prev, w_prev, lo, hi, bc,
            far, s_uni, s_imp, point_tile=512)

        # XLA reference chain (eval.temporal stage_delta semantics)
        t = jnp.linspace(0.0, 1.0, s_uni, dtype=jnp.float32)
        parts = [imp_from(z_prev, w_prev, s_imp),
                 lo[:, None] + (hi - lo)[:, None] * t[None]]
        z = jnp.sort(jnp.concatenate(parts, -1), axis=-1)
        z = jnp.concatenate([z, jnp.full((R, 1), far, jnp.float32)], 1)
        out_x = fused_render_rays(params, folded, ncfg, ro, rd, z, bc,
                                  point_tile=512)
        lo_x, hi_x, mass_x = fg_band(z, out_x["weights"])

        np.testing.assert_allclose(np.asarray(out_k["z_vals"]),
                                   np.asarray(z), atol=2e-6)
        for k in ("rgb_map", "acc_map", "last_weight", "depth",
                  "weights", "rgb_fg"):
            np.testing.assert_allclose(np.asarray(out_k[k]),
                                       np.asarray(out_x[k]),
                                       atol=2e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(out_k["band_lo"]),
                                   np.asarray(lo_x), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out_k["band_hi"]),
                                   np.asarray(hi_x), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out_k["fg_mass"]),
                                   np.asarray(mass_x), atol=2e-6)
