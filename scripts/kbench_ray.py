"""Per-ray fused render kernel: TF/s sweep + full-frame decomposition.

Where do the full-fidelity 740 ms/frame go? Times fused_render_rays in
isolation at the frame workload (coarse S=64, fine S=192), sweeps
point_tile, then times the assembled frame renderer to expose non-kernel
overhead (sample_pdf, sort, dispatch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.kernels.fused_render import fused_render_rays
from idealnerf_tpu.models.face_nerf import fold_conditioning, init_face_nerf
from idealnerf_tpu.core.sampling import sample_pdf, stratified_sample


def mlp_flops_per_point(cfg):
    W = cfg.width
    f = 2 * (64 * W)                    # entry (padded PE)
    for i in range(1, cfg.depth):
        f += 2 * (W * W)
        if (i - 1) in cfg.skips:
            f += 2 * (64 * W)
    f += 2 * (W * (W // 2))             # view entry (h part)
    f += 2 * (2 * (W // 2) * (W // 2))  # view 1..2
    f += 2 * (W * 128) + 2 * ((W // 2) * 128)  # packed heads
    return f


def timed(fn, reps=4):
    for _ in range(3):
        out = fn()
        float(jax.tree.leaves(out)[0].mean())
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        out = jax.tree.leaves(fn())[0]
        acc = out if acc is None else acc + out
    float(acc.mean())
    return (time.perf_counter() - t0) / reps


def main():
    R = 202_500                      # 450²
    cfg = ExperimentConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    ncfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_face_nerf(ks[0], ncfg))
    folded = fold_conditioning(
        params, ncfg, jax.random.normal(ks[1], (64,), jnp.bfloat16),
        jax.random.normal(ks[2], (79,), jnp.bfloat16),
        jnp.ones((32,), jnp.bfloat16))
    rays_o = jax.random.uniform(ks[3], (R, 3))
    rays_d = jax.random.normal(ks[4], (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    bc = jax.random.uniform(ks[5], (R, 3))
    fpp = mlp_flops_per_point(ncfg)

    for S in (64, 192):
        z = jnp.broadcast_to(
            jnp.linspace(0.58, 1.18, S)[None], (R, S))

        pts_sweep = [int(s) for s in
                     os.environ.get("KB_TILES", "4096,8192").split(",")]
        for pt in pts_sweep:
            @jax.jit
            def run(z=z, pt=pt):
                return fused_render_rays(
                    params, folded, ncfg, rays_o, rays_d, z, bc,
                    point_tile=pt)["rgb_map"]
            try:
                dt = timed(lambda: run())
                tf = R * S * fpp / dt / 1e12
                print(f"S={S} pt={pt}: {1e3*dt:7.1f} ms  {tf:6.1f} TF/s")
            except Exception as e:
                print(f"S={S} pt={pt}: FAIL {str(e)[:100]}")

    # non-kernel overhead: sample_pdf + sort at frame scale
    z64 = jnp.broadcast_to(jnp.linspace(0.58, 1.18, 64)[None], (R, 64))
    w = jax.random.uniform(jax.random.PRNGKey(9), (R, 64))

    @jax.jit
    def pdf_sort(w):
        z_mid = 0.5 * (z64[..., 1:] + z64[..., :-1])
        zs = sample_pdf(z_mid, w[..., 1:-1], 128)
        return jnp.sort(jnp.concatenate([z64, zs], -1), -1)

    dt = timed(lambda: pdf_sort(w))
    print(f"sample_pdf+sort (frame): {1e3*dt:.1f} ms")


if __name__ == "__main__":
    main()
