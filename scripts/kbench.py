"""Kernel TFLOP/s experiments for the fused NeRF MLP on the real chip.

Honest timing per the axon rules: warm every executable >=2 rounds,
accumulate outputs across repeats and fetch a host scalar.

Usage: python scripts/kbench.py [n_points_log2]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.kernels.fused_mlp import fused_point_mlp
from idealnerf_tpu.models.face_nerf import fold_conditioning, init_face_nerf


def mlp_flops_per_point(cfg):
    macs = 8 * 64 + 8 * 32            # in-kernel PE matmuls
    macs += 64 * 256                   # trunk0
    macs += 7 * 256 * 256              # trunk 1..7
    macs += 64 * 256                   # skip pe extra
    macs += 256 * 128 + 32 * 128       # view0
    macs += 2 * 128 * 128              # view1,2
    macs += 256 * 128 + 128 * 128      # packed heads
    return 2 * macs


def main():
    n = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    cfg = ExperimentConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    nerf_cfg = cfg.face_nerf_config()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    params = init_face_nerf(ks[0], nerf_cfg)
    aud = jax.random.normal(ks[1], (64,))
    expr = jax.random.normal(ks[2], (79,))
    latent = jnp.ones((32,))
    folded = fold_conditioning(params, nerf_cfg, aud, expr, latent)
    pts = jax.random.uniform(ks[3], (n, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(ks[4], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flops = mlp_flops_per_point(nerf_cfg) * n

    def timed(fn, reps=6):
        out = fn()
        float(out.mean())
        out = fn()
        float(out.mean())  # 2 warmups (per-executable inflation)
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            o = fn()
            acc = o if acc is None else acc + o
        float(acc.mean())
        return (time.perf_counter() - t0) / reps

    for tile in (1024, 2048, 4096):
        try:
            f = jax.jit(lambda p, d, t=tile: fused_point_mlp(
                params, folded, nerf_cfg, p, d, tile=t, interpret=False))
            dt = timed(lambda: f(pts, dirs))
            print(f"tile={tile:5d}  {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"tile={tile:5d}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
