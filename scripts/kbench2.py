"""Kernel variant experiments: accum dtype, vmem limit, tile sizes."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.kernels.fused_mlp import fused_point_mlp
from idealnerf_tpu.models.face_nerf import fold_conditioning, init_face_nerf
from scripts.kbench import mlp_flops_per_point


def main():
    n = 1 << 21
    cfg = ExperimentConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    nerf_cfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    params = init_face_nerf(ks[0], nerf_cfg)
    folded = fold_conditioning(
        params, nerf_cfg, jax.random.normal(ks[1], (64,)),
        jax.random.normal(ks[2], (79,)), jnp.ones((32,)))
    pts = jax.random.uniform(ks[3], (n, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(ks[4], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flops = mlp_flops_per_point(nerf_cfg) * n

    def timed(fn, reps=6):
        for _ in range(2):
            float(fn().mean())
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            o = fn()
            acc = o if acc is None else acc + o
        float(acc.mean())
        return (time.perf_counter() - t0) / reps

    variants = [
        ("bf16acc t2048", dict(tile=2048, accum_dtype=jnp.bfloat16)),
        ("bf16acc t1024", dict(tile=1024, accum_dtype=jnp.bfloat16)),
        ("f32 t4096 vmem100", dict(tile=4096, vmem_limit_mb=100)),
        ("bf16acc t4096 vmem100",
         dict(tile=4096, accum_dtype=jnp.bfloat16, vmem_limit_mb=100)),
        ("bf16acc t3072", dict(tile=3072, accum_dtype=jnp.bfloat16)),
    ]
    for name, kw in variants:
        try:
            f = jax.jit(lambda p, d, kw=kw: fused_point_mlp(
                params, folded, nerf_cfg, p, d, interpret=False, **kw))
            dt = timed(lambda: f(pts, dirs))
            print(f"{name:26s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
