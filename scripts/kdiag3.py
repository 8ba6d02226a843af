"""Bisect the fused render kernel's TF/s gap (round 3).

Production fused_render_rays runs at ~93 (S=64) / ~105 (S=192) TF/s
~= 53% of v5e bf16 peak. Three kernels isolate where the rest goes:

  A  bare MLP chain (pe given): trunk + skip + view + heads — the
     Mosaic matmul ceiling at this layout/tile size.
  B  A + in-kernel PE (per-ray phase matmuls, broadcast fma, sin).
  C  B + in-kernel compositing (log-T triangular matmul, reductions)
     == production math.

Run on the real chip: PYTHONPATH=/root/repo python scripts/kdiag3.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.kernels.fused_mlp import (
    _PE_PAD, _PED_PAD, _f32dot_hi, _pack_weights, _pe_operands,
)
from idealnerf_tpu.models.face_nerf import fold_conditioning, init_face_nerf


def f32dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def mlp_part(cfg, n_views, pe, ped_row, ops, cd, R, S):
    """Trunk + skip + view + heads from pe (R*S, 64) and per-ray ped."""
    depth_n = cfg.depth
    trunk = ops[: 2 * depth_n]
    n_skip = len([i for i in range(1, depth_n) if (i - 1) in cfg.skips])
    skip_pes = ops[2 * depth_n: 2 * depth_n + n_skip]
    rest = ops[2 * depth_n + n_skip:]

    h = jnp.maximum(f32dot(pe, trunk[0]) + trunk[1], 0.0).astype(cd)
    s_i = 0
    for i in range(1, depth_n):
        w, b = trunk[2 * i], trunk[2 * i + 1]
        if (i - 1) in cfg.skips:
            acc = f32dot(pe, skip_pes[s_i]) + f32dot(h, w) + b
            s_i += 1
        else:
            acc = f32dot(h, w) + b
        h = jnp.maximum(acc, 0.0).astype(cd)

    wv0h, wv0d, bv0 = rest[0], rest[1], rest[2]
    idx = 3
    pv = f32dot(ped_row, wv0d) + bv0
    hv = f32dot(h, wv0h).reshape(R, S, -1) + pv[:, None, :]
    hv = jnp.maximum(hv, 0.0).astype(cd).reshape(R * S, -1)
    for _ in range(n_views - 1):
        w, b = rest[idx], rest[idx + 1]
        idx += 2
        hv = jnp.maximum(f32dot(hv, w) + b, 0.0).astype(cd)

    w_alpha, w_rgb, b_heads = rest[idx], rest[idx + 1], rest[idx + 2]
    raw = f32dot(h, w_alpha) + f32dot(hv, w_rgb) + b_heads
    return raw


def kernel_A(cfg, n_views, S, pe_ref, ped_ref, *refs):
    out_ref = refs[-1]
    ops = [r[:] for r in refs[:-1]]
    cd = ops[0].dtype
    R = ped_ref.shape[0]
    pe = pe_ref[:]
    raw = mlp_part(cfg, n_views, pe, ped_ref[:], ops, cd, R, S)
    out_ref[:] = raw[:, :4].reshape(R, S * 4)


def pe_part(z, o8, d8, vd8, F_p, id_p, F_d, id_d, cd, R, S):
    A = _f32dot_hi(o8, F_p)
    B = _f32dot_hi(d8, F_p)
    phases = A[:, None, :] + z[:, :, None] * B[:, None, :]
    pe = jnp.where(id_p[None] > 0, phases, jnp.sin(phases))
    pe = pe.reshape(R * S, pe.shape[-1]).astype(cd)
    zd = _f32dot_hi(vd8, F_d)
    ped = jnp.where(id_d > 0, zd, jnp.sin(zd)).astype(cd)
    return pe, ped


def kernel_B(cfg, n_views, S, o8_ref, d8_ref, vd8_ref, z_ref, *refs):
    out_ref = refs[-1]
    F_p, id_p = refs[0][:], refs[1][:]
    F_d, id_d = refs[2][:], refs[3][:]
    ops = [r[:] for r in refs[4:-1]]
    cd = ops[0].dtype
    R = o8_ref.shape[0]
    pe, ped = pe_part(z_ref[:], o8_ref[:], d8_ref[:], vd8_ref[:],
                      F_p, id_p, F_d, id_d, cd, R, S)
    raw = mlp_part(cfg, n_views, pe, ped, ops, cd, R, S)
    out_ref[:] = raw[:, :4].reshape(R, S * 4)


def kernel_C(cfg, n_views, S, o8_ref, d8_ref, vd8_ref, z_ref, *refs):
    sum_ref, w_ref = refs[-2], refs[-1]
    bc4 = refs[0][:]
    F_p, id_p = refs[1][:], refs[2][:]
    F_d, id_d = refs[3][:], refs[4][:]
    U = refs[5][:]
    ops = [r[:] for r in refs[6:-2]]
    cd = ops[0].dtype
    R = o8_ref.shape[0]
    z = z_ref[:]
    pe, ped = pe_part(z, o8_ref[:], d8_ref[:], vd8_ref[:],
                      F_p, id_p, F_d, id_d, cd, R, S)
    raw = mlp_part(cfg, n_views, pe, ped, ops, cd, R, S)
    raw = raw[:, :4].reshape(R, S, 4)
    d_norm = bc4[:, 3:4]
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1
    ) * d_norm
    sigma = raw[..., 3]
    alpha = 1.0 - jnp.exp(-(jnp.maximum(sigma, 0.0) + 1e-6) * dists)
    log_t = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    trans = jnp.exp(f32dot(log_t, U))
    weights = alpha * trans
    rgb = jax.nn.sigmoid(raw[..., :3])
    not_last = (jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
                < S - 1).astype(jnp.float32)
    last_w = weights[:, S - 1:]
    rgb_fg = jnp.sum(weights[..., None] * rgb * not_last, axis=1)
    rgb_map = rgb_fg + last_w * bc4[:, :3]
    sum_ref[:, :3] = rgb_map
    sum_ref[:, 3:4] = jnp.sum(weights, axis=1, keepdims=True)
    sum_ref[:, 4:5] = last_w
    sum_ref[:, 5:6] = jnp.sum(weights * z, axis=1, keepdims=True)
    sum_ref[:, 6:8] = jnp.zeros((R, 2), jnp.float32)
    w_ref[:] = weights


def timed(fn, reps=8):
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


def mlp_flops_per_point(cfg):
    W = cfg.width
    f = 2 * (64 * W)
    for i in range(1, cfg.depth):
        f += 2 * (W * W)
        if (i - 1) in cfg.skips:
            f += 2 * (64 * W)
    f += 2 * (W * (W // 2))
    f += 2 * (2 * (W // 2) * (W // 2))
    f += 2 * (W * 128) + 2 * ((W // 2) * 128)
    return f


def main():
    R = int(os.environ.get("KD3_R", "202500"))
    cfg = ExperimentConfig(dim_aud=64, dim_expr=79, dim_latent=32)
    ncfg = cfg.face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_face_nerf(ks[0], ncfg))
    folded = fold_conditioning(
        params, ncfg, jax.random.normal(ks[1], (64,), jnp.bfloat16),
        jax.random.normal(ks[2], (79,), jnp.bfloat16),
        jnp.ones((32,), jnp.bfloat16))
    cd = jnp.bfloat16
    ops = _pack_weights(params, folded, ncfg, cd)
    n_views = 1 + ncfg.depth // 4
    fpp = mlp_flops_per_point(ncfg)

    rays_o = jax.random.uniform(ks[3], (R, 3))
    rays_d = jax.random.normal(ks[4], (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    bc = jax.random.uniform(ks[5], (R, 3))
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    F_p, id_p = (jnp.asarray(a) for a in _pe_operands(ncfg.multires, _PE_PAD))
    F_d, id_d = (jnp.asarray(a) for a in
                 _pe_operands(ncfg.multires_views, _PED_PAD))

    which = os.environ.get("KD3", "ABC")
    tiles = [int(s) for s in os.environ.get("KD3_TILES", "4096").split(",")]
    s_list = [int(s) for s in os.environ.get("KD3_S", "64,192").split(",")]

    for S in s_list:
        z = jnp.broadcast_to(jnp.linspace(0.58, 1.18, S)[None], (R, S))
        U = jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))
        for pt in tiles:
            ray_tile = max((pt // S) // 8 * 8, 8)
            r_pad = (-R) % ray_tile
            n_tiles = (R + r_pad) // ray_tile
            Rp = R + r_pad

            def pad(x):
                return jnp.pad(x.astype(jnp.float32), ((0, r_pad), (0, 0)))

            def pack8(x, one_lane):
                parts = [x.astype(jnp.float32)]
                if one_lane:
                    parts += [jnp.ones((x.shape[0], 1), jnp.float32),
                              jnp.zeros((x.shape[0], 4), jnp.float32)]
                else:
                    parts += [jnp.zeros((x.shape[0], 5), jnp.float32)]
                return pad(jnp.concatenate(parts, axis=1))

            o8 = pack8(rays_o, True)
            d8 = pack8(rays_d, False)
            vd8 = pack8(rays_d, True)
            bc4 = pad(jnp.concatenate([bc, d_norm], axis=1))
            z_p = pad(z)

            def ray_spec(width):
                return pl.BlockSpec((ray_tile, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)

            def const_specs(arrs):
                return [pl.BlockSpec(
                    a.shape,
                    functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                    memory_space=pltpu.VMEM) for a in arrs]

            cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

            if "A" in which:
                # pe precomputed once, outside the timed region; jitted —
                # the eager per-op chain was pathologically slow through
                # the axon remote-compile tunnel (>20 min, killed)
                @jax.jit
                def _pe_precompute(o8, d8, vd8, z_p):
                    A_ = _f32dot_hi(o8, F_p)
                    B_ = _f32dot_hi(d8, F_p)
                    phases = A_[:, None, :] + z_p[:, :, None] * B_[:, None, :]
                    pe_full = jnp.where(
                        id_p[None] > 0, phases, jnp.sin(phases)
                    ).reshape(Rp * S, _PE_PAD).astype(cd)
                    zd = _f32dot_hi(vd8, F_d)
                    ped_full = jnp.where(id_d > 0, zd, jnp.sin(zd)).astype(cd)
                    return pe_full, ped_full

                print(f"A S={S} pt={pt}: precomputing pe...", flush=True)
                pe_full, ped_full = _pe_precompute(o8, d8, vd8, z_p)
                jax.block_until_ready((pe_full, ped_full))
                print(f"A S={S} pt={pt}: pe done, launching", flush=True)

                pe_spec = pl.BlockSpec((ray_tile * S, _PE_PAD),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)

                @jax.jit
                def runA(pe_full=pe_full, ped_full=ped_full, S=S,
                         ray_tile=ray_tile, n_tiles=n_tiles, Rp=Rp,
                         pe_spec=pe_spec):
                    return pl.pallas_call(
                        functools.partial(kernel_A, ncfg, n_views, S),
                        grid=(n_tiles,),
                        in_specs=[pe_spec, ray_spec(_PED_PAD),
                                  *const_specs(ops)],
                        out_specs=ray_spec(S * 4),
                        out_shape=jax.ShapeDtypeStruct((Rp, S * 4),
                                                       jnp.float32),
                        interpret=False, compiler_params=cp,
                    )(pe_full, ped_full, *ops)
                try:
                    dt = timed(runA)
                    tf = R * S * fpp / dt / 1e12
                    print(f"A S={S} pt={pt}: {1e3*dt:7.1f} ms  {tf:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"A S={S} pt={pt}: FAIL {str(e)[:200]}", flush=True)

            if "B" in which:
                @jax.jit
                def runB(S=S, ray_tile=ray_tile, n_tiles=n_tiles, Rp=Rp,
                         o8=o8, d8=d8, vd8=vd8, z_p=z_p):
                    return pl.pallas_call(
                        functools.partial(kernel_B, ncfg, n_views, S),
                        grid=(n_tiles,),
                        in_specs=[ray_spec(8), ray_spec(8), ray_spec(8),
                                  ray_spec(S),
                                  *const_specs([F_p, id_p, F_d, id_d]),
                                  *const_specs(ops)],
                        out_specs=ray_spec(S * 4),
                        out_shape=jax.ShapeDtypeStruct((Rp, S * 4),
                                                       jnp.float32),
                        interpret=False, compiler_params=cp,
                    )(o8, d8, vd8, z_p, F_p, id_p, F_d, id_d, *ops)
                try:
                    dt = timed(runB)
                    tf = R * S * fpp / dt / 1e12
                    print(f"B S={S} pt={pt}: {1e3*dt:7.1f} ms  {tf:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"B S={S} pt={pt}: FAIL {str(e)[:200]}", flush=True)

            if "C" in which:
                @jax.jit
                def runC(S=S, ray_tile=ray_tile, n_tiles=n_tiles, Rp=Rp,
                         o8=o8, d8=d8, vd8=vd8, z_p=z_p, bc4=bc4, U=U):
                    return pl.pallas_call(
                        functools.partial(kernel_C, ncfg, n_views, S),
                        grid=(n_tiles,),
                        in_specs=[ray_spec(8), ray_spec(8), ray_spec(8),
                                  ray_spec(S), ray_spec(4),
                                  *const_specs([F_p, id_p, F_d, id_d, U]),
                                  *const_specs(ops)],
                        out_specs=(ray_spec(8), ray_spec(S)),
                        out_shape=(
                            jax.ShapeDtypeStruct((Rp, 8), jnp.float32),
                            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
                        ),
                        interpret=False, compiler_params=cp,
                    )(o8, d8, vd8, z_p, bc4, F_p, id_p, F_d, id_d, U, *ops)
                try:
                    dt = timed(runC)
                    tf = R * S * fpp / dt / 1e12
                    print(f"C S={S} pt={pt}: {1e3*dt:7.1f} ms  {tf:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"C S={S} pt={pt}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
