"""Incremental drag analysis: trunk -> +skip -> +view -> +heads -> +PE.

Useful-FLOP accounting uses each variant's own MAC count, so TF/s are
comparable as 'fraction of executed-op peak'.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from idealnerf_tpu.kernels.fused_mlp import _pe_operands

N = 1 << 21
W = 256


def build(variant, tile):
    rng = np.random.RandomState(0)
    cd = jnp.bfloat16

    w_trunk = jnp.asarray(rng.randn(8, W, W).astype(np.float32) * 0.05, cd)
    b_trunk = jnp.zeros((8, 1, W), jnp.float32)
    w_in = jnp.asarray(rng.randn(64, W).astype(np.float32) * 0.05, cd)
    w_skip = jnp.asarray(rng.randn(64, W).astype(np.float32) * 0.05, cd)
    wv0h = jnp.asarray(rng.randn(W, 128).astype(np.float32) * 0.05, cd)
    wv0d = jnp.asarray(rng.randn(32, 128).astype(np.float32) * 0.05, cd)
    wv = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32) * 0.05, cd)
    bv = jnp.zeros((3, 1, 128), jnp.float32)
    w_ha = jnp.asarray(rng.randn(W, 128).astype(np.float32) * 0.05, cd)
    w_hr = jnp.asarray(rng.randn(128, 128).astype(np.float32) * 0.05, cd)
    bh = jnp.zeros((1, 128), jnp.float32)
    F_p, id_p, sin_p = (jnp.asarray(a) for a in _pe_operands(10, 64))
    F_d, id_d, sin_d = (jnp.asarray(a) for a in _pe_operands(4, 32))

    pe_in = jnp.asarray(rng.randn(N, 64).astype(np.float32), cd)
    ped_in = jnp.asarray(rng.randn(N, 32).astype(np.float32), cd)
    pts8 = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    dirs8 = jnp.asarray(rng.randn(N, 8).astype(np.float32))

    macs = 64 * W + 7 * W * W            # in + trunk
    if variant >= 1:
        macs += 64 * W                    # skip pe
    if variant >= 2:
        macs += W * 128 + 32 * 128 + 2 * 128 * 128
    if variant >= 3:
        macs += W * 128 + 128 * 128
    if variant >= 4:
        macs += 8 * 64 + 8 * 32

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(*refs):
        if variant >= 4:
            p_ref, d_ref = refs[0], refs[1]
            consts = [r[:] for r in refs[2:8]]
            Fp, idp, sinp, Fd, idd, sind = consts
            z = dot(p_ref[:], Fp)
            pe = jnp.where(idp > 0, z,
                           jnp.where(sinp > 0, jnp.sin(z), jnp.cos(z))
                           ).astype(cd)
            z2 = dot(d_ref[:], Fd)
            ped = jnp.where(idd > 0, z2,
                            jnp.where(sind > 0, jnp.sin(z2), jnp.cos(z2))
                            ).astype(cd)
            rest = refs[8:]
        else:
            pe = refs[0][:]
            ped = refs[1][:]
            rest = refs[2:]
        (w_in_r, w_skip_r, w_t, b_t, wv0h_r, wv0d_r, wv_r, bv_r,
         w_ha_r, w_hr_r, bh_r, o_ref) = rest

        h = jnp.maximum(dot(pe, w_in_r[:]) + b_t[0], 0.0).astype(cd)
        for i in range(7):
            acc = dot(h, w_t[i])
            if variant >= 1 and i == 4:
                acc = acc + dot(pe, w_skip_r[:])
            h = jnp.maximum(acc + b_t[i + 1], 0.0).astype(cd)
        out = h
        if variant >= 2:
            hv = jnp.maximum(dot(h, wv0h_r[:]) + dot(ped, wv0d_r[:]) + bv_r[0],
                             0.0).astype(cd)
            for i in range(2):
                hv = jnp.maximum(dot(hv, wv_r[i]) + bv_r[i + 1], 0.0).astype(cd)
            out = jnp.pad(hv, ((0, 0), (0, W - 128)))
        if variant >= 3:
            o4 = dot(h, w_ha_r[:]) + dot(hv, w_hr_r[:]) + bh_r[:]
            out = jnp.pad(o4.astype(cd), ((0, 0), (0, W - 128)))
        o_ref[:] = out

    inputs = ([pts8, dirs8, F_p, id_p, sin_p, F_d, id_d, sin_d]
              if variant >= 4 else [pe_in, ped_in])
    inputs += [w_in, w_skip, w_trunk, b_trunk, wv0h, wv0d, wv, bv,
               w_ha, w_hr, bh]
    specs = []
    for a in inputs:
        if a.shape[0] == N:
            specs.append(pl.BlockSpec((tile,) + a.shape[1:],
                                      lambda i: (i,) + (0,) * (a.ndim - 1),
                                      memory_space=pltpu.VMEM))
        else:
            nd = a.ndim
            specs.append(pl.BlockSpec(a.shape,
                                      lambda i, nd=nd: (0,) * nd,
                                      memory_space=pltpu.VMEM))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid=(N // tile,), in_specs=specs,
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), cd),
    )(*a))
    return f, inputs, 2 * macs * N


def timed(f, args):
    for _ in range(2):
        float(f(*args).astype(jnp.float32).mean())
    reps = 6
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        o = f(*args)
        acc = o if acc is None else acc + o
    float(acc.astype(jnp.float32).mean())
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    names = ["trunk only", "+skip", "+view", "+heads", "+in-kernel PE"]
    for v, name in enumerate(names):
        try:
            f, args, flops = build(v, 2048)
            dt = timed(f, args)
            print(f"v{v} {name:16s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"v{v} {name:16s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
