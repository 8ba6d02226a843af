"""Diagnose the fused-MLP kernel bottleneck: is it relu/cast VPU
serialization between matmuls, or MXU issue overhead?

K1: 8 chained (T,256)@(256,256) matmuls, f32 acc, no activation (bf16 cast only)
K2: same with bias+relu between layers (the real pattern)
K3: same as K2 but two half-tiles interleaved (independent chains)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 21
L = 8
W = 256


def k_plain(x_ref, w_ref, o_ref):
    h = x_ref[:]
    for i in range(L):
        h = jax.lax.dot_general(h, w_ref[i], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
    o_ref[:] = h


def k_relu(x_ref, w_ref, b_ref, o_ref):
    h = x_ref[:]
    for i in range(L):
        acc = jax.lax.dot_general(h, w_ref[i], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + b_ref[i], 0.0).astype(jnp.bfloat16)
    o_ref[:] = h


def k_relu2(x_ref, w_ref, b_ref, o_ref):
    t2 = x_ref.shape[0] // 2
    ha = x_ref[:t2]
    hb = x_ref[t2:]
    for i in range(L):
        acca = jax.lax.dot_general(ha, w_ref[i], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        accb = jax.lax.dot_general(hb, w_ref[i], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ha = jnp.maximum(acca + b_ref[i], 0.0).astype(jnp.bfloat16)
        hb = jnp.maximum(accb + b_ref[i], 0.0).astype(jnp.bfloat16)
    o_ref[:t2] = ha
    o_ref[t2:] = hb


def run(kernel, tile, with_bias):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, W), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (L, W, W), jnp.bfloat16) * 0.05
    b = jnp.zeros((L, 1, W), jnp.float32)
    n_tiles = N // tile
    specs = [
        pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, W, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w]
    if with_bias:
        specs.append(pl.BlockSpec((L, 1, W), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(b)
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.bfloat16),
    )(*a))
    for _ in range(2):
        float(f(*args).astype(jnp.float32).mean())
    reps = 6
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        o = f(*args)
        acc = o if acc is None else acc + o
    float(acc.astype(jnp.float32).mean())
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * N * W * W * L
    return dt * 1e3, flops / dt / 1e12


def k3_ref(i, w_ref, b_ref):
    pass


if __name__ == "__main__":
    for name, kern, tile, wb in [
        ("plain t2048", k_plain, 2048, False),
        ("relu  t2048", k_relu, 2048, True),
        ("relu2 t2048", k_relu2, 2048, True),
        ("plain t1024", k_plain, 1024, False),
        ("relu2 t4096", k_relu2, 4096, True),
        ("relu  t512 ", k_relu, 512, True),
    ]:
        try:
            ms, tf = run(kern, tile, wb)
            print(f"{name}: {ms:7.2f} ms  {tf:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
