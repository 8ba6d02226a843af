"""Isolate the Mosaic matmul ceiling for the fused render kernel (round 3).

Production fused_render_rays runs ~105 TF/s ≈ 53% of v5e bf16 peak, and
the inefficiency is proportional (same % at ray_tile 16 and 40), not a
fixed per-step cost. >90% of the kernel's flops are the 8-layer 256-wide
trunk chain, so this benchmarks exactly that chain in isolation:

  V0  grid-streamed (M, 256) tiles through 8x [matmul f32-acc + relu +
      bf16 cast] — the production inner loop, nothing else.
  V2  same without relu (cast only)      — relu cost
  V3  same all-f32 (no casts)            — cast + bf16 speedup check
  VX  pure-XLA chained matmuls, same math on one big array — what XLA
      itself achieves on this dependency chain.

Each variant is its own jitted program (remote-compile quirk: keep
programs to <=2 pallas calls).

Run: PYTHONPATH=/root/repo python scripts/kdiag4.py
Env: KD4=V0,V2,V3,VX  KD4_M=3072,6144,12288  KD4_ROWS=4194304
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 256
DEPTH = 8


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


def chain_kernel(mode, x_ref, *refs):
    out_ref = refs[-1]
    ws = [r[:] for r in refs[:-1]]
    h = x_ref[:]
    for li, w in enumerate(ws):
        acc = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mode == "V0":
            h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
        elif mode == "V2":
            h = acc.astype(jnp.bfloat16)
        elif mode == "V5":   # relu as compare+select in f32
            h = jnp.where(acc > 0.0, acc, 0.0).astype(jnp.bfloat16)
        elif mode == "V6":   # production pattern: bias add before max
            h = jnp.maximum(acc + float(li + 1), 0.0).astype(jnp.bfloat16)
        elif mode == "V7":   # cast first, then max in bf16
            hb = acc.astype(jnp.bfloat16)
            h = jnp.maximum(hb, jnp.zeros((), jnp.bfloat16))
        else:  # V3: all-f32
            h = jnp.maximum(acc, 0.0)
    out_ref[:] = h.astype(jnp.float32)


def run_variant(mode, M, total_rows, dtype):
    n_tiles = total_rows // M
    rows = n_tiles * M
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (rows, W), jnp.float32).astype(dtype)
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (W, W),
                            jnp.float32).astype(dtype) * 0.05
          for i in range(DEPTH)]

    w_specs = [pl.BlockSpec((W, W), lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for _ in ws]
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(chain_kernel, mode),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((M, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM), *w_specs],
            out_specs=pl.BlockSpec((M, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
            compiler_params=cp,
        )(x, *ws)

    dt = timed(lambda: run(x))
    tf = rows * DEPTH * 2 * W * W / dt / 1e12
    print(f"{mode} M={M:6d} dtype={dtype.__name__}: {1e3*dt:7.1f} ms "
          f"{tf:6.1f} TF/s", flush=True)
    return rows, dt


def run_variant_slope(mode, M, dtype):
    """Overhead-free: time total_rows and total_rows/4, use the slope."""
    r1, d1 = run_variant(mode, M, 1024 * 1024, dtype)
    r4, d4 = run_variant(mode, M, 4 * 1024 * 1024, dtype)
    tf = (r4 - r1) * DEPTH * 2 * W * W / max(d4 - d1, 1e-9) / 1e12
    print(f"{mode} M={M:6d} SLOPE: {tf:6.1f} TF/s", flush=True)


def run_xla(total_rows, dtype):
    rows = total_rows
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, W),
                          jnp.float32).astype(dtype)
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (W, W),
                            jnp.float32).astype(dtype) * 0.05
          for i in range(DEPTH)]

    @jax.jit
    def run(x):
        h = x
        for w in ws:
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(acc, 0.0).astype(dtype)
        return h.astype(jnp.float32)

    dt = timed(lambda: run(x))
    tf = rows * DEPTH * 2 * W * W / dt / 1e12
    print(f"VX (XLA)   dtype={dtype.__name__}: {1e3*dt:7.1f} ms "
          f"{tf:6.1f} TF/s", flush=True)


def main():
    which = os.environ.get("KD4", "V0").split(",")
    ms = [int(s) for s in os.environ.get("KD4_M", "3072").split(",")]
    total = int(os.environ.get("KD4_ROWS", str(1024 * 1024)))
    for mode in which:
        if mode == "VX":
            run_xla(total, jnp.bfloat16)
        elif mode == "V3":
            for M in ms:
                run_variant_slope(mode, M, jnp.float32)
        else:
            for M in ms:
                run_variant_slope(mode, M, jnp.bfloat16)


if __name__ == "__main__":
    main()
