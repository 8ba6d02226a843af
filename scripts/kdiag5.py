"""Int8 MXU ceiling for the fused render trunk chain (round 3).

kdiag4 established the bf16 platform ceiling for the production
dependency chain (8x 256^2 matmul + relu + cast) at ~137 TF/s ~= 70% of
v5e bf16 peak, with the production kernel at 77% of that. v5e's int8
MXU peak is 2x bf16 (~394 TOPS), so an int8-quantized trunk is the one
remaining kernel-side lever that could beat the measured ceiling: weights
int8 (per-output-channel scales), activations int8 (requantized between
layers), int32 accumulation.

Variants (each its own jitted program; remote-compile quirk caps pallas
calls per program):

  B0  bf16 baseline == kdiag4 V0, re-measured in the SAME session so the
      int8/bf16 ratio survives tunnel noise.
  I0  int8 chain, realistic requant: int32 acc -> relu (int domain) ->
      f32 scale multiply -> round/clip -> int8. This is what a
      production quantized trunk must pay per layer.
  I1  int8 chain, shift requant: int32 acc -> relu -> arithmetic
      right-shift -> int8. Cheapest possible requant; isolates how much
      of I0 is VPU requant cost vs MXU.
  IX  pure-XLA int8 chain with I0's math — what XLA achieves.

Decision rule (recorded in ROADMAP): pursue a quantized production
trunk only if I0 >= 1.4x B0 on the slope measurement; below that the
quality risk + complexity isn't paid for.

Run: PYTHONPATH=/root/repo python scripts/kdiag5.py
Env: KD5=B0,I0,I1,IX  KD5_M=3072  KD5_OUT=runs/kdiag5.json
CPU check: KD5_INTERP=1 JAX_PLATFORMS=cpu python scripts/kdiag5.py
"""

import functools
import json
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
INTERP = bool(int(os.environ.get("KD5_INTERP", "0")))


def timed(fn, reps=6):
    for _ in range(3):
        out = fn()
        float(jax.tree.leaves(out)[0].astype(jnp.float32).mean())
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        out = jax.tree.leaves(fn())[0].astype(jnp.float32)
        acc = out if acc is None else acc + out
    float(acc.mean())
    return (time.perf_counter() - t0) / reps


def chain_kernel(mode, x_ref, *refs):
    out_ref = refs[-1]
    ws = [r[:] for r in refs[:-1]]
    h = x_ref[:]
    for li, w in enumerate(ws):
        if mode == "B0":
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
        else:
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = jnp.maximum(acc, 0)          # relu commutes with scaling
            if mode == "I0":
                # realistic requant: one f32 scale per layer (per-channel
                # scales fold into the NEXT layer's weight scales, so the
                # in-kernel cost is exactly this tensor-wide multiply)
                q = acc.astype(jnp.float32) * (0.25 / (li + 2.0))
                h = jnp.clip(q + 0.5, 0.0, 127.0).astype(jnp.int8)
            else:                               # I1: shift requant
                h = jnp.clip(acc >> 6, 0, 127).astype(jnp.int8)
    out_ref[:] = h.astype(jnp.float32)


def run_variant(mode, M, total_rows):
    n_tiles = total_rows // M
    rows = n_tiles * M
    if mode == "B0":
        dt_in = jnp.bfloat16
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, W),
                              jnp.float32).astype(dt_in)
        ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (W, W),
                                jnp.float32).astype(dt_in) * 0.05
              for i in range(DEPTH)]
    else:
        dt_in = jnp.int8
        x = jax.random.randint(jax.random.PRNGKey(0), (rows, W), -127, 128,
                               jnp.int32).astype(dt_in)
        ws = [jax.random.randint(jax.random.PRNGKey(i + 1), (W, W), -4, 5,
                                 jnp.int32).astype(dt_in)
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
            interpret=INTERP,
        )(x, *ws)

    if INTERP:
        out = run(x)
        print(f"{mode} interp ok: out[0,:3]={out[0, :3]}", flush=True)
        return rows, 1.0
    dt = timed(lambda: run(x))
    tf = rows * DEPTH * 2 * W * W / dt / 1e12
    print(f"{mode} M={M:6d}: {1e3*dt:7.1f} ms {tf:6.1f} T/s", flush=True)
    return rows, dt


def run_variant_slope(mode, M):
    r1, d1 = run_variant(mode, M, 1024 * 1024)
    if INTERP:
        return 0.0
    r4, d4 = run_variant(mode, M, 4 * 1024 * 1024)
    tf = (r4 - r1) * DEPTH * 2 * W * W / max(d4 - d1, 1e-9) / 1e12
    print(f"{mode} M={M:6d} SLOPE: {tf:6.1f} T/s", flush=True)
    return tf


def run_xla(total_rows):
    rows = total_rows
    x = jax.random.randint(jax.random.PRNGKey(0), (rows, W), -127, 128,
                           jnp.int32).astype(jnp.int8)
    ws = [jax.random.randint(jax.random.PRNGKey(i + 1), (W, W), -4, 5,
                             jnp.int32).astype(jnp.int8)
          for i in range(DEPTH)]

    @jax.jit
    def run(x):
        h = x
        for li, w in enumerate(ws):
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = jnp.maximum(acc, 0)
            q = acc.astype(jnp.float32) * (0.25 / (li + 2.0))
            h = jnp.clip(q + 0.5, 0.0, 127.0).astype(jnp.int8)
        return h.astype(jnp.float32)

    if INTERP:
        print(f"IX interp ok: {run(x)[0, :3]}", flush=True)
        return 0.0
    dt = timed(lambda: run(x))
    tf = rows * DEPTH * 2 * W * W / dt / 1e12
    print(f"IX (XLA int8): {1e3*dt:7.1f} ms {tf:6.1f} T/s", flush=True)
    return tf


def main():
    which = os.environ.get("KD5", "B0,I0,I1,IX").split(",")
    ms = [int(s) for s in os.environ.get("KD5_M", "3072").split(",")]
    results = {}
    for mode in which:
        if mode == "IX":
            results["IX"] = run_xla(1024 * 1024)
        else:
            for M in ms:
                results[f"{mode}_M{M}"] = run_variant_slope(mode, M)
    out = os.environ.get("KD5_OUT")
    if out and not INTERP:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
