"""Fused conditioned-NeRF point MLP as a single Pallas TPU kernel.

Why: the XLA path executes the 8×256 trunk as 8 separate HBM-resident
matmuls — at eval workloads (450² × 256 samples ≈ 52M points/frame) every
layer round-trips multi-GB activation tensors through HBM, making the
renderer bandwidth-bound (measured 0.27 fps). This kernel keeps the whole
network — weights (~1 MB bf16) AND per-tile activations — in VMEM: one
grid step processes a tile of points through all trunk layers, the skip
concat, and both heads, touching HBM only for the (T, 64+32) encoded
inputs and the (T, 4) raw output.

Design notes:
- Conditioning is pre-folded into per-frame biases
  (models/face_nerf.py:fold_conditioning), so the kernel is an
  unconditioned MLP — no per-point conditioning concat exists anywhere.
- The skip layer's concat is algebraic: [pe ‖ h] @ W5 = pe @ W5_pe +
  h @ W5_h — two matmuls, no concat buffer.
- PE inputs are padded to MXU-friendly lanes (63→64, 27→32); the rgb and
  alpha heads are packed into one zero-padded (…,128) matmul pair whose
  sum lands rgb in lanes 0..2 and alpha in lane 3.
- bf16 weights/activations, f32 accumulation (preferred_element_type).

Matches the reference MLP semantics (models/face_nerf.py:40-80) exactly;
equivalence vs the XLA path is tested in tests/test_fused_mlp.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idealnerf_tpu.core.embedding import positional_encoding

_PE_PAD = 64   # 63 xyz-PE channels + 1 zero lane
_PED_PAD = 32  # 27 dir-PE channels + 5 zero lanes
DEFAULT_TILE = 2048


def _f32dot_hi(a, b):
    """f32 dot at HIGHEST precision — REQUIRED for the PE phase matmuls.

    Default-precision f32 dot is a single bf16×bf16 pass on the MXU (and
    oneDNN on CPU): at multires=10 the phase 512·x reaches ~300 rad, and
    bf16's ~0.4% relative error is ~1 rad — sin() of that is garbage.
    HIGHEST forces the multi-pass f32 decomposition; the phase matmuls
    are (T, 8)@(8, 64), so the extra passes cost nothing."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_rows(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def _pack_weights(params: Dict, folded: Dict, cfg, compute_dtype):
    """Flatten FaceNeRF params + folded biases into the kernel operand list.

    Layout: [w0, b0, w1, b1, ..., w7, b7, w5pe, wv0h, wv0d, bv0,
             wv1, bv1, wv2, bv2, w_heads_h, w_heads_v, b_heads]
    where w_heads_h (256,128) routes alpha into lane 3 and
    w_heads_v (128,128) routes rgb into lanes 0..2.
    """
    cd = compute_dtype
    pe, in_all, W = cfg.input_ch, cfg.input_ch_all, cfg.width
    ops = []
    for i in range(cfg.depth):
        w = params["pts"][i]["w"]
        if i == 0:
            ops.append(_pad_rows(w[:pe, :], _PE_PAD).astype(cd))
        elif (i - 1) in cfg.skips:
            ops.append(w[in_all:, :].astype(cd))  # h-part; pe-part added below
        else:
            ops.append(w.astype(cd))
        ops.append(folded["b_pts"][i].reshape(1, W).astype(jnp.float32))
    # pe-part of each skip layer
    for i in range(1, cfg.depth):
        if (i - 1) in cfg.skips:
            ops.append(_pad_rows(params["pts"][i]["w"][:pe, :], _PE_PAD).astype(cd))

    wv0 = params["views"][0]["w"]
    ops.append(wv0[:W, :].astype(cd))                                   # wv0h
    ops.append(_pad_rows(wv0[W : W + cfg.input_ch_views, :], _PED_PAD).astype(cd))
    ops.append(folded["b_view0"].reshape(1, W // 2).astype(jnp.float32))
    for layer in params["views"][1:]:
        ops.append(layer["w"].astype(cd))
        ops.append(layer["b"].reshape(1, W // 2).astype(jnp.float32))

    # packed heads: alpha -> lane 3 (from trunk h), rgb -> lanes 0..2 (from hv)
    w_alpha = jnp.zeros((W, 128), jnp.float32).at[:, 3].set(
        params["alpha"]["w"][:, 0]
    )
    w_rgb = jnp.zeros((W // 2, 128), jnp.float32).at[:, :3].set(
        params["rgb"]["w"]
    )
    b_heads = jnp.zeros((1, 128), jnp.float32)
    b_heads = b_heads.at[0, 3].set(params["alpha"]["b"][0])
    b_heads = b_heads.at[0, :3].set(params["rgb"]["b"])
    ops.append(w_alpha.astype(cd))
    ops.append(w_rgb.astype(cd))
    ops.append(b_heads)
    return ops


def _pe_operands(num_freqs: int, out_pad: int):
    """In-kernel PE as one matmul + ONE lane-wise sin:
    ``z = x8 @ F`` places coordinate d scaled by frequency f_k into the
    lane the PE layout expects; cos lanes get a +π/2 phase folded into F
    via the constant-one input lane 3 (``cos(z) = sin(z + π/2)``), so a
    single ``sin`` + one identity-select covers every lane — measured
    72.8 → ~90 TF/s vs the sin+cos+double-select formulation. Layout
    matches core.embedding.positional_encoding:
    [x(3), sin(f0·x)(3), cos(f0·x)(3), sin(f1·x)(3), ...] + zero pad."""
    import numpy as np

    F = np.zeros((8, out_pad), np.float32)
    is_id = np.zeros((1, out_pad), np.float32)
    for d in range(3):
        F[d, d] = 1.0
        is_id[0, d] = 1.0
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    col = 3
    for f in freqs:
        for d in range(3):                 # sin lanes
            F[d, col] = f
            col += 1
        for d in range(3):                 # cos lanes: phase via lane 3
            F[d, col] = f
            F[3, col] = np.pi / 2.0
            col += 1
    # pad lanes: F column zero -> sin(0) = 0
    return F, is_id


def _kernel_fused_pe(cfg, n_views: int, accum_dtype, *refs):
    """refs: [pts(T,8), dirs(T,8), F_p, id_p, F_d, id_d]
    + packed weights + [out]. PE computed in-kernel (f32 trig — bf16
    phases at freq 512 would be garbage), then the same MLP body."""
    pts_ref, dirs_ref = refs[0], refs[1]
    F_p, id_p = refs[2][:], refs[3][:]
    F_d, id_d = refs[4][:], refs[5][:]
    out_ref = refs[-1]
    ops = [r[:] for r in refs[6:-1]]
    cd = ops[0].dtype

    def f32dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def make_pe(x_ref, F, is_id):
        z = _f32dot_hi(x_ref[:], F)   # HIGHEST: see _f32dot_hi docstring
        return jnp.where(is_id > 0, z, jnp.sin(z)).astype(cd)

    pe = make_pe(pts_ref, F_p, id_p)
    ped = make_pe(dirs_ref, F_d, id_d)
    _mlp_body(cfg, n_views, pe, ped, ops, out_ref, accum_dtype)


def _kernel(cfg, n_views: int, accum_dtype, *refs):
    """refs: [pe, ped] + packed weights + [out]."""
    pe_ref, ped_ref = refs[0], refs[1]
    out_ref = refs[-1]
    ops = [r[:] for r in refs[2:-1]]  # materialize weight refs into VMEM values
    _mlp_body(cfg, n_views, pe_ref[:], ped_ref[:], ops, out_ref, accum_dtype)


def _mlp_body(cfg, n_views, pe, ped, ops, out_ref, accum_dtype=jnp.float32):
    depth, W = cfg.depth, cfg.width
    cd = ops[0].dtype

    def dot(a, b):
        # accum_dtype=bf16: MXU still accumulates f32 internally and
        # rounds on output — removes the f32->bf16 VPU cast between layers
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=accum_dtype
        )

    trunk = ops[: 2 * depth]
    skip_pes = ops[2 * depth : 2 * depth + len([i for i in range(1, depth) if (i - 1) in cfg.skips])]
    rest = ops[2 * depth + len(skip_pes) :]

    def bias(b):
        return b.astype(accum_dtype)

    h = jnp.maximum(dot(pe, trunk[0]) + bias(trunk[1]), 0.0).astype(cd)
    s = 0
    for i in range(1, depth):
        w, b = trunk[2 * i], trunk[2 * i + 1]
        if (i - 1) in cfg.skips:
            acc = dot(pe, skip_pes[s]) + dot(h, w) + bias(b)
            s += 1
        else:
            acc = dot(h, w) + bias(b)
        h = jnp.maximum(acc, 0.0).astype(cd)

    idx = 0
    wv0h, wv0d, bv0 = rest[idx], rest[idx + 1], rest[idx + 2]
    idx += 3
    hv = jnp.maximum(dot(h, wv0h) + dot(ped, wv0d) + bias(bv0), 0.0).astype(cd)
    for _ in range(n_views - 1):
        w, b = rest[idx], rest[idx + 1]
        idx += 2
        hv = jnp.maximum(dot(hv, w) + bias(b), 0.0).astype(cd)

    w_alpha, w_rgb, b_heads = rest[idx], rest[idx + 1], rest[idx + 2]
    # heads always accumulate/emit f32 (sigma feeds exp() in compositing)
    def f32dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    out = f32dot(h, w_alpha) + f32dot(hv, w_rgb) + b_heads
    out_ref[:] = out[:, :4]


def fused_point_mlp(
    params: Dict,
    folded: Dict,
    cfg,
    pts: jnp.ndarray,               # (N, 3) raw sample points
    dirs: Optional[jnp.ndarray],    # (N, 3) per-point view directions
    tile: int = DEFAULT_TILE,
    interpret: Optional[bool] = None,
    fuse_pe: bool = True,
    accum_dtype=jnp.float32,
    vmem_limit_mb: Optional[int] = None,
) -> jnp.ndarray:
    """(N, 4) raw [rgb logits, sigma] — fused MLP evaluation.

    ``fuse_pe=True`` computes the positional encodings inside the kernel
    (matmul + lane-masked trig — see _pe_operands), so the only per-point
    HBM traffic is the raw (N, 8) coords in and (N, 4) raw out; the XLA
    path otherwise materializes the (N, 96) encoded features."""
    assert cfg.use_viewdirs and dirs is not None, (
        "fused kernel covers the use_viewdirs path; use apply_folded otherwise"
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    compute_dtype = params["pts"][0]["w"].dtype
    if compute_dtype == jnp.float32:
        compute_dtype = jnp.bfloat16  # MXU-native; accumulation stays f32

    n = pts.shape[0]
    n_pad = (-n) % tile
    ops = _pack_weights(params, folded, cfg, compute_dtype)
    n_views = 1 + cfg.depth // 4
    n_tiles = (n + n_pad) // tile
    compiler_params = None
    if vmem_limit_mb is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )
    w_specs = [
        pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for op in ops
    ]

    if fuse_pe:
        def pad8(x):
            # lanes: [x, y, z, 1, 0, 0, 0, 0] — lane 3 carries the cos
            # phase offsets folded into the PE matrix (_pe_operands).
            # Built with concat, NOT .at[:, 3].set: the scatter defeats
            # XLA fusion and cost 13 ms/frame (67 -> 50 TF/s measured).
            x = x.astype(jnp.float32)
            x = jnp.concatenate(
                [x, jnp.ones_like(x[:, :1]),
                 jnp.zeros((x.shape[0], 4), x.dtype)], axis=1
            )
            return jnp.pad(x, ((0, n_pad), (0, 0)))

        pts8 = pad8(pts)
        dirs8 = pad8(dirs)
        F_p, id_p = (jnp.asarray(a) for a in _pe_operands(cfg.multires, _PE_PAD))
        F_d, id_d = (jnp.asarray(a) for a in
                     _pe_operands(cfg.multires_views, _PED_PAD))
        pe_ops = [F_p, id_p, F_d, id_d]
        pe_specs = [
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for op in pe_ops
        ]
        raw = pl.pallas_call(
            functools.partial(_kernel_fused_pe, cfg, n_views, accum_dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *pe_specs,
                *w_specs,
            ],
            out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n + n_pad, 4), jnp.float32),
            interpret=interpret,
            compiler_params=compiler_params,
        )(pts8, dirs8, *pe_ops, *ops)
        return raw[:n]

    pe = positional_encoding(pts, cfg.multires).astype(compute_dtype)
    ped = positional_encoding(dirs, cfg.multires_views).astype(compute_dtype)
    pe = jnp.pad(pe, ((0, n_pad), (0, _PE_PAD - pe.shape[1])))
    ped = jnp.pad(ped, ((0, n_pad), (0, _PED_PAD - ped.shape[1])))

    raw = pl.pallas_call(
        functools.partial(_kernel, cfg, n_views, accum_dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, _PE_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, _PED_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, 4), jnp.float32),
        # NOTE: no cost_estimate — a hand-written one measurably degraded
        # Mosaic's pipeline scheduling here (57 -> 69 TFLOP/s on removal)
        interpret=interpret,
        compiler_params=compiler_params,
    )(pe, ped, *ops)
    return raw[:n]
