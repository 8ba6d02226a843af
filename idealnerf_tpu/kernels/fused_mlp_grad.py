"""Training backward kernel: custom VJP for the fused point MLP.

The XLA autodiff path materializes every trunk activation (N, 256) in HBM
during the forward and reads it back in the backward — at the paper train
workload (786k points/step) that is ~10 GB of HBM traffic per step. This
VJP instead:

- forward = the existing fused kernel (kernels/fused_mlp.fused_point_mlp,
  PE in-kernel) — only (N, 8) coords in, (N, 4) raw out;
- backward = ONE Pallas kernel per tile that *recomputes* the forward
  activations in VMEM (rematerialization — FLOPs are cheap, HBM is not)
  and runs the full backward pass: weight-gradient partial sums
  accumulate across grid steps into VMEM-resident f32 accumulators
  (TPU grid steps are sequential, so `out_ref[:] +=` with a step-0 init
  is exact), bias gradients via ones-vector reductions on the MXU.

Differentiable inputs are (params, folded): conditioning gradients flow
through ``fold_conditioning`` in XLA (the folded biases are the only
conditioning touchpoint — models/face_nerf.py fold_conditioning), so
d(aud)/d(expr)/d(latent)/d(latent_codes) and the conditioning slices of
W0/W_skip/Wv0 need no kernel support. Points/dirs carry no parameter
gradient (fine z is stop_gradient'd, core/render.py:103; rays are data),
so their cotangents are zero.

Used by the train step via make_field_fn(..., use_pallas="train").
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idealnerf_tpu.kernels.fused_mlp import (
    _PE_PAD, _PED_PAD, _f32dot_hi, _pack_weights, _pe_operands,
    fused_point_mlp,
)

TRAIN_TILE = 1024


def _n_skips(cfg):
    return len([i for i in range(1, cfg.depth) if (i - 1) in cfg.skips])


def _grad_kernel(cfg, n_views: int, *refs):
    """refs: [pts8, dirs8, g4, F_p, id_p, F_d, id_d] + packed weights
    + [grad outputs (one per packed operand)].

    Recomputes the forward (same math as fused_mlp._kernel_fused_pe, f32
    accumulation), then backprops. relu' is (h > 0) on the recomputed
    post-activation — exact, since relu(x) > 0 iff x > 0 drove the
    forward's max."""
    depth, W = cfg.depth, cfg.width
    n_skip = _n_skips(cfg)
    n_ops = 2 * depth + n_skip + 3 + 2 * (n_views - 1) + 3

    pts8, dirs8, g_ref = refs[0], refs[1], refs[2]
    F_p, id_p = refs[3][:], refs[4][:]
    F_d, id_d = refs[5][:], refs[6][:]
    ops = [r[:] for r in refs[7 : 7 + n_ops]]
    grefs = refs[7 + n_ops :]
    assert len(grefs) == n_ops, (len(grefs), n_ops)
    cd = ops[0].dtype

    def f32dot(a, b, ta=False, tb=False):
        dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
        # f32 operands at default precision = ONE bf16 MXU pass — would
        # silently void grad_dtype=f32's exactness; bf16 operands are
        # single-pass native and need no override
        prec = (jax.lax.Precision.HIGHEST
                if a.dtype == jnp.float32 and b.dtype == jnp.float32
                else None)
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    # ---- forward recompute (keep every activation in VMEM)
    def make_pe(x_ref, F, is_id):
        z = _f32dot_hi(x_ref[:], F)   # HIGHEST: see _f32dot_hi docstring
        return jnp.where(is_id > 0, z, jnp.sin(z)).astype(cd)

    pe = make_pe(pts8, F_p, id_p)
    ped = make_pe(dirs8, F_d, id_d)

    trunk = ops[: 2 * depth]
    skip_pes = ops[2 * depth : 2 * depth + n_skip]
    rest = ops[2 * depth + n_skip :]

    hs = [jnp.maximum(f32dot(pe, trunk[0]) + trunk[1], 0.0).astype(cd)]
    s_i = 0
    for i in range(1, depth):
        w, b = trunk[2 * i], trunk[2 * i + 1]
        if (i - 1) in cfg.skips:
            acc = f32dot(pe, skip_pes[s_i]) + f32dot(hs[-1], w) + b
            s_i += 1
        else:
            acc = f32dot(hs[-1], w) + b
        hs.append(jnp.maximum(acc, 0.0).astype(cd))

    wv0h, wv0d, bv0 = rest[0], rest[1], rest[2]
    hvs = [jnp.maximum(
        f32dot(hs[-1], wv0h) + f32dot(ped, wv0d) + bv0, 0.0).astype(cd)]
    idx = 3
    for _ in range(n_views - 1):
        w, b = rest[idx], rest[idx + 1]
        idx += 2
        hvs.append(jnp.maximum(f32dot(hvs[-1], w) + b, 0.0).astype(cd))
    w_alpha, w_rgb = rest[idx], rest[idx + 1]

    # ---- backward
    # g arrives 8 lanes wide (HBM thrift: a 128-lane cotangent array is
    # 8.6 GB at second-stage crop scale); widen to the packed heads'
    # 128 lanes in VMEM
    g = jnp.concatenate(
        [g_ref[:], jnp.zeros((g_ref.shape[0], 120), jnp.float32)], axis=1)
    gb = g.astype(cd)

    step0 = pl.program_id(0) == 0

    def emit(ref, val):
        @pl.when(step0)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val

    def relu_mask(h):
        # compare in f32: Mosaic rejects bf16 cmpf ("Target does not
        # support this comparison"); relu(x) > 0 iff x > 0 either way
        return h.astype(jnp.float32) > 0

    n_grefs = list(grefs)
    g_trunk = n_grefs[: 2 * depth]
    g_skip = n_grefs[2 * depth : 2 * depth + n_skip]
    g_rest = n_grefs[2 * depth + n_skip :]

    # heads: out = h7 @ w_alpha + hv_last @ w_rgb + b_heads
    emit(g_rest[idx], f32dot(hs[-1], gb, ta=True))          # d w_alpha
    emit(g_rest[idx + 1], f32dot(hvs[-1], gb, ta=True))     # d w_rgb
    emit(g_rest[idx + 2], jnp.sum(g, 0, keepdims=True))     # d b_heads
    d_h = f32dot(g, w_alpha.astype(jnp.float32), tb=True)   # (T, W)
    d_hv = f32dot(g, w_rgb.astype(jnp.float32), tb=True)    # (T, W/2)

    # view stack backward
    for vi in range(n_views - 1, 0, -1):
        w = rest[3 + 2 * (vi - 1)]
        d_hv = d_hv * relu_mask(hvs[vi])
        emit(g_rest[3 + 2 * (vi - 1)], f32dot(hvs[vi - 1], d_hv.astype(cd), ta=True))
        emit(g_rest[4 + 2 * (vi - 1)], jnp.sum(d_hv, 0, keepdims=True))
        d_hv = f32dot(d_hv.astype(cd), w, tb=True)
    d_hv = d_hv * relu_mask(hvs[0])
    emit(g_rest[0], f32dot(hs[-1], d_hv.astype(cd), ta=True))   # d wv0h
    emit(g_rest[1], f32dot(ped, d_hv.astype(cd), ta=True))      # d wv0d
    emit(g_rest[2], jnp.sum(d_hv, 0, keepdims=True))            # d bv0
    d_h = d_h + f32dot(d_hv.astype(cd), wv0h, tb=True)

    # trunk backward
    s_i = n_skip - 1
    for i in range(depth - 1, 0, -1):
        w = trunk[2 * i]
        d_h = d_h * relu_mask(hs[i])
        dcd = d_h.astype(cd)
        emit(g_trunk[2 * i], f32dot(hs[i - 1], dcd, ta=True))
        emit(g_trunk[2 * i + 1], jnp.sum(d_h, 0, keepdims=True))
        if (i - 1) in cfg.skips:
            emit(g_skip[s_i], f32dot(pe, dcd, ta=True))
            s_i -= 1
        d_h = f32dot(dcd, w, tb=True)
    d_h = d_h * relu_mask(hs[0])
    emit(g_trunk[0], f32dot(pe, d_h.astype(cd), ta=True))
    emit(g_trunk[1], jnp.sum(d_h, 0, keepdims=True))


def _run_grad_kernel(cfg, pts, dirs, g, ops, tile, interpret):
    n = pts.shape[0]
    n_pad = (-n) % tile
    n_tiles = (n + n_pad) // tile
    n_views = 1 + cfg.depth // 4

    def pad8(x, one_lane):
        x = x.astype(jnp.float32)
        parts = [x]
        if one_lane:
            parts += [jnp.ones((x.shape[0], 1), jnp.float32),
                      jnp.zeros((x.shape[0], 4), jnp.float32)]
        else:
            parts += [jnp.zeros((x.shape[0], 5), jnp.float32)]
        return jnp.pad(jnp.concatenate(parts, 1), ((0, n_pad), (0, 0)))

    pts8 = pad8(pts, one_lane=True)
    dirs8 = pad8(dirs, one_lane=True)
    g8 = jnp.pad(g.astype(jnp.float32), ((0, n_pad), (0, 4)))

    F_p, id_p = (jnp.asarray(a) for a in _pe_operands(cfg.multires, _PE_PAD))
    F_d, id_d = (jnp.asarray(a) for a in
                 _pe_operands(cfg.multires_views, _PED_PAD))

    def const_spec(a):
        return pl.BlockSpec(a.shape,
                            functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                            memory_space=pltpu.VMEM)

    out_shapes = tuple(
        jax.ShapeDtypeStruct(op.shape, jnp.float32) for op in ops
    )
    out_specs = tuple(const_spec(op) for op in ops)

    grads = pl.pallas_call(
        functools.partial(_grad_kernel, cfg, n_views),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *(const_spec(a) for a in (F_p, id_p, F_d, id_d)),
            *(const_spec(op) for op in ops),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(pts8, dirs8, g8, F_p, id_p, F_d, id_d, *ops)
    return grads


def _unpack_grads(grads, params, folded, cfg):
    """Packed-operand gradients -> (d_params, d_folded) pytrees.

    Conditioning slices of W0 / skip / Wv0 stay zero here — their
    gradient arrives via d_folded through fold_conditioning's autodiff."""
    depth = cfg.depth
    n_skip = _n_skips(cfg)
    pe, in_all, W = cfg.input_ch, cfg.input_ch_all, cfg.width

    g_trunk = grads[: 2 * depth]
    g_skip = grads[2 * depth : 2 * depth + n_skip]
    g_rest = grads[2 * depth + n_skip :]

    def zeros_like_f32(x):
        return jnp.zeros(x.shape, jnp.float32)

    d_params = jax.tree.map(zeros_like_f32, params)
    d_folded = jax.tree.map(zeros_like_f32, folded)

    d_pts = []
    s_i = 0
    for i in range(depth):
        w = params["pts"][i]["w"]
        dw = zeros_like_f32(w)
        gw = g_trunk[2 * i]
        if i == 0:
            dw = dw.at[:pe].set(gw[:pe])
        elif (i - 1) in cfg.skips:
            dw = dw.at[:pe].set(g_skip[s_i][:pe])
            dw = dw.at[in_all:].set(gw)
            s_i += 1
        else:
            dw = gw
        d_pts.append({"w": dw, "b": zeros_like_f32(params["pts"][i]["b"])})
    d_params["pts"] = d_pts
    d_folded["b_pts"] = [g_trunk[2 * i + 1].reshape(-1) for i in range(depth)]

    wv0 = params["views"][0]["w"]
    dv0 = zeros_like_f32(wv0)
    dv0 = dv0.at[:W].set(g_rest[0])
    dv0 = dv0.at[W : W + cfg.input_ch_views].set(
        g_rest[1][: cfg.input_ch_views])
    d_views = [{"w": dv0, "b": zeros_like_f32(params["views"][0]["b"])}]
    d_folded["b_view0"] = g_rest[2].reshape(-1)
    idx = 3
    for layer in params["views"][1:]:
        d_views.append({"w": g_rest[idx],
                        "b": g_rest[idx + 1].reshape(-1)})
        idx += 2
    d_params["views"] = d_views
    d_params["alpha"] = {"w": g_rest[idx][:, 3:4],
                         "b": g_rest[idx + 2][0, 3:4]}
    d_params["rgb"] = {"w": g_rest[idx + 1][:, :3],
                       "b": g_rest[idx + 2][0, :3]}
    return d_params, d_folded


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7))
def fused_point_mlp_train(
    cfg,
    params: Dict,
    folded: Dict,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    tile: int = TRAIN_TILE,
    interpret: Optional[bool] = None,
    grad_dtype=jnp.float32,
) -> jnp.ndarray:
    """(N, 4) raw — fused forward with a fused rematerializing backward.

    ``grad_dtype`` sets the backward kernel's recompute/matmul dtype:
    f32 (default) reproduces XLA-f32 gradients exactly (measured 9e-8);
    bf16 runs the backward at MXU-native speed with ~7% norm noise on
    the deepest layer's gradient — the same deviation an all-bf16 XLA
    path shows (0.087), since the noise IS bf16 rounding."""
    return fused_point_mlp(params, folded, cfg, pts, dirs, tile=tile,
                           interpret=interpret)


def _fwd(cfg, params, folded, pts, dirs, tile, interpret, grad_dtype):
    raw = fused_point_mlp(params, folded, cfg, pts, dirs, tile=tile,
                          interpret=interpret)
    return raw, (params, folded, pts, dirs)


def _bwd(cfg, tile, interpret, grad_dtype, res, g):
    params, folded, pts, dirs = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops = _pack_weights(params, folded, cfg, grad_dtype)
    grads = _run_grad_kernel(cfg, pts, dirs, g, ops, tile, interpret)
    d_params, d_folded = _unpack_grads(grads, params, folded, cfg)
    d_params = jax.tree.map(lambda d, p: d.astype(p.dtype), d_params, params)
    d_folded = jax.tree.map(lambda d, p: d.astype(p.dtype), d_folded, folded)
    return (d_params, d_folded, jnp.zeros_like(pts), jnp.zeros_like(dirs))


fused_point_mlp_train.defvjp(_fwd, _bwd)
