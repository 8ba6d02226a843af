"""Per-ray fused render kernel: PE -> conditioned MLP -> alpha-composite,
one Pallas launch, per-ray outputs only.

Replaces the per-point kernel + XLA compositing for the eval hot path
(reference workload: eval_aud_exp_nerf.py:437 — 450²×256 ≈ 52M point
evals/frame). Structural wins over kernels/fused_mlp.py:

- Points never exist in HBM. The kernel receives (R, 8) ray packets and
  (R, S) depths; since PE is linear in the point, the phase matrix is
  ``pts @ F = o @ F + t · (d @ F)`` — two tiny per-ray matmuls plus a
  broadcast multiply-add, instead of materializing (R·S, 3) points and
  (R·S, 8) padded kernel inputs.
- The view-direction PE and its first-layer matmul contribution are
  computed per RAY (S× fewer transcendentals and a (R,32)@(32,128)
  matmul instead of (R·S,32)@(32,128)).
- Compositing happens in-kernel: transmittance cumprod is a log-space
  strictly-lower-triangular (S, S) matmul on the MXU; the per-point
  (R·S, 4) raw output never reaches HBM — only (R, 8) summaries and the
  (R, S) weights (needed by hierarchical sample_pdf and training).

Math parity: identical to core.composite.raw2outputs with
density_activation="relu" and the bc_rgb last-sample substitution
(train/baseline.py:325-375), deterministic sampling (eval semantics).
Equivalence is tested against the XLA path in tests/test_fused_render.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idealnerf_tpu.kernels.fused_mlp import (
    _PE_PAD,
    _PED_PAD,
    _f32dot_hi,
    _pack_weights,
    _pe_operands,
)


def _render_kernel(cfg, n_views: int, S: int, *refs):
    """refs: [o8, d8, vd8, z, bc4, F_p, id_p, F_d, id_d, U]
    + packed weights + [summary_out, weights_out].

    o8 = [ox,oy,oz,1,0,0,0,0] (the 1-lane injects the cos phases via F's
    row 3); d8 = [dx,dy,dz,0,...] (no phase — phases must not scale with
    t); vd8 = unit viewdirs with the 1-lane. bc4 = [r,g,b,|rays_d|].
    U (S, S) strictly-lower-triangular ones: logT = log(1-alpha) @ U is
    the exclusive prefix sum over samples, on the MXU.
    """
    o8, d8, vd8, z_ref = refs[0], refs[1], refs[2], refs[3]
    z = z_ref[:]  # (R, S) f32
    _render_body(cfg, n_views, S, z, refs[0], refs[1], refs[2], refs[4:])


def _pdf_merge(s_coarse: int, n_imp: int, near: float, far: float,
               w, CUM):
    """In-kernel hierarchical sampling: coarse weights (T, s_coarse) ->
    sorted union depths (T, s_coarse + n_imp).

    Replaces the XLA sample_pdf + sort between the two render launches
    (measured ~130 ms/frame at 450² — the masked-reduce materializes
    (R, 128, 63) intermediates and lax.sort runs a full bitonic network):

    - inverse CDF by ascending-overwrite: cdf is monotone in the bin
      index, so 63 unrolled (T, n_imp) where-overwrites leave exactly
      searchsorted(right)'s below/above values (core/sampling.py:91-105
      semantics, same epsilons);
    - deterministic u drawn DESCENDING, so the new samples come out
      descending and [z64_asc ‖ big-pad ‖ zs_desc] is bitonic: one
      8-stage roll-based bitonic merge network yields the sorted union
      that jnp.sort(concat(...)) produces in the XLA path.

    Eval-only (deterministic u; scalar near/far)."""
    T = w.shape[0]
    S = s_coarse + n_imp

    # ---- coarse z (static linspace, recomputed from scalars)
    # int iota + cast: Mosaic's tpu.iota is integer-only
    t64 = jax.lax.broadcasted_iota(jnp.int32, (1, s_coarse), 1).astype(
        jnp.float32) / (s_coarse - 1)
    z64 = near * (1.0 - t64) + far * t64            # (1, s_coarse)
    zmid_np = 0.5 * (np.linspace(near, far, s_coarse)[1:]
                     + np.linspace(near, far, s_coarse)[:-1])  # (B,) python

    # ---- inverse CDF (sample_pdf semantics, key=None)
    wmid = w[:, 1:-1] + 1e-5                        # (T, B-1), B-1 = 62
    pdf = wmid / jnp.sum(wmid, axis=1, keepdims=True)
    cdf = _f32dot_hi(pdf, CUM)                      # inclusive cumsum (T, B-1)

    # u: DESCENDING deterministic linspace (see docstring)
    uj = jax.lax.broadcasted_iota(jnp.int32, (T, n_imp), 1).astype(
        jnp.float32)
    u = 1.0 - uj / (n_imp - 1)

    below_c = jnp.zeros((T, n_imp), jnp.float32)    # cdf_0 = 0 always <= u
    below_b = jnp.full((T, n_imp), float(zmid_np[0]))
    above_c = cdf[:, -1:] * jnp.ones((1, n_imp))    # fallback: last bin
    above_b = jnp.full((T, n_imp), float(zmid_np[-1]))
    n_bins = cdf.shape[1] + 1                       # B = 63 edges
    for b in range(1, n_bins):                      # edge 0 is the init
        cb = cdf[:, b - 1 : b]                      # (T, 1)
        zb = float(zmid_np[b])
        le = cb <= u
        below_c = jnp.where(le, cb, below_c)
        below_b = jnp.where(le, zb, below_b)
    for b in range(n_bins - 1, 0, -1):              # first cdf > u wins
        cb = cdf[:, b - 1 : b]
        zb = float(zmid_np[b])
        gt = cb > u
        above_c = jnp.where(gt, cb, above_c)
        above_b = jnp.where(gt, zb, above_b)
    denom = above_c - below_c
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    zs = below_b + (u - below_c) / denom * (above_b - below_b)  # descending

    # ---- bitonic merge of the sorted union
    n_total = 1 << (S - 1).bit_length()             # next power of two
    pad = n_total - s_coarse - n_imp
    # pad == 0 when S is already a power of two (e.g. 16+16 sweep rungs):
    # a zero-width vector fails Mosaic lowering, so skip the filler
    parts = [jnp.broadcast_to(z64, (T, s_coarse))]
    if pad:
        parts.append(jnp.full((T, pad), 1e10, jnp.float32))
    parts.append(zs)
    c = jnp.concatenate(parts, axis=1)              # (T, n_total) bitonic
    d = n_total // 2
    while d >= 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, n_total), 1)
        first = (lane % (2 * d)) < d
        # pltpu.roll requires shift >= 0: roll by n-d == roll by -d
        partner = jnp.where(first, pltpu.roll(c, n_total - d, 1),
                            pltpu.roll(c, d, 1))
        c = jnp.where(first, jnp.minimum(c, partner),
                      jnp.maximum(c, partner))
        d //= 2
    return c[:, :S]                                 # sorted union (T, S)


def _render_body(cfg, n_views: int, S: int, z, o8, d8, vd8, rest_refs):
    """Shared MLP + composite body; rest_refs = [bc4, F_p, id_p, F_d,
    id_d, U] + packed weights + [summary_ref, weights_ref]."""
    bc4 = rest_refs[0][:]  # materialize: refs don't support None-indexing
    F_p, id_p = rest_refs[1][:], rest_refs[2][:]
    F_d, id_d = rest_refs[3][:], rest_refs[4][:]
    U = rest_refs[5][:]
    summary_ref, weights_ref = rest_refs[-2], rest_refs[-1]
    ops = [r[:] for r in rest_refs[6:-2]]
    cd = ops[0].dtype
    R = o8.shape[0]

    def f32dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # --- positional encoding from ray packets (no points in memory) ---
    # HIGHEST-precision dots: the default f32 dot is one bf16 MXU pass,
    # which corrupts the 512·x phases by ~1 rad (see _f32dot_hi)
    A = _f32dot_hi(o8[:], F_p)        # (R, PE_PAD) incl. phase lanes
    B = _f32dot_hi(d8[:], F_p)        # (R, PE_PAD) no phase
    phases = A[:, None, :] + z[:, :, None] * B[:, None, :]   # (R, S, PE)
    pe = jnp.where(id_p[None] > 0, phases, jnp.sin(phases))
    pe = pe.reshape(R * S, pe.shape[-1]).astype(cd)

    zd = _f32dot_hi(vd8[:], F_d)      # (R, PED_PAD)
    ped = jnp.where(id_d > 0, zd, jnp.sin(zd)).astype(cd)    # per-ray

    # --- trunk (same packed-operand layout as fused_mlp._mlp_body) ---
    depth_n = cfg.depth
    trunk = ops[: 2 * depth_n]
    n_skip = len([i for i in range(1, depth_n) if (i - 1) in cfg.skips])
    skip_pes = ops[2 * depth_n : 2 * depth_n + n_skip]
    rest = ops[2 * depth_n + n_skip :]

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

    # --- view branch; dir-PE contribution added per ray ---
    wv0h, wv0d, bv0 = rest[0], rest[1], rest[2]
    idx = 3
    pv = f32dot(ped, wv0d) + bv0                   # (R, W/2)
    hv = f32dot(h, wv0h).reshape(R, S, -1) + pv[:, None, :]
    hv = jnp.maximum(hv, 0.0).astype(cd).reshape(R * S, -1)
    for _ in range(n_views - 1):
        w, b = rest[idx], rest[idx + 1]
        idx += 2
        hv = jnp.maximum(f32dot(hv, w) + b, 0.0).astype(cd)

    w_alpha, w_rgb, b_heads = rest[idx], rest[idx + 1], rest[idx + 2]
    raw = f32dot(h, w_alpha) + f32dot(hv, w_rgb) + b_heads   # (R*S, 128)
    raw = raw[:, :4].reshape(R, S, 4)

    # --- alpha compositing (raw2outputs semantics) ---
    d_norm = bc4[:, 3:4]                                     # (R, 1)
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1
    ) * d_norm
    sigma = raw[..., 3]
    if cfg.density_activation == "softplus":
        # stable softplus (matches core.composite.raw2outputs to f32
        # rounding; branch is static — cfg is baked into the kernel)
        act = jnp.where(sigma > 20.0, sigma,
                        jnp.log(1.0 + jnp.exp(jnp.minimum(sigma, 20.0))))
    else:
        act = jnp.maximum(sigma, 0.0)
    alpha = 1.0 - jnp.exp(-(act + 1e-6) * dists)
    # max(), NOT `1-alpha+1e-10`: Mosaic reassociates the latter to
    # (1+1e-10)-alpha == 0 at alpha==1, and log(0)=-inf turns the masked
    # (x·0) lanes of the triangular matmul into NaN
    log_t = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    trans = jnp.exp(f32dot(log_t, U))                        # (R, S)
    weights = alpha * trans

    rgb = jax.nn.sigmoid(raw[..., :3])                       # (R, S, 3)
    # bc substitution without a 3-way-broadcast where (Mosaic lowers that
    # select to an unsupported gather): zero the last sample in the
    # reduction and add last_weight·bc as a 2D term. This also IS rgb_fg.
    not_last = (
        jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) < S - 1
    ).astype(jnp.float32)
    last_w = weights[:, S - 1 :]                             # (R, 1)
    rgb_fg = jnp.sum(weights[..., None] * rgb * not_last, axis=1)  # (R, 3)
    rgb_map = rgb_fg + last_w * bc4[:, :3]
    acc = jnp.sum(weights, axis=1, keepdims=True)
    depth_map = jnp.sum(weights * z, axis=1, keepdims=True)

    # sliced stores, NOT one concat of skinny pieces — a >2-piece concat
    # of lane-width 1-3 arrays crashes the TPU compiler backend here
    summary_ref[:, :3] = rgb_map
    summary_ref[:, 3:4] = acc
    summary_ref[:, 4:5] = last_w
    summary_ref[:, 5:6] = depth_map
    summary_ref[:, 6:8] = jnp.zeros((R, 2), jnp.float32)
    weights_ref[:] = weights
    return weights


def _delta_kernel(cfg, n_views: int, s_prev: int, s_uni: int, s_imp: int,
                  far: float, q_lo: float, q_hi: float, *refs):
    """Temporal delta-frame render in ONE launch: depth placement from
    the PREVIOUS frame's (z, w) render distribution + the cached band,
    fine render, compositing, and the next frame's foreground band — the
    whole per-delta-frame pipeline of eval.temporal._field_pipeline with
    nothing but the spatial dilation left in XLA.

    refs (ins): [o8, d8, vd8, bc4, band8(lo,hi,...), z_prev, w_prev,
    F_p, id_p, F_d, id_d, U(S²), CUM, CUMW] + packed weights;
    (outs): [summary, weights, z_out]. S = s_uni + s_imp + 1 (plate pin).

    Depth placement (bit-matches eval.temporal's _delta_depths at f32):
    ``s_imp`` samples inverse-CDF'd over the previous frame's non-plate
    weights (sample_pdf key=None semantics via the same ascending-
    overwrite trick as _pdf_merge — but with PER-RAY bin mids, since the
    previous depths are per-ray, not a static linspace) drawn at
    DESCENDING u, ``s_uni`` uniform across the cached band (ascending),
    so [uni ‖ pad ‖ imp] is bitonic and one merge network sorts the
    union; the plate pin at ``far`` lands last by construction.

    The next band rides out in the summary's spare lanes:
    summary[:, 6:8] = (lo, hi) of the central [q_lo, q_hi] foreground
    mass of THIS frame's weights (eval.temporal.fg_band semantics; the
    cumsum is an upper-triangular MXU matmul on the in-VMEM weights).
    fg mass itself is acc - last_weight — already in the summary."""
    o8, d8, vd8, bc4r, band8, zp_ref, wp_ref = refs[:7]
    CUM, CUMW = refs[12], refs[13]
    ops_refs = refs[14:-3]
    summary_ref, weights_ref, z_ref = refs[-3], refs[-2], refs[-1]
    T = o8.shape[0]
    S = s_uni + s_imp + 1

    zp = zp_ref[:]                                  # (T, s_prev) f32
    wp = wp_ref[:]
    lo = band8[:][:, 0:1]
    hi = band8[:][:, 1:2]

    # ---- inverse CDF over the previous frame's weights (per-ray bins)
    zin = zp[:, : s_prev - 1]                       # drop the plate pin
    mids = 0.5 * (zin[:, 1:] + zin[:, :-1])        # (T, s_prev-2) bins
    win = wp[:, 1 : s_prev - 2] + 1e-5             # (T, s_prev-3)
    pdf = win / jnp.sum(win, axis=1, keepdims=True)
    cdf = _f32dot_hi(pdf, CUM[:])                  # inclusive (T, s_prev-3)

    uj = jax.lax.broadcasted_iota(jnp.int32, (T, s_imp), 1).astype(
        jnp.float32)
    u = 1.0 - uj / (s_imp - 1)                     # descending

    n_edges = s_prev - 2                           # cdf edges incl. cdf_0=0
    below_c = jnp.zeros((T, s_imp), jnp.float32)   # cdf_0 = 0 always <= u
    below_b = mids[:, 0:1] * jnp.ones((1, s_imp), jnp.float32)
    above_c = cdf[:, -1:] * jnp.ones((1, s_imp), jnp.float32)
    above_b = mids[:, -1:] * jnp.ones((1, s_imp), jnp.float32)
    for b in range(1, n_edges):                    # edge 0 is the init
        cb = cdf[:, b - 1 : b]
        zb = mids[:, b : b + 1]
        le = cb <= u
        below_c = jnp.where(le, cb, below_c)
        below_b = jnp.where(le, zb, below_b)
    for b in range(n_edges - 1, 0, -1):            # first cdf > u wins
        cb = cdf[:, b - 1 : b]
        zb = mids[:, b : b + 1]
        gt = cb > u
        above_c = jnp.where(gt, cb, above_c)
        above_b = jnp.where(gt, zb, above_b)
    denom = above_c - below_c
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    zs = below_b + (u - below_c) / denom * (above_b - below_b)  # desc

    # ---- uniform band coverage (ascending)
    tu = jax.lax.broadcasted_iota(jnp.int32, (T, s_uni), 1).astype(
        jnp.float32) / (s_uni - 1)
    zu = lo + (hi - lo) * tu

    # ---- bitonic merge of [uni_asc ‖ pad ‖ imp_desc]
    n_in = s_uni + s_imp
    n_total = 1 << (n_in - 1).bit_length()
    pad = n_total - n_in
    parts = [zu]
    if pad:
        parts.append(jnp.full((T, pad), 1e10, jnp.float32))
    parts.append(zs)
    c = jnp.concatenate(parts, axis=1)
    d = n_total // 2
    while d >= 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, n_total), 1)
        first = (lane % (2 * d)) < d
        partner = jnp.where(first, pltpu.roll(c, n_total - d, 1),
                            pltpu.roll(c, d, 1))
        c = jnp.where(first, jnp.minimum(c, partner),
                      jnp.maximum(c, partner))
        d //= 2
    z = jnp.concatenate(
        [c[:, :n_in], jnp.full((T, 1), far, jnp.float32)], axis=1)

    # ---- fine render + composite on the merged depths
    rest = (refs[3],) + refs[7:12] + ops_refs + (summary_ref, weights_ref)
    weights = _render_body(cfg, n_views, S, z, o8, d8, vd8, rest)

    # ---- next-frame foreground band (fg_band semantics, in VMEM)
    wnp = weights[:, : S - 1]
    znp = z[:, : S - 1]
    cw = _f32dot_hi(wnp, CUMW[:])                  # inclusive cumsum
    total = jnp.maximum(cw[:, -1:], 1e-10)
    big = jnp.float32(1e10)
    lo_n = jnp.min(jnp.where(cw >= q_lo * total, znp, big), axis=1,
                   keepdims=True)
    hi_n = jnp.min(jnp.where(cw >= q_hi * total, znp, big), axis=1,
                   keepdims=True)
    last_np = znp[:, -1:]
    summary_ref[:, 6:7] = jnp.minimum(lo_n, last_np)
    summary_ref[:, 7:8] = jnp.minimum(hi_n, last_np)
    z_ref[:] = z


def _coarse_hier_kernel(cfg, n_views: int, s_coarse: int, n_imp: int,
                        near: float, far: float, *refs):
    """Coarse render + IN-KERNEL hierarchical sampling in one launch:
    refs = [o8, d8, vd8, bc4, F_p, id_p, F_d, id_d, U(s_coarse²), CUM]
    + packed weights + [summary, weights, z_all].

    The coarse depths are the static near/far linspace (eval), so no z
    operand; the freshly computed weights feed _pdf_merge while still in
    VMEM, and the merged fine depths stream out for the fine kernel.
    Folding the pdf into the COARSE kernel (ray tiles ~128) instead of
    the fine one (~16) amortizes the lane ops 8x better — measured: the
    fine-side fold cost ~100 ms/frame, this is ~free; and keeping two
    pallas calls per program avoids the remote-compile failure that a
    separate third pdf launch triggers."""
    T = refs[0].shape[0]
    z_ref = refs[-1]
    t = jax.lax.broadcasted_iota(jnp.int32, (1, s_coarse), 1).astype(
        jnp.float32) / (s_coarse - 1)
    z64 = jnp.broadcast_to(near * (1.0 - t) + far * t, (T, s_coarse))
    weights = _render_body(cfg, n_views, s_coarse, z64, refs[0], refs[1],
                           refs[2], refs[3:9] + refs[10:-1])
    z_ref[:] = _pdf_merge(s_coarse, n_imp, near, far, weights, refs[9][:])


def fused_render_rays(
    params: Dict,
    folded: Dict,
    cfg,
    rays_o: jnp.ndarray,      # (R, 3)
    rays_d: jnp.ndarray,      # (R, 3)
    z_vals: jnp.ndarray,      # (R, S) sample depths (sorted)
    bc_rgb: jnp.ndarray,      # (R, 3) background plate pixels
    point_tile: int = 4096,
    interpret: Optional[bool] = None,
    vmem_limit_mb: Optional[int] = 100,
) -> Dict[str, jnp.ndarray]:
    """Fused render of (R,) rays at given depths -> per-ray outputs.

    Deterministic (eval) semantics: no perturb, no raw noise,
    density_activation='relu'. Returns rgb_map/acc_map/last_weight/
    depth/weights; disp derived by the caller if needed.
    """
    assert cfg.use_viewdirs, "fused render covers the use_viewdirs path"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    compute_dtype = params["pts"][0]["w"].dtype
    if compute_dtype == jnp.float32:
        compute_dtype = jnp.bfloat16

    R, S = z_vals.shape
    ray_tile = max((point_tile // S) // 8 * 8, 8)  # sublane-aligned
    r_pad = (-R) % ray_tile
    n_tiles = (R + r_pad) // ray_tile

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def pack8(x, one_lane: bool):
        parts = [x.astype(jnp.float32)]
        if one_lane:
            parts += [jnp.ones((x.shape[0], 1), jnp.float32),
                      jnp.zeros((x.shape[0], 4), jnp.float32)]
        else:
            parts += [jnp.zeros((x.shape[0], 5), jnp.float32)]
        out = jnp.concatenate(parts, axis=1)
        return jnp.pad(out, ((0, r_pad), (0, 0)))

    o8 = pack8(rays_o, one_lane=True)     # phase lane rides on o
    d8 = pack8(rays_d, one_lane=False)
    vd8 = pack8(viewdirs, one_lane=True)
    bc4 = jnp.concatenate([bc_rgb.astype(jnp.float32), d_norm], axis=1)
    bc4 = jnp.pad(bc4, ((0, r_pad), (0, 0)))
    z_p = jnp.pad(z_vals.astype(jnp.float32), ((0, r_pad), (0, 0)),
                  mode="edge" if r_pad else "constant")
    if r_pad:
        # padded rays: keep z monotone (edge mode copies real rows)
        pass

    F_p, id_p = (jnp.asarray(a) for a in _pe_operands(cfg.multires, _PE_PAD))
    F_d, id_d = (jnp.asarray(a) for a in
                 _pe_operands(cfg.multires_views, _PED_PAD))
    U = jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))  # j < s

    ops = _pack_weights(params, folded, cfg, compute_dtype)
    n_views = 1 + cfg.depth // 4

    def ray_spec(width):
        return pl.BlockSpec((ray_tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec(a.shape, functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                     memory_space=pltpu.VMEM)
        for a in (F_p, id_p, F_d, id_d, U, *ops)
    ]

    summary, weights = pl.pallas_call(
        functools.partial(_render_kernel, cfg, n_views, S),
        grid=(n_tiles,),
        in_specs=[ray_spec(8), ray_spec(8), ray_spec(8), ray_spec(S),
                  ray_spec(4), *const_specs],
        out_specs=(ray_spec(8), ray_spec(S)),
        out_shape=(
            jax.ShapeDtypeStruct((R + r_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, S), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            ) if vmem_limit_mb is not None else None
        ),
    )(o8, d8, vd8, z_p, bc4, F_p, id_p, F_d, id_d, U, *ops)

    summary = summary[:R]
    rgb_map = summary[:, :3]
    last_weight = summary[:, 4]
    return {
        "rgb_map": rgb_map,
        "acc_map": summary[:, 3],
        "last_weight": last_weight,
        "depth": summary[:, 5],
        "weights": weights[:R],
        # composite excluding the forced bg sample (torso compositor input):
        # the last sample's color IS bc_rgb, so subtract its contribution
        "rgb_fg": rgb_map - last_weight[:, None] * bc_rgb,
    }


def fused_render_coarse_hier(
    params: Dict,
    folded: Dict,
    cfg,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    n_imp: int,
    point_tile: int = 8192,
    interpret: Optional[bool] = None,
    vmem_limit_mb: Optional[int] = 100,
):
    """Coarse pass + in-kernel hierarchical sampling (one launch):
    -> (coarse output dict, z_all (R, n_samples + n_imp) fine depths).
    Deterministic eval semantics, scalar near/far (see _coarse_hier_kernel)."""
    assert cfg.use_viewdirs
    near, far = float(near), float(far)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    compute_dtype = params["pts"][0]["w"].dtype
    if compute_dtype == jnp.float32:
        compute_dtype = jnp.bfloat16

    R = rays_o.shape[0]
    s_coarse = n_samples
    S = s_coarse + n_imp
    ray_tile = max((point_tile // s_coarse) // 8 * 8, 8)
    r_pad = (-R) % ray_tile
    n_tiles = (R + r_pad) // ray_tile

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def pack8(x, one_lane: bool):
        parts = [x.astype(jnp.float32)]
        if one_lane:
            parts += [jnp.ones((x.shape[0], 1), jnp.float32),
                      jnp.zeros((x.shape[0], 4), jnp.float32)]
        else:
            parts += [jnp.zeros((x.shape[0], 5), jnp.float32)]
        return jnp.pad(jnp.concatenate(parts, axis=1), ((0, r_pad), (0, 0)))

    o8 = pack8(rays_o, one_lane=True)
    d8 = pack8(rays_d, one_lane=False)
    vd8 = pack8(viewdirs, one_lane=True)
    bc4 = jnp.concatenate([bc_rgb.astype(jnp.float32), d_norm], axis=1)
    bc4 = jnp.pad(bc4, ((0, r_pad), (0, 0)))

    F_p, id_p = (jnp.asarray(a) for a in _pe_operands(cfg.multires, _PE_PAD))
    F_d, id_d = (jnp.asarray(a) for a in
                 _pe_operands(cfg.multires_views, _PED_PAD))
    U = jnp.asarray(np.triu(np.ones((s_coarse, s_coarse), np.float32), k=1))
    n_bins1 = s_coarse - 2
    CUM = jnp.asarray(np.triu(np.ones((n_bins1, n_bins1), np.float32)))

    ops = _pack_weights(params, folded, cfg, compute_dtype)
    n_views = 1 + cfg.depth // 4

    def ray_spec(width):
        return pl.BlockSpec((ray_tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec(a.shape, functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                     memory_space=pltpu.VMEM)
        for a in (F_p, id_p, F_d, id_d, U, CUM, *ops)
    ]

    summary, weights, z_all = pl.pallas_call(
        functools.partial(_coarse_hier_kernel, cfg, n_views, s_coarse,
                          n_imp, near, far),
        grid=(n_tiles,),
        in_specs=[ray_spec(8), ray_spec(8), ray_spec(8), ray_spec(4),
                  *const_specs],
        out_specs=(ray_spec(8), ray_spec(s_coarse), ray_spec(S)),
        out_shape=(
            jax.ShapeDtypeStruct((R + r_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, s_coarse), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, S), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            ) if vmem_limit_mb is not None else None
        ),
    )(o8, d8, vd8, bc4, F_p, id_p, F_d, id_d, U, CUM, *ops)

    summary = summary[:R]
    rgb_map = summary[:, :3]
    last_weight = summary[:, 4]
    coarse = {
        "rgb_map": rgb_map,
        "acc_map": summary[:, 3],
        "last_weight": last_weight,
        "depth": summary[:, 5],
        "weights": weights[:R],
        "rgb_fg": rgb_map - last_weight[:, None] * bc_rgb,
    }
    return coarse, z_all[:R]


def fused_render_delta(
    params: Dict,
    folded: Dict,
    cfg,
    rays_o: jnp.ndarray,      # (R, 3)
    rays_d: jnp.ndarray,      # (R, 3)
    z_prev: jnp.ndarray,      # (R, S_prev) previous frame's depths
    w_prev: jnp.ndarray,      # (R, S_prev) previous frame's weights
    band_lo: jnp.ndarray,     # (R,) cached band
    band_hi: jnp.ndarray,     # (R,)
    bc_rgb: jnp.ndarray,      # (R, 3)
    far: float,               # plate-pin depth (field far)
    s_uni: int,
    s_imp: int,
    q_lo: float = 0.02,
    q_hi: float = 0.98,
    point_tile: int = 4096,
    interpret: Optional[bool] = None,
    vmem_limit_mb: Optional[int] = 100,
) -> Dict[str, jnp.ndarray]:
    """Temporal delta-frame render, ONE pallas launch (see _delta_kernel).

    The fused counterpart of eval.temporal's _delta_depths + fine render
    + fg_band chain: depth placement, MLP, compositing and the next
    foreground band all happen per ray tile in VMEM — the (R, S) depth
    grid never makes an HBM round trip before the render, and the
    delta frame's XLA-side fixed cost (inverse CDF masked-reduces, sort,
    band cumsum) disappears. Equivalence vs the XLA path is tested in
    tests/test_fused_render.py. Requires s_imp >= 2 (deterministic u
    linspace needs a denominator); the plate pin lands at ``far``.

    Returns the fused_render_rays output dict plus ``z_vals`` (the merged
    depth grid, (R, S = s_uni + s_imp + 1)), ``band_lo``/``band_hi`` (the
    central [q_lo, q_hi]-mass band of THIS frame's weights) and
    ``fg_mass`` (acc - last_weight)."""
    assert cfg.use_viewdirs
    assert s_imp >= 2 and s_uni >= 2
    far = float(far)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    compute_dtype = params["pts"][0]["w"].dtype
    if compute_dtype == jnp.float32:
        compute_dtype = jnp.bfloat16

    R = rays_o.shape[0]
    s_prev = z_prev.shape[-1]
    S = s_uni + s_imp + 1
    ray_tile = max((point_tile // S) // 8 * 8, 8)
    r_pad = (-R) % ray_tile
    n_tiles = (R + r_pad) // ray_tile

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def pack8(x, one_lane: bool):
        parts = [x.astype(jnp.float32)]
        if one_lane:
            parts += [jnp.ones((x.shape[0], 1), jnp.float32),
                      jnp.zeros((x.shape[0], 4), jnp.float32)]
        else:
            parts += [jnp.zeros((x.shape[0], 5), jnp.float32)]
        return jnp.pad(jnp.concatenate(parts, axis=1), ((0, r_pad), (0, 0)))

    o8 = pack8(rays_o, one_lane=True)
    d8 = pack8(rays_d, one_lane=False)
    vd8 = pack8(viewdirs, one_lane=True)
    bc4 = jnp.concatenate([bc_rgb.astype(jnp.float32), d_norm], axis=1)
    bc4 = jnp.pad(bc4, ((0, r_pad), (0, 0)))
    band8 = jnp.concatenate(
        [band_lo[:, None].astype(jnp.float32),
         band_hi[:, None].astype(jnp.float32),
         jnp.zeros((R, 6), jnp.float32)], axis=1)
    # edge-pad: padded rays copy a real row so their CDF/band math stays
    # finite (their outputs are sliced off)
    pm = "edge" if r_pad else "constant"
    band8 = jnp.pad(band8, ((0, r_pad), (0, 0)), mode=pm)
    zp = jnp.pad(z_prev.astype(jnp.float32), ((0, r_pad), (0, 0)), mode=pm)
    wp = jnp.pad(w_prev.astype(jnp.float32), ((0, r_pad), (0, 0)), mode=pm)

    F_p, id_p = (jnp.asarray(a) for a in _pe_operands(cfg.multires, _PE_PAD))
    F_d, id_d = (jnp.asarray(a) for a in
                 _pe_operands(cfg.multires_views, _PED_PAD))
    U = jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))
    CUM = jnp.asarray(np.triu(np.ones((s_prev - 3, s_prev - 3), np.float32)))
    CUMW = jnp.asarray(np.triu(np.ones((S - 1, S - 1), np.float32)))

    ops = _pack_weights(params, folded, cfg, compute_dtype)
    n_views = 1 + cfg.depth // 4

    def ray_spec(width):
        return pl.BlockSpec((ray_tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec(a.shape, functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                     memory_space=pltpu.VMEM)
        for a in (F_p, id_p, F_d, id_d, U, CUM, CUMW, *ops)
    ]

    summary, weights, z_all = pl.pallas_call(
        functools.partial(_delta_kernel, cfg, n_views, s_prev, s_uni,
                          s_imp, far, q_lo, q_hi),
        grid=(n_tiles,),
        in_specs=[ray_spec(8), ray_spec(8), ray_spec(8), ray_spec(4),
                  ray_spec(8), ray_spec(s_prev), ray_spec(s_prev),
                  *const_specs],
        out_specs=(ray_spec(8), ray_spec(S), ray_spec(S)),
        out_shape=(
            jax.ShapeDtypeStruct((R + r_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, S), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            ) if vmem_limit_mb is not None else None
        ),
    )(o8, d8, vd8, bc4, band8, zp, wp, F_p, id_p, F_d, id_d, U, CUM,
      CUMW, *ops)

    summary = summary[:R]
    rgb_map = summary[:, :3]
    last_weight = summary[:, 4]
    acc = summary[:, 3]
    return {
        "rgb_map": rgb_map,
        "acc_map": acc,
        "last_weight": last_weight,
        "depth": summary[:, 5],
        "weights": weights[:R],
        "rgb_fg": rgb_map - last_weight[:, None] * bc_rgb,
        "z_vals": z_all[:R],
        "band_lo": summary[:, 6],
        "band_hi": summary[:, 7],
        "fg_mass": acc - last_weight,
    }


def render_rays_fused(
    coarse_params: Dict,
    coarse_folded: Dict,
    cfg,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    near,
    far,
    n_samples: int,
    n_importance: int = 0,
    fine_params: Optional[Dict] = None,
    fine_folded: Optional[Dict] = None,
    lindisp: bool = False,
    point_tile: int = 4096,
    interpret: Optional[bool] = None,
    hier_in_kernel: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical render with both passes in the fused per-ray kernel.

    Deterministic (eval) semantics — the fused counterpart of
    core.render.render_rays with perturb=0 (render_kwargs_test). Returns
    the renderer's output dict keys (rgb_map/acc_map/last_weight/rgb_fg/
    weights, plus rgb0/acc0 when hierarchical).
    """
    from idealnerf_tpu.core.sampling import sample_pdf, stratified_sample

    n_rays = rays_o.shape[0]
    # measured on v5e: small-S (coarse) prefers bigger point tiles
    # (88 TF/s @ 8192 vs 69 @ 4096); large-S (fine) prefers 4096 (105 TF/s)
    coarse_tile = point_tile * 2 if n_samples <= 96 else point_tile
    fp = fine_params if fine_params is not None else coarse_params
    ff = fine_folded if fine_folded is not None else coarse_folded
    # n_importance > 1: _pdf_merge draws u over a (n_imp-1) denominator,
    # so a single importance sample must take the XLA fallback below
    use_hier = (hier_in_kernel and n_importance > 1 and not lindisp
                and np.ndim(near) == 0 and np.ndim(far) == 0)

    if use_hier:
        # coarse + importance sampling + merge in ONE kernel launch
        coarse, z_all = fused_render_coarse_hier(
            coarse_params, coarse_folded, cfg, rays_o, rays_d, bc_rgb,
            near, far, n_samples, n_importance, point_tile=coarse_tile,
            interpret=interpret,
        )
        fine = fused_render_rays(
            fp, ff, cfg, rays_o, rays_d, z_all, bc_rgb,
            point_tile=point_tile, interpret=interpret,
        )
    else:
        z_vals = stratified_sample(near, far, n_samples, n_rays,
                                   key=None, lindisp=lindisp)
        coarse = fused_render_rays(
            coarse_params, coarse_folded, cfg, rays_o, rays_d, z_vals,
            bc_rgb, point_tile=coarse_tile, interpret=interpret,
        )
        if n_importance <= 0:
            return coarse
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(z_mid, coarse["weights"][..., 1:-1],
                               n_importance)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1),
                         axis=-1)
        fine = fused_render_rays(
            fp, ff, cfg, rays_o, rays_d, z_all, bc_rgb,
            point_tile=point_tile, interpret=interpret,
        )
    if n_importance <= 0:
        return coarse
    fine = dict(fine)
    fine.update(
        rgb0=coarse["rgb_map"], acc0=coarse["acc_map"],
        rgb_fg0=coarse["rgb_fg"], last_weight0=coarse["last_weight"],
    )
    return fine
