"""Temporal depth-cache video renderers — the round-3 lever past the
per-frame fast path.

A talking-head video is one mostly-static surface: between consecutive
frames the per-pixel depth of the head/torso surface moves by at most a
few pixels laterally and a tiny fraction of the depth interval axially.
The reference re-renders every frame from scratch at 64+192 samples over
the full [near, far] interval (test_torso.py:513-534 — both fields, all
pixels; eval_aud_exp_nerf.py:437 head-only). Here only KEYFRAMES (every
``refresh_every`` frames) pay the full hierarchical schedule; in-between
DELTA frames resample each ray only inside a narrow per-ray depth band
carried over from the previous frame (the z interval holding the central
96% of that ray's foreground weight mass, spatially dilated to tolerate
lateral motion, re-estimated every frame from the delta pass's own
weights).

Exactness structure:

- A keyframe IS the full fused render (fused_render_coarse_hier +
  fused_render_rays over the merged depths — identical computation to
  kernels.fused_render.render_rays_fused's hierarchical path), restricted
  to the prior rays like the fast paths.
- A delta frame evaluates the FINE network at ``s_delta`` depths per ray
  (band-confined linspace + the pinned plate sample at far, matching the
  reference's t_rand[-1]=1 plate pin — helper.py:66-69 semantics), so its
  cost is ``s_delta / (n_samples + 2·n_importance)`` of a full frame on
  the same rays (64+192 ⇒ 32-sample deltas are 8× fewer point evals;
  the band is typically ≤10% of the interval, so sample DENSITY inside
  the band is far higher than the full render's).
- Rays whose cached band is invalid (no foreground mass above
  ``fg_thresh`` in their dilation window) fall back to the field's own
  [near, far] (optionally tightened) interval at the same ``s_delta``.

TPU-native details: every program holds at most ONE pallas launch (the
axon remote-compile constraint eval/renderer.py documents); all ray
selections are compile-time numpy constants; the cache lives on-device
as a pytree threaded functionally through ``render`` (no host round
trips inside the frame loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.core.rays import get_rays
from idealnerf_tpu.core.sampling import sample_pdf


def fg_band(z_vals: jnp.ndarray, weights: jnp.ndarray,
            q_lo: float = 0.02, q_hi: float = 0.98):
    """Per-ray foreground depth band + mass from render weights.

    ``(lo, hi, fg_mass)`` where [lo, hi] holds the central
    ``q_hi - q_lo`` of the ray's foreground weight mass (the final
    plate sample is excluded). Same masked-min trick as
    core.composite.raw2outputs' depth_band (no searchsorted)."""
    w = weights[..., :-1]
    z = z_vals[..., :-1]
    cw = jnp.cumsum(w, axis=-1)
    total = jnp.maximum(cw[..., -1:], 1e-10)
    big = jnp.asarray(1e10, z.dtype)
    lo = jnp.min(jnp.where(cw >= q_lo * total, z, big), axis=-1)
    hi = jnp.min(jnp.where(cw >= q_hi * total, z, big), axis=-1)
    lo = jnp.minimum(lo, z[..., -1])
    hi = jnp.minimum(hi, z[..., -1])
    return lo, hi, cw[..., -1]


def _window2d(grid, init, op, k):
    """(k, k) min/max window as two 1-D passes (min/max are separable:
    2k taps instead of k² — this runs per delta frame per field)."""
    g = jax.lax.reduce_window(grid, init, op, (k, 1), (1, 1), "SAME")
    return jax.lax.reduce_window(g, init, op, (1, k), (1, 1), "SAME")


def dilate_bands(lo, hi, valid, sel, H, W, radius: int,
                 fb_lo: float, fb_hi: float):
    """Spatially dilate per-ray bands over the image grid.

    Valid rays scatter their band into the (H, W) grid; each sel pixel
    then takes the min-lo / max-hi over a (2r+1)² window — a ray the
    subject is about to move INTO inherits its neighbours' band. Pixels
    with no valid ray in the window fall back to ``[fb_lo, fb_hi]``."""
    big = jnp.float32(1e10)
    glo = jnp.full((H * W,), big, jnp.float32).at[sel].set(
        jnp.where(valid, lo, big))
    ghi = jnp.full((H * W,), -big, jnp.float32).at[sel].set(
        jnp.where(valid, hi, -big))
    k = 2 * radius + 1
    glo = _window2d(glo.reshape(H, W), big, jax.lax.min, k)
    ghi = _window2d(ghi.reshape(H, W), -big, jax.lax.max, k)
    lo_d = glo.reshape(-1)[sel]
    hi_d = ghi.reshape(-1)[sel]
    ok = lo_d < big * 0.5
    return (jnp.where(ok, lo_d, fb_lo), jnp.where(ok, hi_d, fb_hi))


def _prior_sel(mask, n):
    """Compile-time ray selection for a prior mask (256-aligned, prior
    rays first — same convention as eval.renderer's fast paths)."""
    m = np.asarray(mask).reshape(-1).astype(bool)
    k = min(n, ((int(m.sum()) + 255) // 256) * 256)
    return np.argsort(~m, kind="stable")[:k].astype(np.int32)


def _field_pipeline(ncfg, H, W, focal, cx, cy, cfg, cd, nf, sel,
                    s_delta, band_pad_frac, min_band_frac, dilate_px,
                    fg_thresh, tag, delta_keep: float = 1.0,
                    uni_frac: float = 0.25, kf_blend: float = 0.0,
                    freeze_z: bool = False, dilate_every: int = 1,
                    in_kernel_delta: Optional[bool] = None,
                    roll_k: int = 0):
    """Per-field temporal stages: ``run(params, pose_f, bc_img, cond,
    band) -> (rgb, lw, fg, new_band)``. ``band=None`` renders the
    keyframe (full hierarchical schedule); otherwise a band-confined
    delta pass. ``tag`` keeps the jitted closures distinct per field.

    ``delta_keep < 1`` additionally prunes the DELTA frames to the
    keyframe's top ``delta_keep`` fraction of prior rays ranked by
    foreground weight mass (spatially max-dilated by ``dilate_px`` so
    rays the subject is moving into stay live); the rest of the frame
    holds the keyframe's rendered values for the whole cycle. For a
    trained field the dropped rays are the prior's padding — rays whose
    foreground mass is ~0 composite (nearly) the plate every frame, so
    re-rendering them each delta frame buys nothing. The torso field
    (fixed pose0, run_nerf.py:499) is the safest client: its rays never
    move, so frozen weak rays are exact up to conditioning drift.

    Delta-frame depth placement knobs (measured: the delta error GROWS
    with the refresh interval at small ``s_delta`` — r25→r50 doubles it
    at s16 — i.e. the frame-to-frame importance prior self-collapses
    when too few samples feed the next frame's CDF):

    - ``uni_frac``: fraction of the in-band samples placed uniformly
      across the cached band (exploration that tracks surface motion
      the importance prior misses).
    - ``kf_blend``: fraction of the IMPORTANCE samples drawn from the
      KEYFRAME's full-resolution (z, w) CDF instead of the previous
      delta frame's — a fixed high-quality anchor that cannot drift;
      the cache then carries the keyframe distribution for the whole
      cycle.

    ``freeze_z``: delta frames re-evaluate the network at the
    KEYFRAME's exact per-ray depth grid instead of band-resampling —
    built for the TORSO field, whose rays come from the fixed
    first-frame pose (run_nerf.py:499): with static rays the keyframe's
    quadrature stays valid all cycle, so this removes BOTH delta-frame
    bias mechanisms at once (in-band sampling error on sharp surfaces
    AND out-of-band transmittance loss, which a band-confined grid
    cannot see but ``last_weight`` — the composite's occlusion factor —
    depends on), while still tracking per-frame conditioning. It also
    deletes the field's per-delta-frame fixed work (inverse CDF, sort,
    band dilation). Costs the keyframe grid width per ray
    (n_samples + n_importance vs s_delta); compose with ``delta_keep``
    to spend those samples only on the conditioning-sensitive rays.

    ``dilate_every``: run the SPATIAL band dilation (the (H, W) grid
    scatter + separable min/max windows + gather — the bulk of the
    field's per-delta-frame fixed work besides the inverse CDF) only on
    every k-th delta frame of a cycle. On the other frames a ray whose
    own foreground mass validates its band uses it directly and an
    invalid ray CARRIES its previous band unchanged (instead of falling
    back to the full field interval, which would collapse its in-band
    sample density). The keyframe always dilates. ``dilate_every=1``
    reproduces the original per-frame-dilated path bit-exactly (the
    cache then carries no frame counter)."""
    from idealnerf_tpu.kernels.fused_render import (
        fused_render_coarse_hier, fused_render_delta, fused_render_rays,
    )
    from idealnerf_tpu.models.face_nerf import fold_conditioning

    # static camera-space directions of THIS FIELD's prior rays: delta
    # frames compute their rays as one (n_sel, 3) x (3, 3) matmul
    # against the frame's pose instead of generating the full H*W grid
    # and gathering (same math as core.rays.get_rays, restricted to sel)
    sel_np = np.asarray(sel)
    _cx = W * 0.5 if cx is None else cx
    _cy = H * 0.5 if cy is None else cy
    rows = (sel_np // W).astype(np.float32)
    cols = (sel_np % W).astype(np.float32)
    dirs_sel = jnp.asarray(np.stack(
        [(cols - _cx) / focal, -(rows - _cy) / focal,
         -np.ones_like(cols)], axis=-1))

    def _rays_sel(pose_f, idx=None):
        dirs = dirs_sel if idx is None else dirs_sel[idx]
        d = jnp.einsum("nc,kc->nk", dirs, pose_f[:3, :3],
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.broadcast_to(pose_f[:3, -1], d.shape), d

    @jax.jit
    def stage_kf_coarse(params, pose_f, bc_img, cond):
        """Keyframe coarse pass + in-kernel hierarchical sampling on the
        field's prior rays (one pallas launch) -> rays + merged depths."""
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["coarse"], ncfg, *cond)
        o, d = get_rays(H, W, focal, pose_f, cx, cy)
        o, d = o.reshape(-1, 3)[sel], d.reshape(-1, 3)[sel]
        b = bc_img.reshape(-1, 3)[sel]
        _, z_all = fused_render_coarse_hier(
            p["coarse"], folded, ncfg, o, d, b, nf[0], nf[1],
            cfg.n_samples, cfg.n_importance, point_tile=8192,
        )
        return dict(o=o, d=d, b=b, z=z_all)

    def _band_update(z, weights, sel_scatter=None, do_dilate=None,
                     prev_lo=None, prev_hi=None, lohimass=None):
        """Next-frame cache from this frame's depths/weights (no
        pallas): 96%-mass band -> pad -> width floor -> dilate -> clip,
        PLUS the raw (z, w) for temporal importance placement — the next
        delta frame inverse-CDF-samples most of its depths from this
        frame's weight distribution (the surface moves a tiny fraction
        of the band per frame, so last frame's weights are a near-exact
        importance prior; uniform band coverage catches the rest).
        ``sel_scatter``: pixel ids the rays scatter through for the
        spatial dilation (the pruned delta path passes its kept subset;
        default: this field's full prior selection). ``do_dilate``: a
        traced bool (dilate_every > 1 frames); when False the spatial
        dilation is skipped and invalid rays carry ``prev_lo/prev_hi``
        instead of widening to the field interval. ``lohimass``: the raw
        (lo, hi, mass) when already computed (fused_render_delta emits
        them in-kernel); skips fg_band."""
        span = nf[1] - nf[0]
        lo, hi, mass = lohimass if lohimass is not None else fg_band(
            z, weights)
        valid = mass > fg_thresh
        pad = band_pad_frac * span
        lo, hi = lo - pad, hi + pad
        width = jnp.maximum(hi - lo, min_band_frac * span)
        mid = 0.5 * (lo + hi)
        lo, hi = mid - 0.5 * width, mid + 0.5 * width
        sscat = sel if sel_scatter is None else sel_scatter

        def _dil(args):
            lo, hi, valid = args
            return dilate_bands(lo, hi, valid, sscat, H, W, dilate_px,
                                nf[0], nf[1])

        if do_dilate is None:
            lo, hi = _dil((lo, hi, valid))
        else:
            def _carry(args):
                lo, hi, valid = args
                return (jnp.where(valid, lo, prev_lo),
                        jnp.where(valid, hi, prev_hi))

            lo, hi = jax.lax.cond(do_dilate, _dil, _carry,
                                  (lo, hi, valid))
        return (jnp.clip(lo, nf[0], nf[1]), jnp.clip(hi, nf[0], nf[1]),
                z.astype(jnp.float32), weights.astype(jnp.float32))

    def _fine(params, o, d, z, b, cond):
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["fine"], ncfg, *cond)
        out = fused_render_rays(p["fine"], folded, ncfg, o, d, z, b,
                                point_tile=4096)
        return (out["rgb_map"], out["last_weight"], out["rgb_fg"],
                out["weights"])

    def _fine_delta(params, o, d, z_prev, w_prev, lo, hi, b, cond):
        """Whole delta-frame compute in ONE fused launch (depth
        placement + render + next fg band — kernels.fused_render_delta);
        equivalence-tested vs the _delta_depths + _fine + fg_band chain."""
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["fine"], ncfg, *cond)
        out = fused_render_delta(p["fine"], folded, ncfg, o, d, z_prev,
                                 w_prev, lo, hi, b, nf[1], s_uni, s_imp,
                                 point_tile=4096)
        return (out["rgb_map"], out["last_weight"], out["rgb_fg"],
                out["weights"], out["z_vals"],
                (out["band_lo"], out["band_hi"], out["fg_mass"]))

    # delta-frame in-band sample budget: s_delta - 1 in-band + the
    # pinned plate sample at far (reference t_rand[-1]=1 semantics)
    n_in = s_delta - 1
    # floor, not round: uni_frac=0.25 must reproduce the historical
    # n_in // 4 split exactly (the committed evidence JSONs were
    # measured with it)
    s_uni = max(2, int(n_in * uni_frac))
    s_imp = n_in - s_uni
    s_kf = (min(s_imp - 1, max(1, int(round(s_imp * kf_blend))))
            if kf_blend > 0 else 0)
    s_prev = s_imp - s_kf

    def _imp_from(z_src, w_src, count):
        """Deterministic inverse-CDF draw of ``count`` depths from a
        (z, w) render distribution (plate sample excluded)."""
        zin = z_src[..., :-1]
        win = w_src[..., :-1]
        mids = 0.5 * (zin[..., 1:] + zin[..., :-1])
        return sample_pdf(mids, win[..., 1:-1], count, key=None)

    def _delta_depths(lo, hi, z_prev, w_prev, kz=None, kw=None):
        """Per-ray delta depth grid: importance over the previous
        frame's weights (+ optionally the keyframe's), uniform band
        coverage, sorted, plate pin at the field far."""
        parts = [_imp_from(z_prev, w_prev, s_prev)]
        if s_kf:
            parts.append(_imp_from(kz, kw, s_kf))
        t = jnp.linspace(0.0, 1.0, s_uni, dtype=jnp.float32)
        parts.append(lo[:, None] + (hi - lo)[:, None] * t[None])
        z = jnp.sort(jnp.concatenate(parts, -1), axis=-1)
        return jnp.concatenate(
            [z, jnp.full((z.shape[0], 1), nf[1], jnp.float32)], 1)

    # delta-cache layout (tuple, unpruned path): (lo, hi, z, w
    # [, kz, kw][, i]) — kz/kw only under kf_blend, the delta-frame
    # counter i only under dilate_every > 1 (so the default layout, and
    # every committed evidence file's semantics, is unchanged)
    counted = dilate_every > 1

    # fused delta path: kernels.fused_render_delta runs the whole delta
    # compute (inverse CDF + merge + render + fg band) in ONE launch,
    # deleting the XLA-side per-delta-frame fixed work. Only the plain
    # previous-frame importance path is fused (kf_blend draws from two
    # CDFs; freeze_z skips placement entirely); equivalence vs the XLA
    # chain is tested at f32 tolerance, so the quality evidence carries.
    if in_kernel_delta is None:
        in_kernel_delta = jax.default_backend() == "tpu"
    use_kd = (in_kernel_delta and s_kf == 0 and not freeze_z
              and s_imp >= 2 and s_uni >= 2)

    def _tick(i):
        """Next delta-frame counter + whether that frame dilates."""
        i = i + 1
        return i, (i % dilate_every) == 0

    @jax.jit
    def stage_kf_fine(params, st, cond):
        """Keyframe fine pass over the merged hierarchical depths + band
        init (ONE pallas launch)."""
        rgb, lw, fg, w = _fine(params, st["o"], st["d"], st["z"], st["b"],
                               cond)
        band = _band_update(st["z"], w)
        if s_kf:  # anchor distribution for the cycle's delta frames
            band = band + (st["z"].astype(jnp.float32),
                           w.astype(jnp.float32))
        if counted:
            band = band + (jnp.int32(0),)
        return rgb, lw, fg, band

    @jax.jit
    def stage_delta(params, pose_f, bc_img, cond, band):
        """Whole delta pass in ONE program (one pallas launch).

        Depth grid per ray (``s_delta - 1`` in-band samples + the pinned
        plate sample at the field's far): importance samples inverse-
        CDF'd over the PREVIOUS frame's weights (temporal importance —
        the hierarchical-sampling idea applied across time instead of
        across a coarse pass) and optionally the keyframe's
        (``kf_blend``), plus ``uni_frac`` uniform across the cached band
        to catch surface motion the prior misses. FINE network render,
        cache update. With ``freeze_z`` the grid IS the carried
        (keyframe) grid and the cache passes through unchanged."""
        if counted:
            band, i = band[:-1], band[-1]
            i, do_dil = _tick(i)
        else:
            do_dil = None
        band_lo, band_hi, z_prev, w_prev = band[:4]
        kz, kw = (band[4], band[5]) if s_kf else (None, None)
        tail = ((kz, kw) if s_kf else ()) + ((i,) if counted else ())
        o, d = _rays_sel(pose_f)
        b = bc_img.reshape(-1, 3)[sel]
        if freeze_z:
            rgb, lw, fg, _ = _fine(params, o, d, z_prev, b, cond)
            return rgb, lw, fg, (band_lo, band_hi, z_prev, w_prev) + tail
        if use_kd and z_prev.shape[-1] <= 96:
            # shape guard is trace-time static: the cycle's FIRST delta
            # frame consumes the keyframe-width (z, w); huge rungs would
            # unroll an oversized in-kernel CDF, so they keep the XLA path
            rgb, lw, fg, w, z, lhm = _fine_delta(
                params, o, d, z_prev, w_prev, band_lo, band_hi, b, cond)
            band = _band_update(z, w, do_dilate=do_dil, prev_lo=band_lo,
                                prev_hi=band_hi, lohimass=lhm)
            return rgb, lw, fg, band + tail
        z = _delta_depths(band_lo, band_hi, z_prev, w_prev, kz, kw)
        rgb, lw, fg, w = _fine(params, o, d, z, b, cond)
        band = _band_update(z, w, do_dilate=do_dil, prev_lo=band_lo,
                            prev_hi=band_hi)
        return rgb, lw, fg, band + tail

    n_sel = int(sel.shape[0])
    k_keep = min(n_sel, max(256, (int(n_sel * delta_keep) // 256) * 256))
    pruned = delta_keep < 1.0 and k_keep < n_sel

    @jax.jit
    def stage_select(weights):
        """Keyframe ray selection for the delta cycle (own program — a
        top_k must never feed gathers of pallas outputs in the same
        program, the axon pattern eval.renderer documents). Score = the
        ray's foreground mass, max-dilated over the image window so
        rays adjacent to the subject silhouette stay live."""
        mass = jnp.sum(weights[..., :-1], axis=-1)
        grid = jnp.zeros((H * W,), jnp.float32).at[sel].set(
            mass.astype(jnp.float32))
        k = 2 * dilate_px + 1
        grid = _window2d(grid.reshape(H, W), 0.0, jax.lax.max, k)
        _, keep_idx = jax.lax.top_k(grid.reshape(-1)[sel], k_keep)
        return keep_idx

    @jax.jit
    def stage_cache_init(keep_idx, rgb, lw, fg, band):
        """Kept-space cache from the keyframe's full-frame outputs."""
        lo, hi, z, w = band[:4]
        out = dict(keep=keep_idx, lo=lo[keep_idx], hi=hi[keep_idx],
                   z=z[keep_idx], w=w[keep_idx], rgb=rgb, lw=lw, fg=fg)
        if s_kf:
            out["kz"] = band[4][keep_idx]
            out["kw"] = band[5][keep_idx]
        if counted:
            out["i"] = jnp.int32(0)
        return out

    @jax.jit
    def stage_delta_pruned(params, pose_f, bc_img, cond, cache):
        """Delta pass on the kept rays only (one pallas launch); the
        untouched rays hold the keyframe's rendered values. Same depth
        placement as stage_delta, in kept-space."""
        keep_idx = cache["keep"]
        sel_kept = sel[keep_idx]
        o, d = _rays_sel(pose_f, keep_idx)
        b = bc_img.reshape(-1, 3)[sel_kept]
        if freeze_z:
            rgb_k, lw_k, fg_k, _ = _fine(params, o, d, cache["z"], b,
                                         cond)
            new = dict(cache,
                       rgb=cache["rgb"].at[keep_idx].set(rgb_k),
                       lw=cache["lw"].at[keep_idx].set(lw_k),
                       fg=cache["fg"].at[keep_idx].set(fg_k))
            return new["rgb"], new["lw"], new["fg"], new
        if counted:
            i, do_dil = _tick(cache["i"])
        else:
            do_dil = None
        if use_kd and cache["z"].shape[-1] <= 96:
            rgb_k, lw_k, fg_k, w, z, lhm = _fine_delta(
                params, o, d, cache["z"], cache["w"], cache["lo"],
                cache["hi"], b, cond)
        else:
            z = _delta_depths(cache["lo"], cache["hi"], cache["z"],
                              cache["w"], cache.get("kz"), cache.get("kw"))
            rgb_k, lw_k, fg_k, w = _fine(params, o, d, z, b, cond)
            lhm = None
        # kept-space band maintenance (dilation scatters through the
        # kept rays' own pixels; pixels with no kept neighbour fall back
        # to the field interval exactly as the unpruned path does)
        lo, hi, zf, wf = _band_update(z, w, sel_scatter=sel_kept,
                                      do_dilate=do_dil,
                                      prev_lo=cache["lo"],
                                      prev_hi=cache["hi"],
                                      lohimass=lhm)
        new = dict(keep=keep_idx, lo=lo, hi=hi, z=zf, w=wf,
                   rgb=cache["rgb"].at[keep_idx].set(rgb_k),
                   lw=cache["lw"].at[keep_idx].set(lw_k),
                   fg=cache["fg"].at[keep_idx].set(fg_k))
        if s_kf:
            new["kz"], new["kw"] = cache["kz"], cache["kw"]
        if counted:
            new["i"] = i
        return new["rgb"], new["lw"], new["fg"], new

    def run(params, pose_f, bc_img, cond, band):
        if band is None:  # keyframe: coarse-hier program + fine program
            st = stage_kf_coarse(params, pose_f, bc_img, cond)
            rgb, lw, fg, kf_band = stage_kf_fine(params, st, cond)
            if not pruned:
                return rgb, lw, fg, kf_band
            keep_idx = stage_select(kf_band[3])
            return rgb, lw, fg, stage_cache_init(keep_idx, rgb, lw, fg,
                                                 kf_band)
        if pruned:
            return stage_delta_pruned(params, pose_f, bc_img, cond, band)
        return stage_delta(params, pose_f, bc_img, cond, band)

    def delta_step(params, pose_f, bc_img, cond, band):
        """One delta frame as a plain traceable fn (no band-is-None
        branch) — the scanned cycle renderers inline this in a lax.scan
        body so a whole keyframe cycle of delta frames runs as ONE
        program (one dispatch, one bulk fetch) instead of 3 programs +
        a sync per frame."""
        if pruned:
            return stage_delta_pruned(params, pose_f, bc_img, cond, band)
        return stage_delta(params, pose_f, bc_img, cond, band)

    roll = None
    if roll_k and roll_k > 1:
        # -- rolling keyframe refresh (serving mode) -------------------
        # No monolithic keyframes after frame 0: every frame runs the
        # normal delta pass PLUS a full-hierarchical-schedule refresh of
        # 1/roll_k of this field's rays (a strided comb — slice p is
        # rows {p, K+p, 2K+p, ...} of sel, extracted through an
        # (m, K, ...) view with a TRACED phase index so ONE compiled
        # program serves all K slices). Per-ray refresh age is bounded
        # by roll_k frames (same staleness bound as a monolithic
        # refresh_every=roll_k cadence) but the keyframe's cost is
        # spread evenly: per-frame wall time is delta + kf/K instead of
        # a 1-in-R spike — the serving-latency property
        # scripts/stream_latency.py measures against the 40 ms budget.
        if s_kf:
            raise ValueError("rolling refresh does not compose with "
                             "kf_blend (there is no keyframe CDF to "
                             "anchor on)")
        if n_sel % roll_k:
            raise ValueError(f"rolling refresh needs len(sel) divisible "
                             f"by roll_k ({n_sel} % {roll_k})")
        m_roll = n_sel // roll_k

        def _downsample_zw(z, w):
            """Keyframe-width (z, w) render distribution -> the cache's
            uniform s_delta width: inverse-CDF depths at evenly spaced
            quantiles carry EQUAL foreground mass by construction, so
            (z', uniform w') approximates the same CDF the delta
            importance draw consumes; plate pin at the field far."""
            zq = _imp_from(z, w, s_delta - 1)
            mass = jnp.sum(w[..., :-1], -1, keepdims=True)
            wq = jnp.broadcast_to(mass / (s_delta - 1), zq.shape)
            z2 = jnp.concatenate(
                [zq, jnp.full((*zq.shape[:-1], 1), nf[1], jnp.float32)],
                -1)
            w2 = jnp.concatenate(
                [wq, jnp.clip(1.0 - mass, 0.0, 1.0)], -1)
            return z2.astype(jnp.float32), w2.astype(jnp.float32)

        @jax.jit
        def stage_roll_init(rgb, lw, fg, band_kf):
            """Full-length rolling cache from the frame-0 keyframe
            (uniform s_delta-width (z, w) so slice merges are
            shape-stable). ``keep`` is filled host-side afterwards."""
            lo, hi, z_kf, w_kf = band_kf[:4]
            z2, w2 = _downsample_zw(z_kf, w_kf)
            return dict(lo=lo, hi=hi, z=z2, w=w2, rgb=rgb, lw=lw, fg=fg,
                        mass=jnp.sum(w_kf[..., :-1], -1), i=jnp.int32(0))

        @jax.jit
        def stage_roll_select(mass):
            """delta_keep ranking from the cache's per-ray foreground
            mass (own program — the top_k/pallas-gather separation
            eval.renderer documents). Re-run every roll_k frames, once
            the whole frame has refreshed."""
            grid = jnp.zeros((H * W,), jnp.float32).at[sel].set(
                mass.astype(jnp.float32))
            k = 2 * dilate_px + 1
            grid = _window2d(grid.reshape(H, W), 0.0, jax.lax.max, k)
            _, keep_idx = jax.lax.top_k(grid.reshape(-1)[sel], k_keep)
            return keep_idx

        @jax.jit
        def stage_roll_delta(params, pose_f, bc_img, cond, cache):
            """The frame's delta pass on the kept rays, full-length
            cache layout (one pallas launch)."""
            keep_idx = cache["keep"]
            o, d = _rays_sel(pose_f, keep_idx)
            b = bc_img.reshape(-1, 3)[sel[keep_idx]]
            z_prev = cache["z"][keep_idx]
            i = cache["i"] + 1
            if freeze_z:
                rgb_k, lw_k, fg_k, _ = _fine(params, o, d, z_prev, b,
                                             cond)
                return dict(cache, i=i,
                            rgb=cache["rgb"].at[keep_idx].set(rgb_k),
                            lw=cache["lw"].at[keep_idx].set(lw_k),
                            fg=cache["fg"].at[keep_idx].set(fg_k))
            w_prev = cache["w"][keep_idx]
            lo_p, hi_p = cache["lo"][keep_idx], cache["hi"][keep_idx]
            do_dil = (None if dilate_every == 1
                      else (i % dilate_every) == 0)
            if use_kd and z_prev.shape[-1] <= 96:
                rgb_k, lw_k, fg_k, w, z, lhm = _fine_delta(
                    params, o, d, z_prev, w_prev, lo_p, hi_p, b, cond)
            else:
                z = _delta_depths(lo_p, hi_p, z_prev, w_prev)
                rgb_k, lw_k, fg_k, w = _fine(params, o, d, z, b, cond)
                lhm = None
            lo, hi, zf, wf = _band_update(
                z, w, sel_scatter=sel[keep_idx], do_dilate=do_dil,
                prev_lo=lo_p, prev_hi=hi_p, lohimass=lhm)
            return dict(keep=keep_idx, i=i,
                        lo=cache["lo"].at[keep_idx].set(lo),
                        hi=cache["hi"].at[keep_idx].set(hi),
                        z=cache["z"].at[keep_idx].set(zf),
                        w=cache["w"].at[keep_idx].set(wf),
                        mass=cache["mass"].at[keep_idx].set(
                            jnp.sum(wf[..., :-1], -1)),
                        rgb=cache["rgb"].at[keep_idx].set(rgb_k),
                        lw=cache["lw"].at[keep_idx].set(lw_k),
                        fg=cache["fg"].at[keep_idx].set(fg_k))

        @jax.jit
        def stage_roll_slice_coarse(params, pose_f, bc_img, cond, phase):
            """Coarse + in-kernel hierarchical sampling on refresh slice
            ``phase`` (one pallas launch) — the keyframe schedule,
            restricted to 1/K of the rays."""
            p = jax.tree.map(lambda x: x.astype(cd), params)
            folded = fold_conditioning(p["coarse"], ncfg, *cond)
            dirs_b = jax.lax.dynamic_index_in_dim(
                dirs_sel.reshape(m_roll, roll_k, 3), phase, 1,
                keepdims=False)
            d = jnp.einsum("nc,kc->nk", dirs_b, pose_f[:3, :3],
                           precision=jax.lax.Precision.HIGHEST)
            o = jnp.broadcast_to(pose_f[:3, -1], d.shape)
            b = jax.lax.dynamic_index_in_dim(
                bc_img.reshape(-1, 3)[sel].reshape(m_roll, roll_k, 3),
                phase, 1, keepdims=False)
            _, z_all = fused_render_coarse_hier(
                p["coarse"], folded, ncfg, o, d, b, nf[0], nf[1],
                cfg.n_samples, cfg.n_importance, point_tile=8192)
            return dict(o=o, d=d, b=b, z=z_all)

        @jax.jit
        def stage_roll_slice_fine(params, st, cond):
            """Fine pass over the slice's merged depths + that slice's
            refreshed cache entries (one pallas launch). No spatial
            dilation here: a slice is a 1/K comb of the prior, its
            neighbours refresh on adjacent frames and the delta pass
            keeps dilating at its own cadence."""
            rgb, lw, fg, w = _fine(params, st["o"], st["d"], st["z"],
                                   st["b"], cond)
            span = nf[1] - nf[0]
            lo, hi, mass = fg_band(st["z"], w)
            valid = mass > fg_thresh
            pad = band_pad_frac * span
            lo, hi = lo - pad, hi + pad
            width = jnp.maximum(hi - lo, min_band_frac * span)
            mid = 0.5 * (lo + hi)
            lo = jnp.where(valid, mid - 0.5 * width, nf[0])
            hi = jnp.where(valid, mid + 0.5 * width, nf[1])
            z2, w2 = _downsample_zw(st["z"], w)
            return dict(rgb=rgb, lw=lw, fg=fg,
                        lo=jnp.clip(lo, nf[0], nf[1]),
                        hi=jnp.clip(hi, nf[0], nf[1]),
                        z=z2, w=w2, mass=mass, valid=valid)

        @jax.jit
        def stage_roll_merge(cache, sl, phase):
            """Scatter the refreshed slice into the cache through the
            (m, K) strided view (pure XLA, own program — never gather
            pallas outputs in their producing program)."""
            def upd(full, block):
                v = full.reshape(m_roll, roll_k, *full.shape[1:])
                v = jax.lax.dynamic_update_index_in_dim(v, block, phase,
                                                        1)
                return v.reshape(full.shape)

            def upd_band(full, block):
                # rays whose refreshed slice found no foreground mass
                # carry their previous band instead of the full field
                # interval (mirrors the monolithic keyframe's
                # prev-band/dilate carry) — a transiently-empty ray
                # keeps in-band sample density until mass returns
                v = full.reshape(m_roll, roll_k, *full.shape[1:])
                old = jax.lax.dynamic_index_in_dim(v, phase, 1,
                                                   keepdims=False)
                blk = jnp.where(sl["valid"], block, old)
                v = jax.lax.dynamic_update_index_in_dim(v, blk, phase, 1)
                return v.reshape(full.shape)

            return dict(cache,
                        lo=upd_band(cache["lo"], sl["lo"]),
                        hi=upd_band(cache["hi"], sl["hi"]),
                        z=upd(cache["z"], sl["z"]),
                        w=upd(cache["w"], sl["w"]),
                        mass=upd(cache["mass"], sl["mass"]),
                        rgb=upd(cache["rgb"], sl["rgb"]),
                        lw=upd(cache["lw"], sl["lw"]),
                        fg=upd(cache["fg"], sl["fg"]))

        class _Roll:
            k = roll_k
            init = staticmethod(stage_roll_init)
            select = staticmethod(stage_roll_select)
            delta = staticmethod(stage_roll_delta)
            slice_coarse = staticmethod(stage_roll_slice_coarse)
            slice_fine = staticmethod(stage_roll_slice_fine)
            merge = staticmethod(stage_roll_merge)
            pruned_sel = pruned

        roll = _Roll

    run.tag = tag
    run.delta_step = delta_step
    run.kf_coarse = stage_kf_coarse
    run.kf_fine = stage_kf_fine
    run.roll = roll
    return run


def _check_schedule(cfg, s_delta):
    if cfg.n_importance < 2:
        raise ValueError(
            "temporal renderers require n_importance >= 2 (keyframes "
            "use the in-kernel hierarchical path)")
    if s_delta < 4:
        raise ValueError("s_delta must be >= 4")


def _pad_sel_for_roll(sel_np, roll_k):
    """Pad a ray selection to a multiple of roll_k by repeating its last
    ray so the (m, K) strided slice view is exact. Duplicate rows render
    identically (deterministic kernels on identical inputs), so the
    duplicated pixel's scatter is value-consistent; cost is < K extra
    rays."""
    r = (-len(sel_np)) % roll_k
    if r:
        sel_np = np.concatenate(
            [sel_np, np.repeat(sel_np[-1:], r)]).astype(np.int32)
    return sel_np


def _roll_refresh_frame(field, params, pose_f, bc_img, cond, cache):
    """One REFRESH-ONLY rolling frame of one field: no per-frame delta
    pass at all — every frame re-renders exactly 1/roll_k of the
    field's rays at the full keyframe schedule (slice_coarse +
    slice_fine + merge) and every other ray carries its cached pixels.

    Built for the composite's TORSO field (fixed first-frame pose,
    run_nerf.py:499): its geometry varies only through the conditioning
    signal, so the dominant temporal error is conditioning STALENESS,
    not sampling — re-rendering a strided 1/K comb at keyframe quality
    every frame bounds each ray's age to K frames (the round-4 kt1
    freeze point's age bound was the whole refresh interval, which is
    what failed on the sharper 225k checkpoint) while costing
    keyframe_width/K samples per ray per frame and zero delta-pass
    fixed work. Per-frame cost is flat (serving-friendly: no 1-in-R
    keyframe spike for this field)."""
    roll = field.roll
    if cache is None:
        st = field.kf_coarse(params, pose_f, bc_img, cond)
        rgb, lw, fg, band = field.kf_fine(params, st, cond)
        return rgb, lw, fg, {"dev": dict(roll.init(rgb, lw, fg, band)),
                             "phase": 0}
    dev, phase = cache["dev"], cache["phase"]
    p = jnp.int32(phase)
    st = roll.slice_coarse(params, pose_f, bc_img, cond, p)
    dev = roll.merge(dev, roll.slice_fine(params, st, cond), p)
    nphase = (phase + 1) % roll.k
    return dev["rgb"], dev["lw"], dev["fg"], {"dev": dev, "phase": nphase}


def _roll_frame(field, params, pose_f, bc_img, cond, cache):
    """One rolling-refresh frame of one field.

    Frame 0 (``cache=None``) is the monolithic keyframe + full-length
    cache init; every later frame is the delta pass + the phase-th
    slice's full-schedule refresh + merge, with the delta_keep ranking
    re-run from the cache's foreground mass each time the comb wraps
    (every roll_k frames — the monolithic path re-ranks every keyframe,
    run_nerf.py has no analog: the reference re-renders everything)."""
    roll = field.roll
    if cache is None:
        st = field.kf_coarse(params, pose_f, bc_img, cond)
        rgb, lw, fg, band = field.kf_fine(params, st, cond)
        dev = dict(roll.init(rgb, lw, fg, band))
        dev["keep"] = (roll.select(dev["mass"]) if roll.pruned_sel
                       else jnp.arange(rgb.shape[0], dtype=jnp.int32))
        return rgb, lw, fg, {"dev": dev, "phase": 0}
    dev, phase = cache["dev"], cache["phase"]
    p = jnp.int32(phase)
    dev = roll.delta(params, pose_f, bc_img, cond, dev)
    st = roll.slice_coarse(params, pose_f, bc_img, cond, p)
    dev = roll.merge(dev, roll.slice_fine(params, st, cond), p)
    nphase = (phase + 1) % roll.k
    if nphase == 0 and roll.pruned_sel:
        dev = dict(dev, keep=roll.select(dev["mass"]))
    return dev["rgb"], dev["lw"], dev["fg"], {"dev": dev, "phase": nphase}


def make_temporal_frame_renderer(
    nerf_cfg,
    H: int, W: int, focal, near, far, cfg,
    cx=None, cy=None, compute_dtype=None,
    prior_mask=None, bounds=None,
    s_delta: int = 32,
    band_pad_frac: float = 0.02,
    min_band_frac: float = 0.04,
    dilate_px: int = 4,
    fg_thresh: float = 0.2,
    delta_keep: float = 1.0,
    uni_frac: float = 0.25,
    kf_blend: float = 0.0,
    dilate_every: int = 1,
    in_kernel_delta: Optional[bool] = None,
    roll_k: int = 0,
):
    """Single-field (head-only) temporal depth-cache renderer.

    Returns ``render(params, pose, bc_img, aud=None, expr=None,
    latent=None, cache=None) -> (frame (H, W, 3), cache)``. ``cache=None``
    renders a keyframe; a previous cache renders a band-confined delta
    frame. Outside ``prior_mask`` the frame is the plate (trained-field
    assumption of eval.renderer.render_frame_prior_masked).

    ``roll_k > 1`` enables ROLLING keyframe refresh (the serving mode —
    see _field_pipeline's roll stages): after the frame-0 keyframe the
    caller keeps passing the previous cache forever; every frame pays
    delta + 1/roll_k of a keyframe instead of a 1-in-R keyframe spike,
    with per-ray refresh age bounded by roll_k frames."""
    _check_schedule(cfg, s_delta)
    cfg = cfg.eval_mode()
    cd = compute_dtype or jnp.float32
    n = H * W
    masked = prior_mask is not None
    sel_np = (_prior_sel(prior_mask, n) if masked
              else np.arange(n, dtype=np.int32))
    if roll_k:
        sel_np = _pad_sel_for_roll(sel_np, roll_k)
    sel = jnp.asarray(sel_np)
    nf = tuple(bounds) if bounds is not None else (float(near), float(far))

    field = _field_pipeline(nerf_cfg, H, W, focal, cx, cy, cfg, cd, nf,
                            sel, s_delta, band_pad_frac, min_band_frac,
                            dilate_px, fg_thresh, tag="head",
                            delta_keep=delta_keep, uni_frac=uni_frac,
                            kf_blend=kf_blend, dilate_every=dilate_every,
                            in_kernel_delta=in_kernel_delta,
                            roll_k=roll_k)

    # roll padding can make len(sel) != H*W even unmasked (duplicated
    # tail rays); the dense fast path only applies to an exact identity
    # selection — otherwise scatter through sel (duplicates are
    # value-consistent: deterministic kernels on identical inputs)
    scatter_sel = masked or len(sel_np) != n

    @jax.jit
    def assemble(rgb, bc_img):
        plate = bc_img.reshape(-1, 3)
        img = plate.at[sel].set(rgb) if scatter_sel else rgb
        return img.reshape(H, W, 3)

    def render(params, pose, bc_img, aud=None, expr=None, latent=None,
               cache=None):
        if "fine" not in params:
            raise ValueError("temporal rendering needs 'fine' params")
        if roll_k:
            rgb, _, _, cache = _roll_frame(field, params, pose, bc_img,
                                           (aud, expr, latent), cache)
            return assemble(rgb, bc_img), cache
        rgb, _, _, band = field(params, pose, bc_img, (aud, expr, latent),
                                cache)
        return assemble(rgb, bc_img), band

    @jax.jit
    def render_cycle(params, poses, bc_img, cache, auds=None, exprs=None,
                     latents=None):
        """All delta frames of one keyframe cycle in ONE scanned program
        (see make_temporal_composite_renderer.render.cycle; ``cache``
        must be delta-shaped — one per-frame delta render after the
        keyframe)."""
        xs = {"pose": poses}
        if auds is not None:
            xs["aud"] = auds
        if exprs is not None:
            xs["expr"] = exprs
        if latents is not None:
            xs["latent"] = latents

        def body(band, x):
            rgb, _, _, new = field.delta_step(
                params, x["pose"], bc_img,
                (x.get("aud"), x.get("expr"), x.get("latent")), band)
            return new, assemble(rgb, bc_img)

        cache2, frames = jax.lax.scan(body, cache, xs)
        return frames, cache2

    render.cycle = render_cycle
    return render


def make_temporal_composite_renderer(
    head_cfg, torso_cfg,
    H: int, W: int, focal, near, far, cfg,
    cx=None, cy=None, compute_dtype=None,
    prior_mask_head=None, prior_mask_torso=None,
    bounds_head=None, bounds_torso=None,
    s_delta: int = 32,
    band_pad_frac: float = 0.02,
    min_band_frac: float = 0.04,
    dilate_px: int = 4,
    fg_thresh: float = 0.2,
    delta_keep_head: float = 1.0,
    delta_keep_torso: float = 1.0,
    s_delta_torso: Optional[int] = None,
    uni_frac: float = 0.25,
    kf_blend: float = 0.0,
    freeze_z_torso: bool = False,
    dilate_every: int = 1,
    in_kernel_delta: Optional[bool] = None,
    roll_k: int = 0,
    roll_k_torso: int = 0,
    _expose_stages: bool = False,
):
    """Head+torso composite renderer with a temporal depth cache.

    Returns ``render(head_params, torso_params, pose, pose0, bc_img,
    aud=None, signal=None, expr=None, latent=None, cache=None) ->
    (frame (H, W, 3), cache)``. ``cache=None`` renders a keyframe (full
    hierarchical schedule on the per-field prior rays) and initializes
    the cache from its fine weights; a cache from the previous frame
    renders a delta frame at ``s_delta`` samples/ray inside the cached
    bands. The caller chooses the refresh cadence by passing
    ``cache=None`` every R frames (eval.reenact does).

    Band maintenance per frame: central-96%-mass band of each ray's own
    weights, widened by ``band_pad_frac`` of the field interval per
    side, floored at ``min_band_frac`` of the interval, spatially
    dilated by ``dilate_px``, clipped to the field bounds. The torso
    field's rays come from the FIXED first-frame pose (run_nerf.py:499),
    so its cache is near-stationary; the head band tracks pose motion
    through the dilation.

    ``roll_k_torso > 1``: the head keeps the normal keyframe/delta
    cycle but the TORSO runs REFRESH-ONLY rolling (_roll_refresh_frame)
    — every frame re-renders 1/K of the torso's prior rays at the full
    keyframe schedule and carries the rest, bounding each torso ray's
    conditioning age to K frames with no torso delta pass at all. The
    scanned-cycle path is unavailable in this mode (the per-frame
    program set is 3 pallas launches — head delta + torso slice
    coarse/fine — over the one-launch-per-program axon budget a single
    scanned program could hold).
    """
    if roll_k and roll_k_torso:
        raise ValueError("roll_k (both fields) and roll_k_torso "
                         "(torso-only refresh roll) are exclusive")
    _check_schedule(cfg, s_delta)
    cfg = cfg.eval_mode()
    cd = compute_dtype or jnp.float32
    n = H * W

    if prior_mask_head is not None and prior_mask_torso is not None:
        mh = np.asarray(prior_mask_head).reshape(-1).astype(bool)
        mt = np.asarray(prior_mask_torso).reshape(-1).astype(bool)
        sel_h_np, sel_t_np = _prior_sel(mh, n), _prior_sel(mt, n)
        sel_u_np = _prior_sel(mh | mt, n)
        masked = True
    else:
        sel_h_np = sel_t_np = sel_u_np = np.arange(n, dtype=np.int32)
        masked = False
    if roll_k or roll_k_torso:
        # pad per-field selections only: the union mapping below keys
        # off pixel ids, so a duplicated field row resolves to the same
        # pixel's (last) field position. Padding can leave the field
        # outputs longer than H*W even when unmasked — the dense
        # composite fast path below would then reshape-fail, so route
        # through the mapping branch whenever any selection was padded.
        if roll_k:
            sel_h_np = _pad_sel_for_roll(sel_h_np, roll_k)
        sel_t_np = _pad_sel_for_roll(sel_t_np, roll_k or roll_k_torso)
        masked = masked or len(sel_h_np) != n or len(sel_t_np) != n

    def _pos(sel_np):
        p = np.full(n, -1, np.int32)
        p[sel_np] = np.arange(len(sel_np), dtype=np.int32)
        return p

    u2h = jnp.asarray(_pos(sel_h_np)[sel_u_np])
    u2t = jnp.asarray(_pos(sel_t_np)[sel_u_np])
    sel_u = jnp.asarray(sel_u_np)

    nf_head = tuple(bounds_head) if bounds_head is not None else (
        float(near), float(far))
    nf_torso = tuple(bounds_torso) if bounds_torso is not None else (
        float(near), float(far))

    # per-field delta sample counts: the fields' band widths differ a
    # lot (the torso's tightened interval is ~half its range vs ~19%
    # for the head), so equal counts give the torso far coarser in-band
    # density — measured, the composite's quality at small s_delta is
    # torso-limited while the head holds at half the samples
    st_torso = s_delta_torso if s_delta_torso is not None else s_delta
    if s_delta_torso is not None:
        _check_schedule(cfg, st_torso)
    kb = (band_pad_frac, min_band_frac, dilate_px, fg_thresh)
    head = _field_pipeline(head_cfg, H, W, focal, cx, cy, cfg, cd,
                           nf_head, jnp.asarray(sel_h_np), s_delta, *kb,
                           tag="head", delta_keep=delta_keep_head,
                           uni_frac=uni_frac, kf_blend=kf_blend,
                           dilate_every=dilate_every,
                           in_kernel_delta=in_kernel_delta,
                           roll_k=roll_k)
    torso = _field_pipeline(torso_cfg, H, W, focal, cx, cy, cfg, cd,
                            nf_torso, jnp.asarray(sel_t_np), st_torso,
                            *kb, tag="torso",
                            delta_keep=delta_keep_torso,
                            uni_frac=uni_frac, kf_blend=kf_blend,
                            freeze_z=freeze_z_torso,
                            dilate_every=dilate_every,
                            in_kernel_delta=in_kernel_delta,
                            roll_k=roll_k or roll_k_torso)

    @jax.jit
    def stage_composite(rgb_h, lw_t, fg_t, bc_img):
        """Layered composite over the union rays (run_nerf.py:610);
        outside the priors the frame IS the plate (trained-field
        assumption the composite fast path documents)."""
        plate = bc_img.reshape(-1, 3)
        if masked:
            in_h = (u2h >= 0)[:, None]
            rgb_h_u = jnp.where(in_h, rgb_h[jnp.clip(u2h, 0)],
                                plate[sel_u])
            lw_t_u = jnp.where(u2t >= 0, lw_t[jnp.clip(u2t, 0)], 1.0)
            fg_t_u = jnp.where((u2t >= 0)[:, None],
                               fg_t[jnp.clip(u2t, 0)], 0.0)
            comp = rgb_h_u * lw_t_u[:, None] + fg_t_u
            img = plate.at[sel_u].set(comp)
        else:
            img = rgb_h * lw_t[:, None] + fg_t
        return img.reshape(H, W, 3)

    def render(head_params, torso_params, pose, pose0, bc_img,
               aud=None, signal=None, expr=None, latent=None, cache=None):
        if "fine" not in head_params or "fine" not in torso_params:
            raise ValueError("temporal composite needs 'fine' params in "
                             "both fields")
        band_h = cache["head"] if cache is not None else None
        band_t = cache["torso"] if cache is not None else None
        if roll_k:
            rgb_h, _, _, new_h = _roll_frame(head, head_params, pose,
                                             bc_img, (aud, expr, latent),
                                             band_h)
            _, lw_t, fg_t, new_t = _roll_frame(torso, torso_params,
                                               pose0, bc_img,
                                               (signal, None, None),
                                               band_t)
        elif roll_k_torso:
            rgb_h, _, _, new_h = head(head_params, pose, bc_img,
                                      (aud, expr, latent), band_h)
            _, lw_t, fg_t, new_t = _roll_refresh_frame(
                torso, torso_params, pose0, bc_img, (signal, None, None),
                band_t)
        else:
            rgb_h, _, _, new_h = head(head_params, pose, bc_img,
                                      (aud, expr, latent), band_h)
            _, lw_t, fg_t, new_t = torso(torso_params, pose0, bc_img,
                                         (signal, None, None), band_t)
        frame = stage_composite(rgb_h, lw_t, fg_t, bc_img)
        return frame, {"head": new_h, "torso": new_t}

    @jax.jit
    def render_cycle(head_params, torso_params, poses, pose0, bc_img,
                     cache, auds=None, signals=None, exprs=None,
                     latents=None):
        """All delta frames of one keyframe cycle in ONE scanned
        program.

        ``poses/auds/signals/exprs/latents`` carry a leading frame axis
        (T, ...); ``cache`` must be DELTA-shaped — produced by at least
        one delta-frame ``render`` call after the keyframe (the keyframe
        cache carries full-schedule-width (z, w), a scan carry must be
        shape-stable at the s_delta width). Returns
        ``(frames (T, H, W, 3), cache)``. Identical math to T calls of
        ``render`` — the scan body inlines the same delta-step +
        composite stages — but pays ONE program dispatch and ONE bulk
        frame fetch per cycle instead of 3 dispatches and a host sync
        per frame (the per-frame fixed cost the delta-frame slope fit
        isolates — runs/temporal_profile.json). Two pallas launches
        traced once (under the axon 3-launch limit)."""
        xs = {"pose": poses}
        if auds is not None:
            xs["aud"] = auds
        if signals is not None:
            xs["signal"] = signals
        if exprs is not None:
            xs["expr"] = exprs
        if latents is not None:
            xs["latent"] = latents

        def body(carry, x):
            ch, ct = carry["head"], carry["torso"]
            rgb_h, _, _, nh = head.delta_step(
                head_params, x["pose"], bc_img,
                (x.get("aud"), x.get("expr"), x.get("latent")), ch)
            _, lw_t, fg_t, nt = torso.delta_step(
                torso_params, pose0, bc_img, (x.get("signal"), None, None),
                ct)
            frame = stage_composite(rgb_h, lw_t, fg_t, bc_img)
            return {"head": nh, "torso": nt}, frame

        cache2, frames = jax.lax.scan(body, cache, xs)
        return frames, cache2

    def _no_cycle(*a, **kw):
        raise RuntimeError(
            "scanned-cycle rendering is unavailable with roll_k_torso "
            "(3 pallas launches per scanned program exceeds the axon "
            "per-program budget); use per-frame render calls")

    render.cycle = _no_cycle if roll_k_torso else render_cycle
    if _expose_stages:  # scripts/temporal_profile.py times each program
        render.stages = {"head": head, "torso": torso,
                         "composite": stage_composite}
    return render
