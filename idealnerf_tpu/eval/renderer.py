"""Full-frame evaluation renderer.

The reference renders eval frames by python-looping ray chunks of 8192
(batchify_rays, audio_exp_nerf.py:281-295) — 25 kernel launches per 450²
frame. Here the frame is one jitted program: rays are padded to a static
tile multiple and swept with ``lax.map`` over tiles (bounded VMEM/HBM
working set), everything else fused by XLA. Deterministic sampling
(perturb=0), matching render_kwargs_test.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.core.composite import raw2outputs
from idealnerf_tpu.core.rays import get_rays
from idealnerf_tpu.core.render import RenderConfig, render_rays
from idealnerf_tpu.core.sampling import sample_pdf, stratified_sample


def render_frame(
    coarse_fn,
    H: int,
    W: int,
    focal,
    pose,
    bc_img: jnp.ndarray,   # (H, W, 3) float in [0,1]
    near,
    far,
    cfg: RenderConfig,
    cx=None,
    cy=None,
    fine_fn=None,
    tile: int = 8192,
) -> jnp.ndarray:
    """Render a full (H, W, 3) frame. Call under jit (field fns traced)."""
    cfg = cfg.eval_mode()
    rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    bc = bc_img.reshape(-1, 3)

    n = rays_o.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        rays_o = jnp.concatenate([rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0.0, -1.0]], rays_d.dtype), (n_pad, 1))], 0
        )
        bc = jnp.concatenate([bc, jnp.zeros((n_pad, 3), bc.dtype)], 0)

    def render_tile(args):
        o, d, b = args
        out = render_rays(coarse_fn, o, d, b, near, far, cfg, fine_fn=fine_fn)
        return out["rgb_map"]

    tiles = (
        rays_o.reshape(-1, tile, 3),
        rays_d.reshape(-1, tile, 3),
        bc.reshape(-1, tile, 3),
    )
    rgb = jax.lax.map(render_tile, tiles).reshape(-1, 3)[:n]
    return rgb.reshape(H, W, 3)


def render_frame_outputs(
    coarse_fn, H, W, focal, pose, bc_img, near, far, cfg,
    cx=None, cy=None, fine_fn=None, tile: int = 8192,
    keys=("rgb_map", "last_weight", "rgb_fg"),
):
    """Like render_frame but returns several per-ray outputs reshaped to
    (H, W, ...) — used by the head+torso compositor which needs
    last_weight/rgb_fg of the torso field (test_torso.py:513-534)."""
    cfg = cfg.eval_mode()
    rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    bc = bc_img.reshape(-1, 3)

    n = rays_o.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        rays_o = jnp.concatenate([rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0.0, -1.0]], rays_d.dtype), (n_pad, 1))], 0
        )
        bc = jnp.concatenate([bc, jnp.zeros((n_pad, 3), bc.dtype)], 0)

    def render_tile(args):
        o, d, b = args
        out = render_rays(coarse_fn, o, d, b, near, far, cfg, fine_fn=fine_fn)
        return tuple(out[k] for k in keys)

    tiles = (
        rays_o.reshape(-1, tile, 3),
        rays_d.reshape(-1, tile, 3),
        bc.reshape(-1, tile, 3),
    )
    outs = jax.lax.map(render_tile, tiles)
    result = {}
    for k, v in zip(keys, outs):
        v = v.reshape((-1,) + v.shape[2:])[:n]
        result[k] = v.reshape((H, W) + v.shape[1:])
    return result


def cached_depth_band(cache_dir, field: str, step, compute_fn):
    """Memoize a tightened depth band to ``<cache_dir>/depth_bands.json``
    keyed by ``(field, checkpoint step)``.

    The band is a per-subject, per-checkpoint constant
    (subject_depth_range / torso_depth_range), but estimating it costs a
    multi-frame full-fidelity probe (~2 min at 450² on one chip) — every
    eval/bench invocation was re-paying that. ``cache_dir`` should be
    the checkpoint directory (the band is a property of the trained
    model); pass ``cache_dir=None`` to skip caching."""
    import json
    import os

    if cache_dir is None:
        return tuple(float(v) for v in compute_fn())
    path = os.path.join(cache_dir, "depth_bands.json")
    key = f"{field}@{int(step)}"
    bands = {}
    try:
        with open(path) as fh:
            bands = json.load(fh)
    except (OSError, ValueError):
        pass
    if key in bands:
        return tuple(bands[key])
    band = tuple(float(v) for v in compute_fn())
    bands[key] = list(band)
    try:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(bands, fh, indent=2)
        os.replace(tmp, path)
    except OSError:
        pass
    return band


def subject_depth_range(
    cfg, params, latent_codes, dataset,
    n_frames: int = 4, fg_thresh: float = 0.5,
    margin_frac: float = 0.05, compute_dtype=None,
):
    """Per-subject tightened sampling bounds ``(near', far')`` from the
    trained model's own depth maps.

    The reference samples the full config ``[near, far]`` interval
    (helper.py:66-69; May: 0.577-1.177) on every ray, but a converged
    talking-head field occupies a narrow depth band — tightening the
    static bounds raises effective sample density at the same per-ray
    count (or holds quality at a lower count; scripts/sample_sweep.py
    measures the trade). Renders ``n_frames`` train frames full-fidelity,
    masks foreground pixels (acc − last_weight > fg_thresh — acc alone
    includes the pinned plate sample), and brackets the union of their
    ``depth_band`` intervals (the z span holding the central 96% of each
    ray's foreground weight mass — robust to low-weight fog tails that
    blow up std-based brackets), padded by ``margin_frac`` of the
    original interval per side. Exactness caveat: mass outside the
    bracket (≤4% per ray at the 2%/98% quantiles, typically ≪) would
    re-composite; the sweep quantifies the actual delta."""
    from idealnerf_tpu.models.face_nerf import make_field_fn
    from idealnerf_tpu.models.variants import (
        variant_conditioning, variant_nerf_config,
    )

    head_cfg = variant_nerf_config(cfg)
    latent = latent_codes[0] if cfg.dim_latent > 0 else None

    def field_fns(aud, pose_i):
        expr = (jnp.asarray(dataset.exprs[pose_i])
                if cfg.dim_expr > 0 else None)
        aud_arg, expr_arg = variant_conditioning(params, cfg, aud, expr)
        mk = lambda p: make_field_fn(p, head_cfg, aud_arg, expr_arg,
                                     latent, compute_dtype=compute_dtype)
        return (mk(params["coarse"]), mk(params["fine"]),
                jnp.asarray(dataset.poses[pose_i]))

    return _depth_range_probe(cfg, params, dataset, field_fns, n_frames,
                              fg_thresh, margin_frac)


def torso_depth_range(
    cfg, torso_params, head_params, dataset,
    n_frames: int = 4, fg_thresh: float = 0.5,
    margin_frac: float = 0.05, compute_dtype=None,
):
    """``subject_depth_range`` for the torso field: rays from the FIXED
    first-frame pose (run_nerf.py:499), conditioning sweeps the torso
    signal over ``n_frames`` (aud ‖ PE3(euler) ‖ PE3(trans) —
    train/torso.torso_signal; the audio features come from the trained
    HEAD's audio net, as in training)."""
    from idealnerf_tpu.models.face_nerf import make_field_fn
    from idealnerf_tpu.train.torso import torso_nerf_config, torso_signal

    tcfg = torso_nerf_config(cfg)
    pose0 = jnp.asarray(dataset.poses[0])

    def field_fns(aud, pose_i):
        sig = torso_signal(aud, jnp.asarray(dataset.poses[pose_i]),
                           cfg.dim_aud_body)
        mk = lambda p: make_field_fn(p, tcfg, aud=sig,
                                     compute_dtype=compute_dtype)
        return (mk(torso_params["coarse"]), mk(torso_params["fine"]),
                pose0)

    return _depth_range_probe(cfg, head_params, dataset, field_fns,
                              n_frames, fg_thresh, margin_frac)


def _depth_range_probe(cfg, aud_params, dataset, field_fns, n_frames,
                       fg_thresh, margin_frac):
    """Shared band-union probe behind subject_depth_range /
    torso_depth_range. ``field_fns(aud_feature, frame_index) ->
    (coarse_fn, fine_fn, pose)``. Converts only the fields it reads
    (auds/poses/exprs/bc of the probe frames) — never the frame images."""
    import dataclasses

    from idealnerf_tpu.train.head import compute_aud_feature

    H, W = dataset.hw
    bc = jnp.asarray(dataset.bc_img, jnp.float32) / 255.0
    auds = jnp.asarray(dataset.auds)
    aud_ids = jnp.asarray(dataset.aud_ids)
    # probe at full fidelity regardless of the eval sample schedule —
    # a coarse probe yields noisy bands
    rcfg = dataclasses.replace(
        cfg.render_config(),
        n_samples=max(cfg.render_config().n_samples, 64),
        n_importance=max(cfg.render_config().n_importance, 64))
    lo, hi = [], []
    for i in np.linspace(0, dataset.size - 1, n_frames).astype(int):
        i = int(i)
        aud = compute_aud_feature(aud_params, auds, aud_ids, i, cfg, False)
        coarse_fn, fine_fn, pose = field_fns(aud, i)
        outs = render_frame_outputs(
            coarse_fn, H, W, dataset.focal, pose, bc,
            dataset.near, dataset.far, rcfg,
            cx=dataset.cx, cy=dataset.cy, tile=min(8192, H * W),
            fine_fn=fine_fn,
            keys=("acc_map", "last_weight", "depth_band"),
        )
        fg = (np.asarray(outs["acc_map"])
              - np.asarray(outs["last_weight"])) > fg_thresh
        if not fg.any():
            continue
        band = np.asarray(outs["depth_band"])[fg]
        lo.append(float(band[:, 0].min()))
        hi.append(float(band[:, 1].max()))
    if not lo:
        return float(dataset.near), float(dataset.far)
    pad = margin_frac * (dataset.far - dataset.near)
    return (max(float(dataset.near), min(lo) - pad),
            min(float(dataset.far), max(hi) + pad))


def make_composite_frame_renderer(
    head_cfg, torso_cfg,
    H: int, W: int, focal, near, far, cfg: RenderConfig,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None, use_pallas: bool = False,
):
    """jit-compiled full-frame head+torso composite:
    ``render(head_params, torso_params, pose, pose0, bc_img, aud, signal,
    expr, latent) -> (H, W, 3)`` — head rays from ``pose``, torso rays
    from the fixed ``pose0``, layered per test_torso.py:513-534.

    ``use_pallas="ray"``: both fields render through the per-ray fused
    kernel pipeline (whole-frame launches) — the path behind the
    head+torso fps headline."""
    from idealnerf_tpu.core.composite import layered_composite
    from idealnerf_tpu.models.face_nerf import make_field_fn

    if use_pallas == "ray":
        from idealnerf_tpu.kernels.fused_render import render_rays_fused
        from idealnerf_tpu.models.face_nerf import fold_conditioning

        @jax.jit
        def _render_fused(head_params, torso_params, pose, pose0, bc_img,
                          aud=None, signal=None, expr=None, latent=None):
            cd = compute_dtype or jnp.float32
            hp = jax.tree.map(lambda x: x.astype(cd), head_params)
            tp = jax.tree.map(lambda x: x.astype(cd), torso_params)
            bc = bc_img.reshape(-1, 3)

            def run(params, nerf_cfg, rays_pose, a, e, l):
                f_c = fold_conditioning(params["coarse"], nerf_cfg, a, e, l)
                f_f = (fold_conditioning(params["fine"], nerf_cfg, a, e, l)
                       if "fine" in params else None)
                ro, rd = get_rays(H, W, focal, rays_pose, cx, cy)
                return render_rays_fused(
                    params["coarse"], f_c, nerf_cfg, ro.reshape(-1, 3),
                    rd.reshape(-1, 3), bc, near, far, cfg.n_samples,
                    cfg.n_importance, fine_params=params.get("fine"),
                    fine_folded=f_f, lindisp=cfg.lindisp,
                )

            head = run(hp, head_cfg, pose, aud, expr, latent)
            torso = run(tp, torso_cfg, pose0, signal, None, None)
            return layered_composite(
                head["rgb_map"].reshape(H, W, 3),
                torso["last_weight"].reshape(H, W),
                torso["rgb_fg"].reshape(H, W, 3),
            )

        return _render_fused

    @jax.jit
    def _render(head_params, torso_params, pose, pose0, bc_img,
                aud=None, signal=None, expr=None, latent=None):
        head = render_frame_outputs(
            make_field_fn(head_params["coarse"], head_cfg, aud, expr, latent,
                          compute_dtype=compute_dtype, use_pallas=use_pallas),
            H, W, focal, pose, bc_img, near, far, cfg, cx=cx, cy=cy,
            fine_fn=make_field_fn(head_params["fine"], head_cfg, aud, expr,
                                  latent, compute_dtype=compute_dtype,
                                  use_pallas=use_pallas),
            tile=tile, keys=("rgb_map",),
        )
        torso = render_frame_outputs(
            make_field_fn(torso_params["coarse"], torso_cfg, aud=signal,
                          compute_dtype=compute_dtype, use_pallas=use_pallas),
            H, W, focal, pose0, bc_img, near, far, cfg, cx=cx, cy=cy,
            fine_fn=make_field_fn(torso_params["fine"], torso_cfg, aud=signal,
                                  compute_dtype=compute_dtype,
                                  use_pallas=use_pallas),
            tile=tile, keys=("last_weight", "rgb_fg"),
        )
        return layered_composite(
            head["rgb_map"], torso["last_weight"], torso["rgb_fg"]
        )

    return _render


def make_composite_fast_renderer(
    head_cfg, torso_cfg,
    H: int, W: int, focal, near, far, cfg: RenderConfig,
    cx=None, cy=None, compute_dtype=None,
    prior_mask=None, k_coarse: Optional[int] = None,
    keep_head: float = 0.4, keep_torso: float = 0.4,
    prior_mask_head=None, prior_mask_torso=None,
    bounds_head=None, bounds_torso=None,
    _expose_stages: bool = False,
    keep_basis: str = "frame",
):
    """Pruned + prior-masked head+torso composite — the fast mode for the
    north-star workload (reference: test_torso.py:513-534 renders BOTH
    fields at full 64+192 fidelity on every pixel).

    Three structural cuts, all exact-by-construction outside their masks:

    1. **Shared subject prior**: rays outside the subject prior see no
       network at all. There the trained torso field is empty
       (last_weight→1, rgb_fg→0) and the head composites the plate, so
       the layered composite IS the plate pixel.
    2. **Per-field opacity pruning**: each field's fine pass runs only on
       the top ``keep_*`` fraction of prior rays ranked by that field's
       coarse foreground opacity (acc − last_weight); elsewhere the fine
       result would reproduce the coarse composite (both transmit to the
       plate / to the other layer).
    3. **Cross-field occlusion**: the composite is
       ``rgb_head·last_weight_torso + rgb_fg_torso`` (run_nerf.py:610),
       so where the TORSO is already opaque at coarse
       (last_weight_torso≈0) the head's fine color is multiplied by ~0 —
       the head ranking is weighted by the torso's coarse transmittance,
       skipping head fine work the torso will hide.

    Torso rays are cast from the fixed first-frame pose (run_nerf.py:499)
    but the pixel grid is shared, so one prior/selection index set serves
    both fields.

    4. **Per-field priors** (round 3): pass ``prior_mask_head`` /
       ``prior_mask_torso`` (eval.renderer.foreground_prior_fields) and
       each field runs only on its OWN support — the head on the face
       rects, the torso on the torso-parse silhouette. Outside its
       support a trained field is exactly the identity layer (head →
       plate, torso → transparent), so the composite is unchanged while
       each field's coarse AND fine ray counts shrink to its own
       coverage. All cross-field index maps are compile-time constants.

    5. **Per-field tightened bounds** (round 3): ``bounds_head`` /
       ``bounds_torso`` = (near', far') from subject_depth_range /
       torso_depth_range — each field samples only its own occupied
       depth band, raising effective sample density at the same static
       per-ray count.

    Split into several small jitted programs, each holding at most ONE
    pallas launch and never gathering pallas outputs by a same-program
    top_k (the two axon failure patterns make_pruned_frame_renderer
    documents); the extra dispatches cost ~nothing at frame scale.

    Returns ``render(head_params, torso_params, pose, pose0, bc_img,
    aud=None, signal=None, expr=None, latent=None) -> (H, W, 3)`` —
    drop-in for make_composite_frame_renderer's signature.
    """
    from idealnerf_tpu.kernels.fused_render import (
        fused_render_coarse_hier, fused_render_rays,
    )
    from idealnerf_tpu.models.face_nerf import fold_conditioning

    import numpy as _np

    if cfg.n_importance < 2:
        # the in-kernel pdf-merge needs >=2 importance samples
        # (fused_render.py guards render_rays_fused the same way), and
        # the pruning structure assumes a fine pass exists at all
        raise ValueError(
            "make_composite_fast_renderer requires n_importance >= 2; "
            "use make_composite_frame_renderer for coarse-only configs")

    cfg = cfg.eval_mode()
    cd = compute_dtype or jnp.float32
    n = H * W
    per_field = (prior_mask_head is not None and
                 prior_mask_torso is not None)
    masked = per_field or prior_mask is not None

    # All selections and cross-field alignment maps are compile-time
    # numpy constants (no in-program top_k feeding gathers — the axon
    # failure pattern make_pruned_frame_renderer documents).
    def _sel(m_np):
        k = int(m_np.sum())
        k = min(n, ((k + 255) // 256) * 256)
        return _np.argsort(~m_np, kind="stable")[:k].astype(_np.int32)

    if per_field:
        mh = _np.asarray(prior_mask_head).reshape(-1).astype(bool)
        mt = _np.asarray(prior_mask_torso).reshape(-1).astype(bool)
        sel_h_np, sel_t_np, sel_u_np = _sel(mh), _sel(mt), _sel(mh | mt)
    elif masked:
        mu = _np.asarray(prior_mask).reshape(-1).astype(bool)
        if k_coarse is not None:
            sel_u_np = _np.argsort(~mu, kind="stable")[
                :min(n, k_coarse)].astype(_np.int32)
        else:
            sel_u_np = _sel(mu)
        sel_h_np = sel_t_np = sel_u_np
    else:
        sel_h_np = sel_t_np = sel_u_np = _np.arange(n, dtype=_np.int32)

    # keep_basis "frame" (round-4 starvation fix): each field's fine
    # budget is keep·H·W rays clamped to its mask, so masking removes
    # coarse work without shrinking the fine budget below what the
    # unmasked pruned mode would spend ("mask" = pre-round-4 semantics:
    # keep·|mask| — measured 0.378 dB starvation at keep 0.4 on the
    # 47%-coverage union prior, runs/rehearsal2/results.json).
    def _k(count, frac):
        base = n if keep_basis == "frame" else count
        k = min(int(base * frac), count)
        return max(k - k % 256, min(256, count))

    k_h = _k(len(sel_h_np), keep_head)
    k_t = _k(len(sel_t_np), keep_torso)

    def _pos(sel_np):
        p = _np.full(n, -1, _np.int32)
        p[sel_np] = _np.arange(len(sel_np), dtype=_np.int32)
        return p

    pos_h, pos_t = _pos(sel_h_np), _pos(sel_t_np)
    u2h = jnp.asarray(pos_h[sel_u_np])   # union ray -> head-set pos | -1
    u2t = jnp.asarray(pos_t[sel_u_np])   # union ray -> torso-set pos | -1
    h2t = jnp.asarray(pos_t[sel_h_np])   # head ray -> torso-set pos | -1
    sel_h = jnp.asarray(sel_h_np)
    sel_t = jnp.asarray(sel_t_np)
    sel_u = jnp.asarray(sel_u_np)

    nf_head = tuple(bounds_head) if bounds_head is not None else (near, far)
    nf_torso = (tuple(bounds_torso) if bounds_torso is not None
                else (near, far))

    @functools.partial(jax.jit, static_argnames=("is_torso",))
    def stage_coarse(params, pose_f, bc_img, cond, sel, is_torso=False):
        """One field's coarse pass + in-kernel hierarchical sampling on
        that field's own prior rays (one pallas launch)."""
        ncfg = torso_cfg if is_torso else head_cfg
        nf = nf_torso if is_torso else nf_head
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["coarse"], ncfg, *cond)
        o, d = get_rays(H, W, focal, pose_f, cx, cy)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        b = bc_img.reshape(-1, 3)
        if masked:
            o, d, b = o[sel], d[sel], b[sel]
        c, z = fused_render_coarse_hier(
            p["coarse"], folded, ncfg, o, d, b, nf[0], nf[1],
            cfg.n_samples, cfg.n_importance, point_tile=4096,
        )
        return dict(rgb=c["rgb_map"], acc=c["acc_map"],
                    lw=c["last_weight"], fg=c["rgb_fg"], z=z,
                    o=o, d=d, b=b)

    @jax.jit
    def stage_keep(acc_h, lw_h, acc_t, lw_t):
        """Fine-ray selection (no pallas in this program). The head's
        foreground score is weighted by the torso's coarse transmittance
        at the same pixel (h2t map; 1.0 where the pixel has no torso
        support): fine head work the torso will hide (last_weight_torso
        ~ 0) is skipped."""
        lw_t_on_h = jnp.where(h2t >= 0, lw_t[jnp.clip(h2t, 0)], 1.0)
        _, keep_h = jax.lax.top_k((acc_h - lw_h) * lw_t_on_h, k_h)
        _, keep_t = jax.lax.top_k(acc_t - lw_t, k_t)
        return keep_h, keep_t

    @functools.partial(jax.jit, static_argnames=("is_torso",))
    def stage_fine(params, st, keep, cond, is_torso=False):
        """One field's fine pass on its kept rays (one pallas launch;
        gathers read materialized stage outputs by a materialized index)."""
        ncfg = torso_cfg if is_torso else head_cfg
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["fine"], ncfg, *cond)
        out = fused_render_rays(
            p["fine"], folded, ncfg, st["o"][keep], st["d"][keep],
            st["z"][keep], st["b"][keep],
        )
        return out["rgb_map"], out["last_weight"], out["rgb_fg"]

    @jax.jit
    def stage_composite(sh, st_, keep_h, keep_t, head_f, torso_f, bc_img):
        """Layered composite over the union set via the constant maps.

        A union pixel outside the head support composites the plate (an
        empty head field IS the plate there); outside the torso support
        the torso layer is the identity (last_weight 1, rgb_fg 0)."""
        rgb_h = sh["rgb"].at[keep_h].set(head_f[0])      # (n_h, 3)
        lw_t = st_["lw"].at[keep_t].set(torso_f[1])      # (n_t,)
        fg_t = st_["fg"].at[keep_t].set(torso_f[2])      # (n_t, 3)
        plate = bc_img.reshape(-1, 3)
        if per_field:
            in_h = (u2h >= 0)[:, None]
            rgb_h_u = jnp.where(in_h, rgb_h[jnp.clip(u2h, 0)],
                                plate[sel_u])
            lw_t_u = jnp.where(u2t >= 0, lw_t[jnp.clip(u2t, 0)], 1.0)
            fg_t_u = jnp.where((u2t >= 0)[:, None],
                               fg_t[jnp.clip(u2t, 0)], 0.0)
            comp = rgb_h_u * lw_t_u[:, None] + fg_t_u
        else:
            comp = rgb_h * lw_t[:, None] + fg_t
        if masked:
            img = plate.at[sel_u].set(comp)
        else:
            img = comp
        return img.reshape(H, W, 3)

    def render(head_params, torso_params, pose, pose0, bc_img,
               aud=None, signal=None, expr=None, latent=None):
        if "fine" not in head_params or "fine" not in torso_params:
            raise ValueError(
                "composite fast mode needs 'fine' params in both fields "
                "(coarse-only checkpoints: use the full-fidelity "
                "composite renderer)")
        cond_h = (aud, expr, latent)
        cond_t = (signal, None, None)
        sh = stage_coarse(head_params, pose, bc_img, cond_h, sel_h)
        st_ = stage_coarse(torso_params, pose0, bc_img, cond_t, sel_t,
                           is_torso=True)
        keep_h, keep_t = stage_keep(sh["acc"], sh["lw"], st_["acc"],
                                    st_["lw"])
        head_f = stage_fine(head_params, sh, keep_h, cond_h)
        torso_f = stage_fine(torso_params, st_, keep_t, cond_t,
                             is_torso=True)
        return stage_composite(sh, st_, keep_h, keep_t, head_f, torso_f,
                               bc_img)

    if _expose_stages:
        # profiling hook (scripts/comp_profile.py): the per-frame stage
        # programs + the compile-time ray selections, so each dispatch
        # can be timed in isolation against the end-to-end frame
        render.stages = dict(coarse=stage_coarse, keep=stage_keep,
                             fine=stage_fine, composite=stage_composite,
                             sel_h=sel_h, sel_t=sel_t, sel_u=sel_u)
    return render


def _tile_fns(coarse_fn, fine_fn, near, far, cfg, fused=None):
    """(coarse_tile_fn, fine_tile_fn) for the pruned/masked renderers.

    ``fused=None``: field-fn XLA path. ``fused=(params, nerf_cfg,
    folded_coarse, folded_fine)``: per-ray fused Pallas kernel
    (kernels/fused_render.py) for both passes.
    """
    if fused is not None:
        from idealnerf_tpu.kernels.fused_render import fused_render_rays

        params, nerf_cfg, folded_c, folded_f = fused

        def coarse_tile(args):
            o, d, b = args
            z_vals = stratified_sample(near, far, cfg.n_samples, o.shape[0],
                                       key=None, lindisp=cfg.lindisp)
            out = fused_render_rays(params["coarse"], folded_c, nerf_cfg,
                                    o, d, z_vals, b, point_tile=8192)
            return out["rgb_map"], out["weights"], out["acc_map"]

        def fine_tile(args):
            o, d, vd, w, b = args
            z_vals = stratified_sample(near, far, cfg.n_samples, o.shape[0],
                                       key=None, lindisp=cfg.lindisp)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(z_mid, w[..., 1:-1], cfg.n_importance)
            z = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
            out = fused_render_rays(params["fine"], folded_f, nerf_cfg,
                                    o, d, z, b, point_tile=4096)
            return out["rgb_map"]

        return coarse_tile, fine_tile

    coarse_cfg = RenderConfig(
        n_samples=cfg.n_samples, n_importance=0, perturb=False,
        lindisp=cfg.lindisp, density_activation=cfg.density_activation,
        white_bkgd=cfg.white_bkgd,
    )

    def coarse_tile(args):
        o, d, b = args
        out = render_rays(coarse_fn, o, d, b, near, far, coarse_cfg)
        return out["rgb_map"], out["weights"], out["acc_map"]

    def fine_tile(args):
        o, d, vd, w, b = args
        z_vals = stratified_sample(near, far, cfg.n_samples, o.shape[0],
                                   key=None, lindisp=cfg.lindisp)
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(z_mid, w[..., 1:-1], cfg.n_importance)
        z = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
        pts = o[:, None, :] + d[:, None, :] * z[..., None]
        raw = fine_fn(pts, vd)
        out = raw2outputs(raw, z, d, b,
                          density_activation=cfg.density_activation)
        return out.rgb

    return coarse_tile, fine_tile


def render_frame_pruned(
    coarse_fn,
    fine_fn,
    H: int,
    W: int,
    focal,
    pose,
    bc_img: jnp.ndarray,
    near,
    far,
    cfg: RenderConfig,
    cx=None,
    cy=None,
    tile: int = 8192,
    keep_fraction: float = 0.45,
    fine_tile: int = 4096,
    fused=None,
) -> jnp.ndarray:
    """Foreground-pruned hierarchical eval render.

    TPU-native algorithmic optimization (no reference counterpart — the
    reference evaluates 64+192 samples on every pixel of the frame,
    eval_aud_exp_nerf.py): most eval rays never hit the head; their
    coarse pass already composites to the known background plate with
    ~zero accumulated opacity. So: coarse-render all rays, keep the
    static top-K (= keep_fraction · H·W, shape-static for XLA) rays by
    coarse opacity, run the expensive fine pass only on those, and
    scatter the fine colors over the coarse image. With keep_fraction
    0.4-0.5 the fine workload drops >2× at visually identical output
    (the dropped rays' fine result would equal their coarse result: both
    composite the plate).
    """
    cfg = cfg.eval_mode()
    rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    bc = bc_img.reshape(-1, 3)
    n = rays_o.shape[0]

    coarse_tile_fn, fine_tile_fn = _tile_fns(
        coarse_fn, fine_fn, near, far, cfg, fused=fused
    )

    n_pad = (-n) % tile
    def pad(x, fill=0.0):
        if not n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)], 0
        )

    ro_p, rd_p, bc_p = pad(rays_o, 1.0), pad(rays_d, -1.0), pad(bc)

    rgb_c, weights_c, acc_c = jax.lax.map(
        coarse_tile_fn,
        (ro_p.reshape(-1, tile, 3), rd_p.reshape(-1, tile, 3),
         bc_p.reshape(-1, tile, 3)),
    )
    rgb_c = rgb_c.reshape(-1, 3)[:n]
    weights_c = weights_c.reshape(-1, weights_c.shape[-1])[:n]
    acc_c = acc_c.reshape(-1)[:n]

    # static top-K foreground rays; acc excludes the forced bg sample
    k = int(n * keep_fraction)
    k = max(k - k % 256, 256)  # tile-friendly
    score = acc_c - weights_c[:, -1]
    _, keep = jax.lax.top_k(score, k)

    ro_k, rd_k, bc_k = rays_o[keep], rays_d[keep], bc[keep]
    w_k = weights_c[keep]
    viewdirs = rd_k / jnp.linalg.norm(rd_k, axis=-1, keepdims=True)

    fine_tile = min(fine_tile, max(256, k))
    k_pad = (-k) % fine_tile
    def padk(x, fill=0.0):
        if not k_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((k_pad,) + x.shape[1:], fill, x.dtype)], 0
        )

    # per-tile inverse-CDF resampling: the masked-reduce inside
    # sample_pdf materializes (rays, n_importance, bins) — tiled here
    # so the intermediate stays ~tens of MB instead of GBs
    Sw = w_k.shape[-1]
    rgb_f = jax.lax.map(
        fine_tile_fn,
        (padk(ro_k, 1.0).reshape(-1, fine_tile, 3),
         padk(rd_k, -1.0).reshape(-1, fine_tile, 3),
         padk(viewdirs, -1.0).reshape(-1, fine_tile, 3),
         padk(w_k, 1.0).reshape(-1, fine_tile, Sw),
         padk(bc_k).reshape(-1, fine_tile, 3)),
    ).reshape(-1, 3)[:k]

    img = rgb_c.at[keep].set(rgb_f)
    return img.reshape(H, W, 3)


def make_pruned_frame_renderer(
    nerf_cfg,
    H: int, W: int, focal, near, far, cfg: RenderConfig,
    cx=None, cy=None, tile: int = 16875, keep_fraction: float = 0.4,
    fine_tile: int = 4096, compute_dtype=None,
    prior_mask=None, k_coarse: Optional[int] = None,
    keep_basis: str = "frame",
):
    """Foreground-pruned (optionally prior-masked) renderer on the fused
    per-ray kernel, split into TWO jitted stages.

    The split is load-bearing on the axon TPU runtime: one program that
    both contains pallas calls and gathers several arrays by the same
    top_k index vector crashes the TPU worker (kernel fault — observed
    whenever rgb[keep] and weights[keep] coexist with a pallas call).
    Materializing stage-1 outputs at a jit boundary makes the stage-2
    gathers read plain buffers, which is exactly the always-working XLA
    pattern. Cost: one extra dispatch, ~nothing at frame scale.

    ``prior_mask``/``k_coarse``: when given, the coarse pass runs only on
    the static prior rays (render_frame_prior_masked semantics).

    ``keep_basis``: what the fine budget ``keep_fraction`` is a fraction
    OF. "frame" (default) = keep·H·W fine rays (clamped to the mask) —
    the same absolute budget the unmasked pruned mode gets, so masking
    only removes coarse work and never starves the fine pass. "mask" =
    keep·k_coarse (the pre-round-4 behavior): with a 47%-coverage prior
    and keep 0.4 only 19% of frame rays got a fine pass, which measured
    a 0.378 dB starvation loss on the converged rehearsal checkpoint
    (runs/rehearsal2/results.json, round-3 verdict) while the unmasked
    keep-0.4 mode cost 0.002 dB.
    """
    from idealnerf_tpu.kernels.fused_render import fused_render_rays
    from idealnerf_tpu.models.face_nerf import fold_conditioning

    cfg = cfg.eval_mode()
    cd = compute_dtype or jnp.float32
    n = H * W
    masked = prior_mask is not None
    if masked:
        n_coarse = k_coarse
        coarse_tile = min(tile, 4096)
        prior_flat = prior_mask.reshape(-1).astype(jnp.float32)
    else:
        n_coarse = n
        coarse_tile = tile
    keep_base = n if keep_basis == "frame" else n_coarse
    k = min(int(keep_base * keep_fraction), n_coarse)
    k = max(k - k % 256, 256)

    @jax.jit
    def stage1(params, pose, bc_img, aud=None, expr=None, latent=None):
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["coarse"], nerf_cfg, aud, expr, latent)
        rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
        o = rays_o.reshape(-1, 3)
        d = rays_d.reshape(-1, 3)
        b = bc_img.reshape(-1, 3)
        if masked:
            _, sel = jax.lax.top_k(prior_flat, n_coarse)
            o_c, d_c, b_c = o[sel], d[sel], b[sel]
        else:
            sel = None
            o_c, d_c, b_c = o, d, b

        pad_c = (-n_coarse) % coarse_tile
        def padc(x, fill=0.0):
            if not pad_c:
                return x
            return jnp.concatenate(
                [x, jnp.full((pad_c,) + x.shape[1:], fill, x.dtype)], 0)

        def tile_fn(args):
            oo, dd, bb = args
            z = stratified_sample(near, far, cfg.n_samples, oo.shape[0],
                                  key=None, lindisp=cfg.lindisp)
            # point_tile 4096, NOT 8192: at 8192 the kernel's scoped VMEM
            # (~18 MB) exceeds the 16 MB chip limit once XLA fuses the
            # surrounding lax.map update-slices — compile error or worker
            # kernel-fault depending on which guard catches it first
            out = fused_render_rays(p["coarse"], folded, nerf_cfg,
                                    oo, dd, z, bb, point_tile=4096)
            return (out["rgb_map"], out["acc_map"], out["weights"],
                    out["last_weight"])

        rgb_c, acc, w, lw = jax.lax.map(
            tile_fn,
            (padc(o_c, 1.0).reshape(-1, coarse_tile, 3),
             padc(d_c, -1.0).reshape(-1, coarse_tile, 3),
             padc(b_c).reshape(-1, coarse_tile, 3)),
        )
        rgb_c = rgb_c.reshape(-1, 3)[:n_coarse]
        acc = acc.reshape(-1)[:n_coarse]
        lw = lw.reshape(-1)[:n_coarse]
        w = w.reshape(-1, cfg.n_samples)[:n_coarse]
        _, keep = jax.lax.top_k(acc - lw, k)
        return rgb_c, w, keep, sel, o, d, b

    @jax.jit
    def stage2(params, rgb_c, w, keep, sel, o, d, b,
               aud=None, expr=None, latent=None):
        p = jax.tree.map(lambda x: x.astype(cd), params)
        folded = fold_conditioning(p["fine"], nerf_cfg, aud, expr, latent)
        keep_full = sel[keep] if masked else keep
        ok, dk, bk, wk = o[keep_full], d[keep_full], b[keep_full], w[keep]
        vd = dk / jnp.linalg.norm(dk, axis=-1, keepdims=True)
        kp = (-k) % fine_tile
        def padk(x, fill=0.0):
            if not kp:
                return x
            return jnp.concatenate(
                [x, jnp.full((kp,) + x.shape[1:], fill, x.dtype)], 0)

        def tile_fn(args):
            oo, dd, vdd, ww, bb = args
            z_vals = stratified_sample(near, far, cfg.n_samples, oo.shape[0],
                                       key=None, lindisp=cfg.lindisp)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(z_mid, ww[..., 1:-1], cfg.n_importance)
            z = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
            out = fused_render_rays(p["fine"], folded, nerf_cfg,
                                    oo, dd, z, bb, point_tile=4096)
            return out["rgb_map"]

        Sw = wk.shape[-1]
        rgb_f = jax.lax.map(
            tile_fn,
            (padk(ok, 1.0).reshape(-1, fine_tile, 3),
             padk(dk, -1.0).reshape(-1, fine_tile, 3),
             padk(vd, -1.0).reshape(-1, fine_tile, 3),
             padk(wk, 1.0).reshape(-1, fine_tile, Sw),
             padk(bk).reshape(-1, fine_tile, 3)),
        ).reshape(-1, 3)[:k]

        if masked:
            img = b
            img = img.at[sel].set(rgb_c)
            img = img.at[sel[keep]].set(rgb_f)
        else:
            img = rgb_c.at[keep].set(rgb_f)
        return img.reshape(H, W, 3)

    def render(params, pose, bc_img, aud=None, expr=None, latent=None):
        rgb_c, w, keep, sel, o, d, b = stage1(params, pose, bc_img,
                                              aud=aud, expr=expr,
                                              latent=latent)
        return stage2(params, rgb_c, w, keep, sel, o, d, b,
                      aud=aud, expr=expr, latent=latent)

    return render


def foreground_prior_fields(dataset, margin: int = 12,
                            head_parse: bool = False):
    """Per-field subject priors for the composite fast path.

    The head field's support is the union of face rects; the torso
    field's is the union of torso parse masks (audio_exp_nerf.py:163-187
    builds its ray budget from exactly these quantities). Outside its
    own support a trained field is empty — the head composites the
    plate, the torso transmits (last_weight→1, rgb_fg→0) — so each
    field only ever needs to run on its own prior's rays, not the
    shared union. Returns (mask_head, mask_torso) as (H, W) bools,
    both dilated by ``margin``; the union of the two covers what
    foreground_prior returns over the subject.

    ``head_parse`` (round 4): tighten the head prior from the rect
    UNION BOX to the union of per-frame parse silhouettes clipped to
    each frame's face rect — the rect's empty corners (~25% of the box
    on a head) never held subject pixels in ANY training frame, so the
    trained field composites the plate there exactly like outside the
    rect. Convention-agnostic: the loader's parse channel marks
    "subject" (synthetic exporter) or "face" (reference BiSeNet red,
    face_parsing/test.py:41-57) — intersecting with the rect yields the
    head region either way. Falls back to the rect box when the parse
    covers <10% of it (degenerate/missing parse maps).
    """
    import numpy as np
    from scipy.ndimage import binary_dilation

    H, W = dataset.hw
    mask_h = np.zeros((H, W), bool)
    parse = (np.asarray(dataset.torso_masks).astype(bool)
             if head_parse else None)
    for i in range(dataset.size):
        x, y, w, h = [int(v) for v in dataset.face_rects[i]]
        y0, y1 = max(y - margin, 0), min(y + h + margin, H)
        x0, x1 = max(x - margin, 0), min(x + w + margin, W)
        rect = np.zeros((H, W), bool)
        rect[y0:y1, x0:x1] = True
        if parse is not None:
            sil = parse[i] & rect
            if sil.sum() >= 0.10 * rect.sum():
                mask_h |= sil
                continue
        mask_h |= rect
    mask_h = binary_dilation(mask_h, iterations=margin)
    mask_t = binary_dilation(
        dataset.torso_masks.any(0).astype(bool), iterations=margin)
    return mask_h, mask_t


def foreground_prior(dataset, margin: int = 12, head_parse: bool = False):
    """Subject foreground prior for masked eval: union of all frames'
    face rects and torso masks, dilated by ``margin`` pixels. Returns
    (mask (H, W) bool, k_coarse) with k_coarse padded to a tile-friendly
    static count. Legitimate subject data — the parse maps the offline
    pipeline already produces (SURVEY §2.6).

    ``head_parse``: replace each frame's face-rect BOX with the parse
    silhouette clipped to it (foreground_prior_fields' round-4
    tightening) — on the rehearsal subject this shrinks the union from
    47.3% (motion-swept boxes) to the actual subject silhouette, with
    the same exactness argument (the field composites the plate
    wherever no training frame held subject pixels)."""
    import numpy as np

    H, W = dataset.hw
    mask = np.zeros((H, W), bool)
    parse = (np.asarray(dataset.torso_masks).astype(bool)
             if head_parse else None)
    for i in range(dataset.size):
        x, y, w, h = [int(v) for v in dataset.face_rects[i]]
        y0, y1 = max(y - margin, 0), min(y + h + margin, H)
        x0, x1 = max(x - margin, 0), min(x + w + margin, W)
        rect = np.zeros((H, W), bool)
        rect[y0:y1, x0:x1] = True
        if parse is not None:
            sil = parse[i] & rect
            if sil.sum() >= 0.10 * rect.sum():
                mask |= sil
                continue
        mask |= rect
    mask |= dataset.torso_masks.any(0).astype(bool)
    # dilate the torso contribution too
    from scipy.ndimage import binary_dilation

    mask = binary_dilation(mask, iterations=margin)
    k = int(mask.sum())
    k = min(H * W, ((k + 255) // 256) * 256)
    return mask, k


def field_occupancy_prior(nerf_cfg, params, H, W, focal, poses, conds,
                          near, far, cfg: RenderConfig, base_mask,
                          cx=None, cy=None, thresh: float = 1e-3,
                          margin: int = 6, tile: int = 8192,
                          compute_dtype=None, latent=None):
    """Zero-foreground-mass ray cut: (H, W) bool occupancy prior from
    the TRAINED coarse field itself.

    Renders the coarse pass on ``base_mask``'s rays for each probe frame
    in ``poses``/``conds`` and keeps rays whose foreground weight mass
    (plate sample excluded) exceeds ``thresh`` on ANY probe, max-dilated
    by ``margin`` px. By the reference's plate-composite construction
    (baseline.py:325-375: rgb = Σ w·rgb + last_weight·plate) a ray with
    ~zero foreground mass composites the plate exactly, so cutting it
    from BOTH passes is exact up to ``thresh`` — this tightens the
    geometric parse/rect prior (which covers everywhere the subject EVER
    was) to where the trained field actually carries mass.

    ``conds``: per-probe (aud, expr) tuples (pass the net's conditioning
    features, not raw audio); ``latent``: the shared eval latent.
    Returns (mask (H, W) bool ⊆ base_mask, k_coarse tile-padded)."""
    import numpy as np
    from scipy.ndimage import binary_dilation

    from idealnerf_tpu.models.face_nerf import make_field_fn

    base = np.asarray(base_mask).reshape(-1).astype(bool)
    sel = np.nonzero(base)[0].astype(np.int32)
    pad = (-len(sel)) % 256
    if pad:
        sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
    sel_d = jnp.asarray(sel)
    ccfg = RenderConfig(
        n_samples=cfg.n_samples, n_importance=0, perturb=False,
        lindisp=cfg.lindisp, density_activation=cfg.density_activation,
        white_bkgd=False)

    @jax.jit
    def probe_mass(params, pose_f, aud, expr, latent):
        cf = make_field_fn(params["coarse"], nerf_cfg, aud, expr, latent,
                           compute_dtype=compute_dtype)
        o, d = get_rays(H, W, focal, pose_f, cx, cy)
        o = o.reshape(-1, 3)[sel_d]
        d = d.reshape(-1, 3)[sel_d]
        b = jnp.zeros_like(o)

        def tile_mass(args):
            out = render_rays(cf, *args, near, far, ccfg)
            return jnp.sum(out["weights"][..., :-1], -1)

        nrays = o.shape[0]
        t = min(tile, nrays)
        t -= t % 256 or 0
        if nrays % t:
            t = nrays
        return jax.lax.map(
            tile_mass,
            (o.reshape(-1, t, 3), d.reshape(-1, t, 3),
             b.reshape(-1, t, 3))).reshape(-1)

    mass = None
    for pose_f, (aud, expr) in zip(poses, conds):
        m = probe_mass(params, jnp.asarray(pose_f), aud, expr, latent)
        mass = m if mass is None else jnp.maximum(mass, m)
    mass_np = np.asarray(mass, np.float32)
    occ = np.zeros(H * W, bool)
    occ[sel] = mass_np > thresh
    occ = binary_dilation(occ.reshape(H, W), iterations=margin)
    occ &= np.asarray(base_mask).reshape(H, W).astype(bool)
    k = int(occ.sum())
    k = min(H * W, ((k + 255) // 256) * 256)
    return occ, k


def cached_occupancy_prior(cache_dir, step, compute_fn):
    """Disk-cached field_occupancy_prior beside the checkpoint (same
    pattern as cached_depth_band): ``<cache_dir>/occ_prior_<step>.npy``.
    Returns (mask, k_coarse)."""
    import os

    import numpy as np

    path = os.path.join(cache_dir, f"occ_prior_{int(step)}.npy")
    if os.path.exists(path):
        occ = np.load(path)
        k = int(occ.sum())
        return occ, min(occ.size, ((k + 255) // 256) * 256)
    occ, k = compute_fn()
    try:
        np.save(path, occ)
    except OSError:
        pass
    return occ, k


def render_frame_prior_masked(
    coarse_fn,
    fine_fn,
    H: int,
    W: int,
    focal,
    pose,
    bc_img: jnp.ndarray,
    near,
    far,
    cfg: RenderConfig,
    prior_mask: jnp.ndarray,   # (H, W) bool subject foreground prior
    k_coarse: int,             # static count of prior rays (foreground_prior)
    cx=None,
    cy=None,
    keep_fraction: float = 0.5,
    coarse_tile: int = 4096,
    fine_tile: int = 4096,
    fused=None,
    keep_basis: str = "frame",
) -> jnp.ndarray:
    """Prior-masked + opacity-pruned eval render.

    Second pruning level on top of render_frame_pruned: rays outside the
    subject's foreground prior never see ANY network — their trained
    composite is the background plate by construction (raw2outputs forces
    the final sample to the plate; empty rays transmit to it). Coarse
    runs only on the k_coarse prior rays; the fine pass on the top
    keep_fraction rays by coarse opacity, where ``keep_basis`` picks the
    budget basis: "frame" (default) = keep·H·W fine rays clamped to the
    mask (same absolute fine budget as the unmasked pruned mode — the
    round-4 starvation fix), "mask" = keep·k_coarse (pre-round-4
    semantics; 0.378 dB starvation at keep 0.4 on a 47% prior).
    Everything stays shape-static.
    """
    cfg = cfg.eval_mode()
    rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    bc = bc_img.reshape(-1, 3)
    n = rays_o.shape[0]

    # static selection of the prior rays (mask is 0/1; ties broken by
    # index via iota epsilon so selection is deterministic)
    score = prior_mask.reshape(-1).astype(jnp.float32)
    _, sel = jax.lax.top_k(score, k_coarse)

    ro_s, rd_s, bc_s = rays_o[sel], rays_d[sel], bc[sel]

    coarse_tile_fn, fine_tile_fn = _tile_fns(
        coarse_fn, fine_fn, near, far, cfg, fused=fused
    )

    kc_pad = (-k_coarse) % coarse_tile
    def padc(x, fill=0.0):
        if not kc_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((kc_pad,) + x.shape[1:], fill, x.dtype)], 0
        )

    rgb_c, w_c, acc_c = jax.lax.map(
        coarse_tile_fn,
        (padc(ro_s, 1.0).reshape(-1, coarse_tile, 3),
         padc(rd_s, -1.0).reshape(-1, coarse_tile, 3),
         padc(bc_s).reshape(-1, coarse_tile, 3)),
    )
    rgb_c = rgb_c.reshape(-1, 3)[:k_coarse]
    w_c = w_c.reshape(-1, w_c.shape[-1])[:k_coarse]
    acc_c = acc_c.reshape(-1)[:k_coarse]

    keep_base = n if keep_basis == "frame" else k_coarse
    k_fine = min(int(keep_base * keep_fraction), k_coarse)
    k_fine = max(k_fine - k_fine % 256, 256)
    _, keep = jax.lax.top_k(acc_c - w_c[:, -1], k_fine)

    ro_k, rd_k, bc_k, w_k = ro_s[keep], rd_s[keep], bc_s[keep], w_c[keep]
    viewdirs = rd_k / jnp.linalg.norm(rd_k, axis=-1, keepdims=True)

    kf_pad = (-k_fine) % fine_tile
    def padf(x, fill=0.0):
        if not kf_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((kf_pad,) + x.shape[1:], fill, x.dtype)], 0
        )

    Sw = w_k.shape[-1]
    rgb_f = jax.lax.map(
        fine_tile_fn,
        (padf(ro_k, 1.0).reshape(-1, fine_tile, 3),
         padf(rd_k, -1.0).reshape(-1, fine_tile, 3),
         padf(viewdirs, -1.0).reshape(-1, fine_tile, 3),
         padf(w_k, 1.0).reshape(-1, fine_tile, Sw),
         padf(bc_k).reshape(-1, fine_tile, 3)),
    ).reshape(-1, 3)[:k_fine]

    img = bc                               # non-prior rays: the plate
    img = img.at[sel].set(rgb_c)           # prior rays: coarse composite
    img = img.at[sel[keep]].set(rgb_f)     # foreground rays: fine
    return img.reshape(H, W, 3)


def make_frame_renderer(
    nerf_cfg,
    H: int, W: int, focal, near, far, cfg: RenderConfig,
    cx=None, cy=None, tile: int = 8192,
    compute_dtype=None,
    use_pallas=False,
) -> Callable:
    """One jit-compiled program per *model config* (not per frame):
    ``render(params, pose, bc_img, aud, expr, latent) -> (H, W, 3)``.

    Field closures are built inside the traced function, so every frame of
    a video reuses the same executable — the reference re-launches 25
    chunked renders per frame instead (batchify_rays).

    ``use_pallas``: False = pure XLA; True = per-point fused MLP kernel
    (kernels/fused_mlp.py); "ray" = per-ray fused render kernel with
    in-kernel compositing (kernels/fused_render.py) — the fastest path.
    """
    from idealnerf_tpu.models.face_nerf import make_field_fn

    if use_pallas == "ray":
        from idealnerf_tpu.kernels.fused_render import render_rays_fused
        from idealnerf_tpu.models.face_nerf import fold_conditioning

        @jax.jit
        def _render_fused(params, pose, bc_img, aud=None, expr=None,
                          latent=None):
            cd = compute_dtype or jnp.float32
            p = jax.tree.map(lambda x: x.astype(cd), params)
            folded_c = fold_conditioning(p["coarse"], nerf_cfg, aud, expr,
                                         latent)
            folded_f = (fold_conditioning(p["fine"], nerf_cfg, aud, expr,
                                          latent) if "fine" in p else None)
            rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
            rays_o = rays_o.reshape(-1, 3)
            rays_d = rays_d.reshape(-1, 3)
            bc = bc_img.reshape(-1, 3)
            # no host-side tiling: the pallas grid streams ray tiles
            # itself, and one whole-frame launch pair measures ~115 ms
            # less than 12 lax.map tiles (fewer dispatches + no
            # per-tile intermediate materialization)
            out = render_rays_fused(
                p["coarse"], folded_c, nerf_cfg, rays_o, rays_d, bc,
                near, far, cfg.n_samples, cfg.n_importance,
                fine_params=p.get("fine"), fine_folded=folded_f,
                lindisp=cfg.lindisp,
            )
            return out["rgb_map"].reshape(H, W, 3)

        return _render_fused

    @jax.jit
    def _render(params, pose, bc_img, aud=None, expr=None, latent=None):
        coarse_fn = make_field_fn(
            params["coarse"], nerf_cfg, aud, expr, latent,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        )
        fine_fn = make_field_fn(
            params["fine"], nerf_cfg, aud, expr, latent,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        ) if "fine" in params else None
        return render_frame(
            coarse_fn, H, W, focal, pose, bc_img, near, far, cfg,
            cx=cx, cy=cy, fine_fn=fine_fn, tile=tile,
        )

    return _render
