"""Cross-subject reenactment evaluation (reference:
NeRFs/HeadNeRF/test/eval_aud_exp_nerf.py): identity (frames, poses,
background, latent) from subject A's dataset; driving expressions from
subject B's transforms json; driving audio sequentially from an aud .npy —
rendered frame-by-frame to a 25 fps video.

TPU-native details: audio features for the whole driving track are
computed in ONE jitted program (batched AudioNet + vmapped AudioAttNet
smoothing windows) instead of per-frame; each frame render reuses a single
compiled executable (eval/renderer.py).
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.dataset import FrameDataset
from idealnerf_tpu.eval.renderer import (
    make_composite_frame_renderer, make_frame_renderer,
)
from idealnerf_tpu.eval.video import VideoWriter
from idealnerf_tpu.models.audio_net import apply_audio_att_net, apply_audio_net
from idealnerf_tpu.models.variants import variant_conditioning, variant_nerf_config
from idealnerf_tpu.train.torso import torso_nerf_config, torso_signal
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.eval")


def load_driving_exprs(transforms_json_path: str) -> np.ndarray:
    """Expressions from another subject's transforms json
    (eval_aud_exp_nerf.py --evalExpr_path)."""
    with open(transforms_json_path) as fh:
        meta = json.load(fh)
    return np.stack(
        [np.array(f["exp"], np.float32) for f in meta["frames"]]
    )


def smoothed_audio_features(
    params: Dict[str, Any],
    auds: jnp.ndarray,  # (M, 16, 29) driving windows
    cfg: ExperimentConfig,
    smooth: bool = True,
) -> jnp.ndarray:
    """(M, dim_aud) features for the whole driving track, one program.

    Mirrors the per-frame 8-window AudAttNet smoothing of
    test_torso.py:478-498 / eval-time audio handling, vectorized."""

    @jax.jit
    def run(params, auds):
        feats = apply_audio_net(params["aud_net"], auds, win_size=cfg.win_size)
        if not smooth:
            return feats
        m = feats.shape[0]
        half = cfg.smo_size // 2

        def one(i):
            idx = i - half + jnp.arange(cfg.smo_size)
            valid = (idx >= 0) & (idx < m)
            win = jnp.where(
                valid[:, None], feats[jnp.clip(idx, 0, m - 1)], 0.0
            )
            return apply_audio_att_net(params["aud_att"], win)

        return jax.vmap(one)(jnp.arange(m))

    return run(params, auds)


def reenact(
    cfg: ExperimentConfig,
    head_params: Dict[str, Any],
    identity: FrameDataset,
    driving_auds: np.ndarray,
    driving_exprs: Optional[np.ndarray] = None,
    latent_codes: Optional[jnp.ndarray] = None,
    torso_params: Optional[Dict[str, Any]] = None,
    out_path: Optional[str] = None,
    max_frames: Optional[int] = None,
    smooth_audio: bool = True,
    compute_dtype=None,
    use_pallas: Optional[bool] = None,
    tile: int = 8192,
    fast_keep: Optional[float] = None,
    use_prior: bool = False,
    mesh=None,
    bounds=None,
    temporal: Optional[int] = None,
    s_delta: int = 32,
    delta_keep: float = 1.0,
    delta_keep_torso: Optional[float] = None,
    s_delta_torso: Optional[int] = None,
    uni_frac: float = 0.25,
    kf_blend: float = 0.0,
    freeze_z_torso: bool = False,
    dilate_every: int = 1,
    roll_k: int = 0,
    roll_k_torso: int = 0,
    cycle: bool = False,
    frame_times: Optional[list] = None,
    head_parse: bool = False,
):
    """Render the reenactment video; returns the stacked frames (N,H,W,3).

    Identity poses cycle through subject A's frames; expr index follows
    the driving sequence (clamped at its end, like aud_id clamping in
    GetData — audio_exp_nerf.py:81).

    ``fast_keep``: route through the pruned fast renderers (fine pass on
    the top fraction of rays by coarse foreground opacity; the composite
    additionally skips torso-occluded head work). ``use_prior``
    additionally restricts ALL network work to the identity subject's
    foreground prior (union of face rects + torso parse masks —
    eval/renderer.foreground_prior).

    ``mesh``: a ('data','ray') jax.sharding.Mesh — full-fidelity renders
    (head-only and composite) shard per-ray over the mesh's 'ray' axis
    (parallel/sharded.py); a 'data' axis > 1 additionally batches that
    many frames per launch (head-only video production). Incompatible
    with ``fast_keep``, whose ray selection is host-side.

    ``bounds``: (near', far') tightened sampling interval
    (eval.renderer.subject_depth_range); head-only renders only — the
    torso field has its own depth band."""
    if mesh is not None and fast_keep is not None:
        raise ValueError("mesh sharding requires full fidelity "
                         "(fast_keep=None)")
    if temporal is not None:
        if mesh is not None or fast_keep is not None:
            raise ValueError("temporal mode is incompatible with mesh "
                             "sharding and fast_keep (it has its own "
                             "keyframe/delta schedule)")
        if temporal < 1:
            raise ValueError("temporal must be >= 1 (keyframe interval)")
        if roll_k_torso and cycle:
            raise ValueError("roll_k_torso (torso refresh roll) has no "
                             "scanned-cycle program; drop cycle=True")
        if roll_k and cycle:
            raise ValueError("roll_k (rolling keyframe refresh) has no "
                             "scanned-cycle program; drop cycle=True")
        if roll_k and roll_k_torso:
            raise ValueError("roll_k and roll_k_torso are exclusive")
    if use_prior and fast_keep is None and temporal is None:
        raise ValueError("use_prior requires fast_keep or temporal (the "
                         "prior mask only applies to the fast renderers)")
    if (bounds is not None and torso_params is not None
            and not isinstance(bounds, dict)):
        raise ValueError(
            "composite bounds tightening needs per-field bands: pass "
            "bounds=dict(head=(n,f), torso=(n,f)) (subject_depth_range "
            "+ torso_depth_range) with fast_keep")
    if isinstance(bounds, dict) and fast_keep is None and temporal is None:
        raise ValueError("per-field bounds apply to the composite FAST/"
                         "temporal paths (fast_keep or temporal "
                         "required); the full-fidelity composite stays "
                         "at reference bounds")
    if isinstance(bounds, dict) and torso_params is None:
        raise ValueError("per-field bounds dict is for the composite; "
                         "head-only renders take bounds=(near, far)")
    if use_pallas is None:
        # "ray": whole-frame per-ray fused pipeline (the per-point kernel
        # inside the frame loop exceeds scoped VMEM at 450²)
        use_pallas = "ray" if jax.default_backend() == "tpu" else False
    if compute_dtype is None and jax.default_backend() == "tpu":
        compute_dtype = jnp.bfloat16

    H, W = identity.hw
    n_frames = driving_auds.shape[0] if max_frames is None else min(
        max_frames, driving_auds.shape[0]
    )
    # variant-aware: the head may be face_nerf / agg / attention — the
    # renderer sees the variant's FaceNeRF topology and pre-transformed
    # conditioning (models/variants.py)
    head_cfg = variant_nerf_config(cfg)
    render_cfg = cfg.render_config()

    aud_feats = smoothed_audio_features(
        head_params, jnp.asarray(driving_auds), cfg, smooth=smooth_audio
    )
    bc = jnp.asarray(identity.bc_img, jnp.float32) / 255.0
    latent = latent_codes[0] if latent_codes is not None else None

    prior_mask = k_coarse = None
    if use_prior:
        from idealnerf_tpu.eval.renderer import foreground_prior

        mask_np, k_coarse = foreground_prior(identity,
                                             head_parse=head_parse)
        prior_mask = jnp.asarray(mask_np)
        logger.info("subject prior: %.1f%% coverage, k_coarse %d",
                    100.0 * float(mask_np.mean()), k_coarse)

    if isinstance(bounds, dict):
        near, far = identity.near, identity.far
    else:
        near = bounds[0] if bounds is not None else identity.near
        far = bounds[1] if bounds is not None else identity.far

    render_video = None
    if torso_params is None:
        if temporal is not None:
            from idealnerf_tpu.eval.temporal import (
                make_temporal_frame_renderer,
            )

            # near/far already carry head-only tuple bounds (tightening)
            render = make_temporal_frame_renderer(
                head_cfg, H, W, identity.focal, near, far, render_cfg,
                cx=identity.cx, cy=identity.cy,
                compute_dtype=compute_dtype, s_delta=s_delta,
                prior_mask=prior_mask, delta_keep=delta_keep,
                uni_frac=uni_frac, kf_blend=kf_blend,
                dilate_every=dilate_every, roll_k=roll_k,
            )
        elif fast_keep is not None:
            from idealnerf_tpu.eval.renderer import make_pruned_frame_renderer

            render = make_pruned_frame_renderer(
                head_cfg, H, W, identity.focal, near,
                far, render_cfg, cx=identity.cx, cy=identity.cy,
                keep_fraction=fast_keep, compute_dtype=compute_dtype,
                prior_mask=prior_mask, k_coarse=k_coarse,
            )
        elif mesh is not None and mesh.shape.get("data", 1) > 1:
            # frame-batched: mesh 'data' axis renders several frames per
            # launch, 'ray' shards each frame's pixels
            from idealnerf_tpu.parallel import make_sharded_video_renderer

            render_video = make_sharded_video_renderer(
                head_cfg, mesh, H, W, identity.focal, near,
                far, render_cfg, cx=identity.cx, cy=identity.cy,
                tile=tile, compute_dtype=compute_dtype,
            )
        elif mesh is not None:
            from idealnerf_tpu.parallel import make_sharded_frame_renderer

            render = make_sharded_frame_renderer(
                head_cfg, mesh, H, W, identity.focal, near,
                far, render_cfg, cx=identity.cx, cy=identity.cy,
                tile=tile, compute_dtype=compute_dtype,
            )
        else:
            render = make_frame_renderer(
                head_cfg, H, W, identity.focal, near, far,
                render_cfg, cx=identity.cx, cy=identity.cy, tile=tile,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
            )
    else:
        if temporal is not None:
            from idealnerf_tpu.eval.temporal import (
                make_temporal_composite_renderer,
            )

            pf = {}
            if use_prior:
                from idealnerf_tpu.eval.renderer import (
                    foreground_prior_fields,
                )

                mh, mt = foreground_prior_fields(identity,
                                                 head_parse=head_parse)
                pf = dict(prior_mask_head=mh, prior_mask_torso=mt)
                logger.info(
                    "per-field priors: head %.1f%%, torso %.1f%%",
                    100.0 * float(mh.mean()), 100.0 * float(mt.mean()))
            if isinstance(bounds, dict):
                pf.update(bounds_head=bounds.get("head"),
                          bounds_torso=bounds.get("torso"))
            render = make_temporal_composite_renderer(
                head_cfg, torso_nerf_config(cfg), H, W, identity.focal,
                identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy,
                compute_dtype=compute_dtype, s_delta=s_delta,
                delta_keep_head=delta_keep,
                delta_keep_torso=(delta_keep if delta_keep_torso is None
                                  else delta_keep_torso),
                s_delta_torso=s_delta_torso,
                uni_frac=uni_frac, kf_blend=kf_blend,
                freeze_z_torso=freeze_z_torso,
                dilate_every=dilate_every,
                roll_k=roll_k, roll_k_torso=roll_k_torso,
                **pf,
            )
        elif fast_keep is not None:
            from idealnerf_tpu.eval.renderer import (
                make_composite_fast_renderer,
            )

            pf = {}
            if use_prior:
                # per-field supports (head: face rects, torso: parse
                # silhouette) — each field renders only its own rays
                from idealnerf_tpu.eval.renderer import (
                    foreground_prior_fields,
                )

                mh, mt = foreground_prior_fields(identity,
                                                 head_parse=head_parse)
                pf = dict(prior_mask_head=jnp.asarray(mh),
                          prior_mask_torso=jnp.asarray(mt))
                logger.info(
                    "per-field priors: head %.1f%%, torso %.1f%%",
                    100.0 * float(mh.mean()), 100.0 * float(mt.mean()))
            if isinstance(bounds, dict):
                pf.update(bounds_head=bounds.get("head"),
                          bounds_torso=bounds.get("torso"))
            render = make_composite_fast_renderer(
                head_cfg, torso_nerf_config(cfg), H, W, identity.focal,
                identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy,
                compute_dtype=compute_dtype,
                prior_mask=prior_mask, k_coarse=k_coarse,
                keep_head=fast_keep, keep_torso=fast_keep, **pf,
            )
        elif mesh is not None and mesh.shape.get("data", 1) > 1:
            from idealnerf_tpu.parallel import (
                make_sharded_composite_video_renderer,
            )

            render_video = make_sharded_composite_video_renderer(
                head_cfg, torso_nerf_config(cfg), mesh, H, W,
                identity.focal, identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy, tile=tile,
                compute_dtype=compute_dtype,
            )
        elif mesh is not None:
            from idealnerf_tpu.parallel import (
                make_sharded_composite_renderer,
            )

            render = make_sharded_composite_renderer(
                head_cfg, torso_nerf_config(cfg), mesh, H, W,
                identity.focal, identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy, tile=tile,
                compute_dtype=compute_dtype,
            )
        else:
            render = make_composite_frame_renderer(
                head_cfg, torso_nerf_config(cfg), H, W, identity.focal,
                identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy, tile=tile,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
            )
    pose0 = jnp.asarray(identity.poses[0])

    writer = VideoWriter(out_path) if out_path else None
    if render_video is not None:
        # frame-batched path: B frames per launch (B = 'data' axis size),
        # last batch padded by repetition and trimmed
        B = mesh.shape["data"]
        lat = (jnp.tile(latent[None], (B, 1))
               if latent is not None else None)

        def cond_at(i):
            expr = None
            if driving_exprs is not None and cfg.dim_expr > 0:
                expr = jnp.asarray(
                    driving_exprs[min(i, driving_exprs.shape[0] - 1)])
            return variant_conditioning(head_params, cfg, aud_feats[i], expr)

        frames = []
        for start in range(0, n_frames, B):
            t_frame = time.time()
            idxs = [min(start + j, n_frames - 1) for j in range(B)]
            poses_b = jnp.stack(
                [jnp.asarray(identity.poses[i % identity.size])
                 for i in idxs])
            conds = [cond_at(i) for i in idxs]
            auds_b = (jnp.stack([c[0] for c in conds])
                      if conds[0][0] is not None else None)
            exprs_b = (jnp.stack([c[1] for c in conds])
                       if conds[0][1] is not None else None)
            if torso_params is not None:
                sigs_b = jnp.stack([
                    torso_signal(aud_feats[i], poses_b[j], cfg.dim_aud_body)
                    for j, i in enumerate(idxs)])
                batch = render_video(head_params, torso_params, poses_b,
                                     pose0, bc, auds_b, sigs_b, exprs_b,
                                     lat)
            else:
                batch = render_video(head_params, poses_b, bc,
                                     auds_b, exprs_b, lat)
            batch = np.asarray(jnp.clip(batch, 0.0, 1.0))
            if frame_times is not None:
                # whole-batch wall clock amortized per emitted frame
                per = (time.time() - t_frame) / max(
                    min(B, n_frames - start), 1)
                frame_times.extend([per] * min(B, n_frames - start))
            for j in range(min(B, n_frames - start)):
                frames.append(batch[j])
                if writer is not None:
                    writer.add(batch[j])
            logger.info("reenact frames %d-%d/%d", start,
                        min(start + B, n_frames) - 1, n_frames)
        if writer is not None:
            writer.close()
        return np.stack(frames)

    if temporal is not None and cycle:
        # scanned-cycle temporal video: keyframes render per-frame; the
        # delta frames of each cycle run as ONE lax.scan program
        # (render.cycle) with one dispatch + one bulk frame fetch —
        # identical math to the per-frame path (equivalence-tested),
        # minus its per-frame fixed cost. A shorter tail chunk compiles
        # a second executable once.
        def cond_at(i):
            expr = None
            if driving_exprs is not None and cfg.dim_expr > 0:
                expr = jnp.asarray(
                    driving_exprs[min(i, driving_exprs.shape[0] - 1)])
            return variant_conditioning(head_params, cfg, aud_feats[i],
                                        expr)

        frames = []
        cache = None
        i = 0

        def one_frame(i, cache):
            """Per-frame path (keyframe when cache is None, else the
            first delta of the cycle — the scan carry needs its
            delta-shaped cache)."""
            t_frame = time.time()
            pose = jnp.asarray(identity.poses[i % identity.size])
            aud_arg, expr_arg = cond_at(i)
            if torso_params is None:
                frame, cache = render(head_params, pose, bc, aud=aud_arg,
                                      expr=expr_arg, latent=latent,
                                      cache=cache)
            else:
                signal = torso_signal(aud_feats[i], pose, cfg.dim_aud_body)
                frame, cache = render(head_params, torso_params, pose,
                                      pose0, bc, aud=aud_arg,
                                      signal=signal, expr=expr_arg,
                                      latent=latent, cache=cache)
            frame = np.asarray(jnp.clip(frame, 0.0, 1.0))
            if frame_times is not None:
                frame_times.append(time.time() - t_frame)
            frames.append(frame)
            if writer is not None:
                writer.add(frame)
            return cache

        while i < n_frames:
            cache = one_frame(i, None)      # keyframe
            i += 1
            if i < n_frames and temporal > 1:
                cache = one_frame(i, cache)  # first delta: reshapes cache
                i += 1

            T = min(temporal - 2, n_frames - i)
            if T <= 0:
                continue
            t_chunk = time.time()
            idxs = list(range(i, i + T))
            poses_c = jnp.stack(
                [jnp.asarray(identity.poses[j % identity.size])
                 for j in idxs])
            conds = [cond_at(j) for j in idxs]
            auds_c = (jnp.stack([c[0] for c in conds])
                      if conds[0][0] is not None else None)
            exprs_c = (jnp.stack([c[1] for c in conds])
                       if conds[0][1] is not None else None)
            lats_c = (jnp.tile(latent[None], (T, 1))
                      if latent is not None else None)
            if torso_params is None:
                chunk, cache = render.cycle(head_params, poses_c, bc,
                                            cache, auds=auds_c,
                                            exprs=exprs_c, latents=lats_c)
            else:
                sigs_c = jnp.stack([
                    torso_signal(aud_feats[j], poses_c[k], cfg.dim_aud_body)
                    for k, j in enumerate(idxs)])
                chunk, cache = render.cycle(head_params, torso_params,
                                            poses_c, pose0, bc, cache,
                                            auds=auds_c, signals=sigs_c,
                                            exprs=exprs_c, latents=lats_c)
            chunk = np.asarray(jnp.clip(chunk, 0.0, 1.0))
            if frame_times is not None:
                per = (time.time() - t_chunk) / T
                frame_times.extend([per] * T)
            for k in range(T):
                frames.append(chunk[k])
                if writer is not None:
                    writer.add(chunk[k])
            logger.info("reenact frames %d-%d/%d (scanned cycle)", i,
                        i + T - 1, n_frames)
            i += T
        if writer is not None:
            writer.close()
        return np.stack(frames)

    frames = []
    cache = None
    for i in range(n_frames):
        t_frame = time.time()
        pose = jnp.asarray(identity.poses[i % identity.size])
        expr = None
        if driving_exprs is not None and cfg.dim_expr > 0:
            expr = jnp.asarray(
                driving_exprs[min(i, driving_exprs.shape[0] - 1)]
            )
        aud = aud_feats[i]
        aud_arg, expr_arg = variant_conditioning(head_params, cfg, aud, expr)
        if torso_params is None and temporal is not None:
            # rolling mode: only frame 0 is a keyframe, the cache then
            # lives forever (each ray refreshes via its slice)
            if i % temporal == 0 and not roll_k:
                cache = None
            frame, cache = render(head_params, pose, bc, aud=aud_arg,
                                  expr=expr_arg, latent=latent, cache=cache)
        elif torso_params is None:
            frame = render(head_params, pose, bc, aud=aud_arg, expr=expr_arg,
                           latent=latent)
        elif temporal is not None:
            # keyframe every `temporal` frames (cache=None), band-confined
            # delta renders in between; rolling mode never re-keyframes
            if i % temporal == 0 and not roll_k:
                cache = None
            signal = torso_signal(aud, pose, cfg.dim_aud_body)
            frame, cache = render(head_params, torso_params, pose, pose0,
                                  bc, aud=aud_arg, signal=signal,
                                  expr=expr_arg, latent=latent, cache=cache)
        else:
            signal = torso_signal(aud, pose, cfg.dim_aud_body)
            frame = render(head_params, torso_params, pose, pose0, bc,
                           aud=aud_arg, signal=signal, expr=expr_arg,
                           latent=latent)
        frame = np.asarray(jnp.clip(frame, 0.0, 1.0))
        if frame_times is not None:
            # per-frame wall clock incl. the host fetch (reference parity:
            # test_torso.py:46-49); frame 0 carries the compile
            frame_times.append(time.time() - t_frame)
        frames.append(frame)
        if writer is not None:
            writer.add(frame)
        if i % 25 == 0:
            logger.info("reenact frame %d/%d", i, n_frames)
    if writer is not None:
        writer.close()
    return np.stack(frames)
