"""Render the val split through a trained model to video + metrics
(reference: NeRFs/HeadNeRF/test/test_nerf.py, test_unet_att_nerf.py, and
the metric-less eval twins — this adds PSNR/SSIM against ground truth,
which the reference only eyeballed via TensorBoard)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.cli.common import build_parser, resolve_config, resolve_dataset
from idealnerf_tpu.eval.metrics import psnr, ssim
from idealnerf_tpu.eval.renderer import make_frame_renderer
from idealnerf_tpu.eval.video import VideoWriter
from idealnerf_tpu.models.variants import variant_conditioning, variant_nerf_config
from idealnerf_tpu.train.head import compute_aud_feature
from idealnerf_tpu.train.state import init_train_state
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--head_ckpt", type=str, required=False)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--pruned", type=int, default=0,
                        help="foreground-pruned fast eval path; a value "
                             ">1 is the keep percentage (e.g. 40)")
    parser.add_argument("--prior_masked", type=int, default=0,
                        help="with --pruned: restrict all network work "
                             "to the subject's foreground prior (union "
                             "of train-split face rects + torso parse "
                             "masks, eval/renderer.foreground_prior)")
    parser.add_argument("--ray_devices", type=int, default=0,
                        help="shard each frame's rays over this many "
                             "devices (the 'ray' mesh axis; full-"
                             "fidelity mode only)")
    parser.add_argument("--head_parse", type=int, default=0,
                        help="with --prior_masked: tighten the prior "
                             "from face-rect boxes to parse silhouettes "
                             "(foreground_prior head_parse)")
    parser.add_argument("--occ_prior", type=int, default=0,
                        help="with --prior_masked: additionally cut "
                             "rays where the TRAINED coarse field "
                             "carries ~zero foreground mass on probe "
                             "train frames (field_occupancy_prior — "
                             "exact by the plate-composite "
                             "construction, baseline.py:325-375); "
                             "cached beside the checkpoint")
    parser.add_argument("--keep_basis", choices=("frame", "mask"),
                        default="frame",
                        help="what --pruned's keep %% is a fraction of "
                             "under --prior_masked: 'frame' (default; "
                             "same absolute fine budget as unmasked "
                             "pruning) or 'mask' (pre-round-4 "
                             "semantics, starves the fine pass)")
    parser.add_argument("--tighten_bounds", type=int, default=0,
                        help="tighten [near,far] to the trained model's "
                             "own depth band (subject_depth_range): "
                             "higher effective sample density at the "
                             "same per-ray count")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)

    ds = resolve_dataset(args, cfg, mode="val")
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg, ds.size)
    if args.head_ckpt:
        # raw restore: the latent table is train-set-sized; eval only
        # needs latent_codes[0] (eval_aud_exp_nerf.py:472)
        from idealnerf_tpu.ckpt import CheckpointManager

        raw = CheckpointManager(args.head_ckpt).restore_raw()
        state = state._replace(
            params=raw["params"],
            latent_codes=jnp.asarray(raw["latent_codes"]),
            step=jnp.asarray(raw["step"]),
        )
    else:
        logger.warning("no --head_ckpt: rendering fresh weights (dry run)")

    H, W = ds.hw
    head_cfg = variant_nerf_config(cfg)
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else None
    if args.prior_masked and not args.pruned:
        parser.error("--prior_masked requires --pruned (the prior mask "
                     "only applies to the pruned fast path)")
    if args.ray_devices and args.pruned:
        parser.error("--ray_devices applies to full-fidelity renders "
                     "only (not with --pruned: its ray selection is "
                     "host-side)")
    near, far = ds.near, ds.far
    ds_train = None
    if args.tighten_bounds:
        from idealnerf_tpu.eval.renderer import (
            cached_depth_band, subject_depth_range,
        )

        ds_train = resolve_dataset(args, cfg, mode="train")
        near, far = cached_depth_band(
            args.head_ckpt, "head", state.step,
            lambda: subject_depth_range(
                cfg, state.params, state.latent_codes, ds_train,
                compute_dtype=compute_dtype))
        logger.info("tightened bounds: [%.4f, %.4f] (config: "
                    "[%.4f, %.4f])", near, far, ds.near, ds.far)
    if args.pruned:
        # foreground-pruned fast path (fine pass on the top rays by
        # coarse opacity) — used by the quality-delta measurements
        from idealnerf_tpu.eval.renderer import make_pruned_frame_renderer

        prior_mask = k_coarse = None
        if args.prior_masked:
            # the prior is a train-time subject statistic (face rects ∪
            # torso parse union over the training frames)
            from idealnerf_tpu.eval.renderer import foreground_prior

            if ds_train is None:
                ds_train = resolve_dataset(args, cfg, mode="train")
            mask_np, k_coarse = foreground_prior(
                ds_train, head_parse=bool(args.head_parse))
            if args.occ_prior:
                from idealnerf_tpu.eval.renderer import (
                    cached_occupancy_prior, field_occupancy_prior,
                )

                smooth_p = (cfg.dim_aud > 29
                            and int(state.step) >= cfg.nosmo_iters)
                auds_d = jnp.asarray(ds_train.auds)
                ids_d = jnp.asarray(ds_train.aud_ids)
                lat_p = (state.latent_codes[0] if cfg.dim_latent > 0
                         else None)
                probe_ids = list(range(
                    0, ds_train.size, max(1, ds_train.size // 8)))[:8]
                conds, poses_p = [], []
                for pi in probe_ids:
                    aud_p = compute_aud_feature(
                        state.params, auds_d, ids_d, pi, cfg, smooth_p)
                    expr_p = (jnp.asarray(ds_train.exprs[pi])
                              if cfg.dim_expr > 0 else None)
                    conds.append(variant_conditioning(
                        state.params, cfg, aud_p, expr_p))
                    poses_p.append(ds_train.poses[pi])
                base_np = mask_np
                mask_np, k_coarse = cached_occupancy_prior(
                    args.head_ckpt, state.step,
                    lambda: field_occupancy_prior(
                        head_cfg, state.params, H, W, ds.focal, poses_p,
                        conds, near, far, cfg.render_config(), base_np,
                        cx=ds.cx, cy=ds.cy, compute_dtype=compute_dtype,
                        latent=lat_p))
                logger.info(
                    "occupancy cut: %.1f%% -> %.1f%% coverage",
                    100.0 * float(base_np.mean()),
                    100.0 * float(mask_np.mean()))
            prior_mask = jnp.asarray(mask_np)
            logger.info("subject prior: %.1f%% coverage, k_coarse %d",
                        100.0 * float(mask_np.mean()), k_coarse)
        render = make_pruned_frame_renderer(
            head_cfg, H, W, ds.focal, near, far, cfg.render_config(),
            cx=ds.cx, cy=ds.cy, tile=min(8192, H * W),
            keep_fraction=args.pruned / 100.0 if args.pruned > 1 else 0.4,
            compute_dtype=compute_dtype,
            prior_mask=prior_mask, k_coarse=k_coarse,
            keep_basis=args.keep_basis,
        )
    elif args.ray_devices:
        # multi-chip eval: each frame's rays shard over the 'ray' axis
        from idealnerf_tpu.parallel import make_mesh, make_sharded_frame_renderer

        mesh = make_mesh(n_ray=args.ray_devices,
                         devices=jax.devices()[: args.ray_devices])
        tile = min(8192, H * W)
        tile -= tile % args.ray_devices or 0
        logger.info("ray-sharded eval over %d devices", args.ray_devices)
        render = make_sharded_frame_renderer(
            head_cfg, mesh, H, W, ds.focal, near, far,
            cfg.render_config(), cx=ds.cx, cy=ds.cy, tile=tile,
            compute_dtype=compute_dtype,
        )
    else:
        render = make_frame_renderer(
            head_cfg, H, W, ds.focal, near, far, cfg.render_config(),
            cx=ds.cx, cy=ds.cy,
            tile=min(8192, H * W),
            compute_dtype=compute_dtype,
            use_pallas="ray" if on_tpu else False,
        )
    data = ds.to_device()
    bc = data["bc_img"].astype(jnp.float32) / 255.0
    smooth = cfg.dim_aud > 29 and int(state.step) >= cfg.nosmo_iters

    save_path = cfg.save_path or "output/render"
    out = os.path.join(save_path, f"{cfg.expname}_val.avi")
    n = ds.size if args.max_frames is None else min(args.max_frames, ds.size)
    psnrs, ssims = [], []
    with VideoWriter(out) as writer:
        for i in range(n):
            aud = compute_aud_feature(
                state.params, data["auds"], data["aud_ids"], i, cfg, smooth
            )
            expr = data["exprs"][i] if cfg.dim_expr > 0 else None
            aud_arg, expr_arg = variant_conditioning(state.params, cfg, aud, expr)
            latent = (
                state.latent_codes[0] if cfg.dim_latent > 0 else None
            )  # eval uses latent_codes[0] (eval_aud_exp_nerf.py:472)
            frame = render(state.params, data["poses"][i], bc,
                           aud=aud_arg, expr=expr_arg, latent=latent)
            gt = data["images"][i].astype(jnp.float32) / 255.0
            psnrs.append(float(psnr(frame, gt)))
            ssims.append(float(ssim(frame, gt)))
            writer.add(np.asarray(jnp.clip(frame, 0, 1)))
            logger.info("val frame %d/%d psnr %.2f ssim %.3f",
                        i + 1, n, psnrs[-1], ssims[-1])
    logger.info("val set: mean PSNR %.2f, mean SSIM %.3f -> %s",
                float(np.mean(psnrs)), float(np.mean(ssims)), out)
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}


if __name__ == "__main__":
    main()
