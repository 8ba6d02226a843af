"""Cross-subject reenactment evaluation (reference:
NeRFs/HeadNeRF/test/eval_aud_exp_nerf.py; with --torso_ckpt also covers
test_torso.py's composite video render).

Identity frames/poses/background from --datadir, driving expressions from
--evalExpr_path (another subject's transforms json), driving audio from
--aud_file; writes a 25 fps MJPG video + periodic frame JPGs under
--save_path."""

from __future__ import annotations

import os

import jax
import numpy as np

from idealnerf_tpu.cli.common import build_parser, resolve_config, resolve_dataset
from idealnerf_tpu.eval.reenact import load_driving_exprs, reenact
from idealnerf_tpu.train.state import init_train_state
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--head_ckpt", type=str, required=False)
    parser.add_argument("--torso_ckpt", type=str, default=None)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--fast", type=int, default=0,
                        help="pruned fast eval: keep percentage for the "
                             "fine pass (e.g. 40); 0 = full fidelity")
    parser.add_argument("--prior", type=int, default=0,
                        help="with --fast: restrict all network work to "
                             "the identity subject's foreground prior "
                             "(face rects + torso parse union)")
    parser.add_argument("--ray_devices", type=int, default=0,
                        help="shard each frame's rays over this many "
                             "devices (mesh 'ray' axis); full-fidelity "
                             "renders only (not with --fast)")
    parser.add_argument("--data_devices", type=int, default=0,
                        help="batch this many frames per launch over the "
                             "mesh 'data' axis (video production, "
                             "head-only and composite); composes with "
                             "--ray_devices")
    parser.add_argument("--tighten_bounds", type=int, default=0,
                        help="tighten [near,far] to the trained head's "
                             "own depth band (subject_depth_range); "
                             "head-only renders")
    parser.add_argument("--temporal", type=int, default=0,
                        help="temporal depth-cache video mode: keyframe "
                             "interval in frames (e.g. 25); frames in "
                             "between resample only each ray's cached "
                             "foreground depth band (eval/temporal.py). "
                             "Head-only and composite; not with --fast "
                             "or mesh flags")
    parser.add_argument("--auto_temporal", type=str, default=None,
                        metavar="EVIDENCE_DIR",
                        help="apply the quality-gated temporal video "
                             "configuration measured for this subject "
                             "(directory holding temporal_delta*.json "
                             "from scripts/temporal_delta.py): sets "
                             "--temporal/--s_delta/--s_delta_torso/"
                             "--delta_keep, the keyframe sample rung, "
                             "and --prior. Errors if no measured point "
                             "holds the quality gate")
    parser.add_argument("--s_delta", type=int, default=32,
                        help="with --temporal: samples per ray on delta "
                             "frames")
    parser.add_argument("--s_delta_torso", type=int, default=None,
                        help="with --temporal on a composite: torso-field "
                             "delta samples (default: same as --s_delta; "
                             "the torso's wider band usually needs more)")
    parser.add_argument("--delta_keep", type=float, default=1.0,
                        help="with --temporal: fraction of prior rays "
                             "re-rendered on delta frames (keyframe's "
                             "top foreground-mass rays, spatially "
                             "dilated); the rest hold the keyframe's "
                             "pixels for the cycle")
    parser.add_argument("--delta_keep_torso", type=float, default=None,
                        help="with --temporal + --torso_ckpt: torso-"
                             "field delta keep (default: --delta_keep). "
                             "The torso's rays come from the fixed "
                             "first-frame pose, so it tolerates a "
                             "lower keep than the moving head")
    parser.add_argument("--freeze_z_torso", type=int, default=0,
                        help="with --temporal + --torso_ckpt: torso "
                             "delta frames re-evaluate the network at "
                             "the keyframe's exact depth grid (static "
                             "torso rays keep the keyframe quadrature "
                             "valid all cycle)")
    parser.add_argument("--uni_frac", type=float, default=0.25,
                        help="with --temporal: fraction of delta "
                             "in-band samples placed uniformly across "
                             "the cached band")
    parser.add_argument("--kf_blend", type=float, default=0.0,
                        help="with --temporal: fraction of delta "
                             "importance samples drawn from the "
                             "keyframe's full-res CDF (anti-drift "
                             "anchor)")
    parser.add_argument("--dilate_every", type=int, default=1,
                        help="with --temporal: run the spatial band "
                             "dilation only on every k-th delta frame "
                             "(invalid rays carry their previous band "
                             "in between) — thins per-delta-frame "
                             "fixed work")
    parser.add_argument("--head_parse", type=int, default=0,
                        help="tighten the subject priors from face-rect "
                             "boxes to parse silhouettes "
                             "(foreground_prior* head_parse)")
    parser.add_argument("--roll_k_torso", type=int, default=0,
                        help="with --temporal + --torso_ckpt: torso "
                             "REFRESH-ONLY rolling — every frame "
                             "re-renders 1/K of the torso rays at the "
                             "full keyframe schedule (age bound K "
                             "frames, no torso delta pass); forces the "
                             "per-frame loop (no scanned cycle)")
    parser.add_argument("--cycle", type=int, default=1,
                        help="with --temporal: render each cycle's "
                             "delta frames as ONE scanned program "
                             "(identical frames, equivalence-tested; "
                             "amortizes per-frame dispatch/fetch). 0 = "
                             "per-frame loop")
    args = parser.parse_args(argv)
    if args.auto_temporal:
        from idealnerf_tpu.eval.operating_points import gated_video_config

        mode = "comp" if args.torso_ckpt else "head"
        conf = gated_video_config(args.auto_temporal, mode)
        if conf is None:
            parser.error(
                f"--auto_temporal: no measured {mode} operating point in "
                f"{args.auto_temporal} holds the quality gate — run "
                "scripts/temporal_delta.py on this subject's converged "
                "checkpoint first")
        args.temporal = conf["refresh"]
        args.s_delta = conf["s_delta"]
        args.s_delta_torso = conf["s_delta_torso"]
        args.delta_keep = conf["delta_keep"]
        args.delta_keep_torso = conf.get("delta_keep_torso")
        args.freeze_z_torso = int(conf.get("freeze_z_torso", False))
        args.uni_frac = conf.get("uni_frac", 0.25)
        args.kf_blend = conf.get("kf_blend", 0.0)
        args.dilate_every = conf.get("dilate_every", 1)
        args.roll_k_torso = conf.get("roll_k_torso", 0) or 0
        args.head_parse = int(conf.get("head_parse", False))
        args.prior = 1
        if conf["keyframe_rung"]:
            s_kf, imp_kf = map(int, conf["keyframe_rung"].split("+"))
            args.N_samples, args.N_importance = s_kf, imp_kf
        logger.info("auto temporal (%s, quality-gated): refresh %d, "
                    "s_delta %s/%s, delta_keep %.2f, keyframe rung %s "
                    "(evidence measured WITH tightened per-field depth "
                    "bounds; pass --tighten_bounds where available to "
                    "match)", mode, args.temporal, args.s_delta,
                    args.s_delta_torso, args.delta_keep,
                    conf["keyframe_rung"])
    cfg = resolve_config(args)

    identity = resolve_dataset(args, cfg, mode="val")
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg, identity.size)
    if args.head_ckpt:
        # raw restore: latent table is train-set-sized, eval uses [0]
        from idealnerf_tpu.ckpt import CheckpointManager

        import jax.numpy as jnp

        raw = CheckpointManager(args.head_ckpt).restore_raw()
        state = state._replace(
            params=raw["params"],
            latent_codes=jnp.asarray(raw["latent_codes"]),
            step=jnp.asarray(raw["step"]),
        )
        logger.info("head from %s step %d", args.head_ckpt, int(state.step))
    else:
        logger.warning("no --head_ckpt: rendering with fresh weights (dry run)")

    torso_params = None
    if args.torso_ckpt:
        from idealnerf_tpu.ckpt import CheckpointManager
        from idealnerf_tpu.train.torso import init_torso_params

        like = {"torso_params": init_torso_params(jax.random.PRNGKey(0), cfg)}
        torso_params = CheckpointManager(args.torso_ckpt).restore_partial(like)[0][
            "torso_params"
        ]

    if cfg.evalExpr_path:
        exprs = load_driving_exprs(cfg.evalExpr_path)
    else:
        exprs = identity.exprs  # self-reenactment fallback
    if args.synthetic:
        auds = identity.auds
    else:
        auds = np.load(os.path.join(cfg.datadir, cfg.aud_file)).astype(np.float32)

    bounds = None
    if args.tighten_bounds:
        import jax.numpy as jnp

        if args.torso_ckpt:
            parser.error("--tighten_bounds is head-only from the CLI; "
                         "composite tightening runs through "
                         "scripts/composite_delta.py --tighten "
                         "(per-field bands)")
        from idealnerf_tpu.eval.renderer import (
            cached_depth_band, subject_depth_range,
        )

        bounds = cached_depth_band(
            args.head_ckpt, "head", state.step,
            lambda: subject_depth_range(
                cfg, state.params, state.latent_codes,
                resolve_dataset(args, cfg, mode="train"),
                compute_dtype=(jnp.bfloat16
                               if jax.default_backend() == "tpu"
                               else None)))
        logger.info("tightened bounds: [%.4f, %.4f]", *bounds)

    mesh = None
    H, W = identity.hw
    tile = min(8192, H * W)
    if args.ray_devices or args.data_devices:
        from idealnerf_tpu.parallel import make_mesh

        n_data = args.data_devices or 1
        n_ray = args.ray_devices or 1
        mesh = make_mesh(n_data=n_data, n_ray=n_ray,
                         devices=jax.devices()[: n_data * n_ray])
        tile -= tile % n_ray
        logger.info("sharded reenact: %d-frame batches x %d-way rays",
                    n_data, n_ray)

    save_path = cfg.save_path or "output/render"
    out = os.path.join(save_path, f"{cfg.expname}.avi")
    frames = reenact(
        cfg, state.params, identity,
        driving_auds=auds, driving_exprs=exprs,
        latent_codes=state.latent_codes, torso_params=torso_params,
        out_path=out, max_frames=args.max_frames,
        smooth_audio=cfg.nosmo_iters <= int(state.step),
        fast_keep=args.fast / 100.0 if args.fast else None,
        use_prior=bool(args.prior),
        mesh=mesh, tile=tile, bounds=bounds,
        temporal=args.temporal or None, s_delta=args.s_delta,
        delta_keep=args.delta_keep,
        delta_keep_torso=args.delta_keep_torso,
        freeze_z_torso=bool(args.freeze_z_torso),
        s_delta_torso=args.s_delta_torso,
        uni_frac=args.uni_frac, kf_blend=args.kf_blend,
        dilate_every=args.dilate_every,
        roll_k_torso=args.roll_k_torso,
        head_parse=bool(args.head_parse),
        cycle=bool(args.cycle) and not args.roll_k_torso,
    )
    logger.info("wrote %d frames to %s", frames.shape[0], out)


if __name__ == "__main__":
    main()
