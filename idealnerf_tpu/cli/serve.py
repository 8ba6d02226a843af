"""Real-time serving CLI: stream a driving audio track through
eval.stream.TemporalStream frame-by-frame, as a live caller would.

The offline twin is cli/eval_reenact.py (whole-track batch render, like
the reference's eval_aud_exp_nerf.py:479-496); this entry point serves
the same models per-frame — audio windows are pushed in arrival order,
frames come back behind the centered-smoothing lookahead — and reports
the latency a live session sees (per-push percentiles, keyframe/delta
split, 25-fps deadline hit rate). Use --auto_temporal with a measured
evidence dir to serve at the quality-gated operating point.

    python -m idealnerf_tpu.cli.serve --config <cfg> --head_ckpt <dir> \
        [--torso_ckpt <dir>] --auto_temporal runs/rehearsal2_com \
        [--aud_file aud.npy] [--save_path output/serve]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

from idealnerf_tpu.cli.common import (
    build_parser,
    resolve_config,
    resolve_dataset,
)
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--head_ckpt", type=str, required=False)
    parser.add_argument("--torso_ckpt", type=str, default=None)
    parser.add_argument("--auto_temporal", type=str, default=None,
                        metavar="EVIDENCE_DIR",
                        help="serve at the quality-gated temporal "
                             "operating point measured in this dir "
                             "(scripts/temporal_delta.py output)")
    parser.add_argument("--refresh", type=int, default=25,
                        help="keyframe interval (without --auto_temporal)")
    parser.add_argument("--s_delta", type=int, default=16)
    parser.add_argument("--delta_keep", type=float, default=1.0)
    parser.add_argument("--roll_k", type=int, default=0,
                        help="rolling keyframe refresh: no keyframe "
                             "spikes, every frame pays delta + 1/K of "
                             "a keyframe (docs/SERVING.md); overrides "
                             "the operating point's cadence")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--no_smooth", action="store_true",
                        help="skip AudioAttNet smoothing: zero lookahead")
    parser.add_argument("--prior", type=int, default=1,
                        help="restrict network work to the subject's "
                             "foreground prior (default on: serving is "
                             "a fast-path use)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    op = None
    if args.auto_temporal:
        from idealnerf_tpu.eval.operating_points import gated_video_config

        mode = "comp" if args.torso_ckpt else "head"
        # a rolling cadence must gate on evidence measured AT that
        # cadence (roll<K> mode keys): a keyframed gate says nothing
        # about unbounded-horizon rolling drift (round-4 weakness: the
        # roll_k quality claim rested on an 8-frame agreement check)
        op = gated_video_config(args.auto_temporal, mode,
                                roll_k=args.roll_k)
        if op is None or not op.get("quality_ok", False):
            what = (f"roll_k={args.roll_k} rolling" if args.roll_k
                    else "keyframed")
            parser.error(
                f"--auto_temporal: no gated {mode} {what} operating "
                f"point in {args.auto_temporal} — run scripts/"
                f"temporal_delta.py"
                + (f" --roll_k {args.roll_k}" if args.roll_k else "")
                + " on this subject's converged checkpoint first")

    cfg = resolve_config(args)
    if op and op.get("keyframe_rung"):
        s_kf, imp_kf = map(int, op["keyframe_rung"].split("+"))
        cfg = dataclasses.replace(cfg, N_samples=s_kf,
                                  N_importance=imp_kf)
    identity = resolve_dataset(args, cfg, mode="val")

    from idealnerf_tpu.ckpt import CheckpointManager
    from idealnerf_tpu.eval.stream import TemporalStream
    from idealnerf_tpu.train.state import init_train_state

    state = init_train_state(jax.random.PRNGKey(args.seed), cfg,
                             identity.size)
    latents = state.latent_codes
    head_params = state.params
    if args.head_ckpt:
        raw = CheckpointManager(args.head_ckpt).restore_raw()
        head_params = raw["params"]
        latents = jnp.asarray(raw["latent_codes"])
        logger.info("head from %s step %d", args.head_ckpt,
                    int(raw["step"]))
    else:
        logger.warning("no --head_ckpt: serving fresh weights (dry run)")
    torso_params = None
    if args.torso_ckpt:
        from idealnerf_tpu.train.torso import init_torso_params

        like = {"torso_params": init_torso_params(jax.random.PRNGKey(0),
                                                  cfg)}
        torso_params = CheckpointManager(args.torso_ckpt).restore_partial(
            like)[0]["torso_params"]

    if args.aud_file and not args.synthetic:
        auds = np.load(os.path.join(cfg.datadir, cfg.aud_file)).astype(
            np.float32)
    else:
        auds = identity.auds
    n = auds.shape[0] if args.max_frames is None else min(
        args.max_frames, auds.shape[0])

    if args.roll_k and op is not None:
        assert op.get("roll_k") == args.roll_k, (
            "gated config cadence mismatch", op)
    stream = TemporalStream(
        cfg, head_params, identity, torso_params=torso_params,
        latent_codes=latents, operating_point=op, refresh=args.refresh,
        s_delta=args.s_delta, delta_keep=args.delta_keep,
        roll_k=args.roll_k, use_prior=bool(args.prior),
        smooth_audio=not args.no_smooth)
    warmup_s = stream.warmup()
    logger.info("warmup %.1fs; refresh %d, lookahead %d frames",
                warmup_s, stream.refresh,
                stream.algorithmic_latency_frames)

    writer = None
    if args.save_path:
        from idealnerf_tpu.eval.video import VideoWriter

        os.makedirs(args.save_path, exist_ok=True)
        writer = VideoWriter(os.path.join(
            args.save_path, f"{cfg.expname or 'serve'}_stream.avi"))

    emitted = 0
    for i in range(n):
        frame = stream.push(auds[i],
                            expr=identity.exprs[i % identity.size])
        if frame is not None:
            emitted += 1
            if writer is not None:
                writer.add(frame)
    for frame in stream.flush():
        emitted += 1
        if writer is not None:
            writer.add(frame)
    if writer is not None:
        writer.close()
    assert emitted == n

    times = np.asarray(stream.frame_times) * 1000.0
    skip = stream.roll_k if stream.roll_k else stream.refresh
    steady = times[skip:] if len(times) > skip else times
    stats = {
        "frames": int(n),
        "roll_k": stream.roll_k,
        "warmup_s": round(warmup_s, 1),
        "p50_ms": round(float(np.percentile(steady, 50)), 2),
        "p95_ms": round(float(np.percentile(steady, 95)), 2),
        "p99_ms": round(float(np.percentile(steady, 99)), 2),
        "deadline_40ms_hit_rate": round(float((steady <= 40.0).mean()), 4),
        "steady_fps": round(1000.0 / float(steady.mean()), 2),
    }
    logger.info("serve stats: %s", json.dumps(stats))
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
