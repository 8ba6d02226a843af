"""Second-stage / cross-identity fine-tune (reference:
NeRFs/HeadNeRF/train/distribute_nerf.py): start from a trained head
checkpoint, render a full face crop per step on the target identity
while conditioning on a driving subject's audio/expressions, and
optimize crop MSE + the landmark aux loss (distribute_nerf.py:455-495;
the VGG terms are instantiated but commented out there — same defaults
here). The reference needs multi-GPU ray sharding for crop 256; the
8-lane-cotangent + checkpointed-tile backward fits it on one chip
(train/second_stage.py).

Released FAN weights are not downloadable in this environment; with
--aux_landmark the loss runs the native FAN architecture at random init
(pipeline/fan.py), which exercises the full differentiable path — swap
in converted weights via --fan_npz when available."""

from __future__ import annotations

import os

import numpy as np

from idealnerf_tpu.cli.common import (
    build_parser, make_summary, resolve_config, resolve_dataset,
)
from idealnerf_tpu.train.second_stage import SecondStageTrainer, make_aux_loss
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--head_ckpt", type=str, default=None,
                        help="trained head checkpoint to fine-tune from")
    parser.add_argument("--driving_aud", type=str, default=None,
                        help="driving subject's aud.npy; default: the "
                             "identity's own audio (self pairing)")
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--aux_landmark", type=float, default=0.0,
                        help="weight of the FAN heatmap landmark loss "
                             "(reference LandmarkLoss, active term)")
    parser.add_argument("--aux_vgg", type=float, default=0.0)
    parser.add_argument("--aux_vggface", type=float, default=0.0)
    parser.add_argument("--fan_npz", type=str, default=None,
                        help="converted FAN weights (tools/convert); "
                             "unset = random init (env has no weights)")
    parser.add_argument("--ray_devices", type=int, default=0,
                        help="shard the crop's ray tiles over this many "
                             "devices (mesh 'ray' axis) — the TPU form "
                             "of the reference's multi-GPU deployment "
                             "of this stage (distribute_nerf.py:457)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)
    identity = resolve_dataset(args, cfg, mode="train")
    run_dir = os.path.join(cfg.basedir, cfg.expname + "_second")
    cfg.write(os.path.join(run_dir, "args.txt"))
    summary = make_summary(cfg, run_dir)

    if args.driving_aud:
        auds = np.load(args.driving_aud).astype(np.float32)
    else:
        auds = identity.auds

    init_params = None
    if args.head_ckpt:
        from idealnerf_tpu.ckpt import CheckpointManager

        raw = CheckpointManager(args.head_ckpt).restore_raw()
        init_params = raw["params"]
        logger.info("fine-tune from %s step %d", args.head_ckpt,
                    int(raw["step"]))

    aux = None
    if args.aux_landmark or args.aux_vgg or args.aux_vggface:
        import jax

        fan_params = None
        if args.aux_landmark:
            from idealnerf_tpu.pipeline.fan import init_fan

            if args.fan_npz:
                fan_params = dict(np.load(args.fan_npz))
            else:
                fan_params = init_fan(jax.random.PRNGKey(1))
                logger.info("aux landmark loss with RANDOM-init FAN "
                            "(released weights env-blocked)")
        vgg16 = vggface = None
        if args.aux_vgg:
            from idealnerf_tpu.losses.vgg import init_vgg16

            vgg16 = init_vgg16(jax.random.PRNGKey(2))
        if args.aux_vggface:
            from idealnerf_tpu.losses.vgg import init_vggface

            vggface = init_vggface(jax.random.PRNGKey(3))
        aux = make_aux_loss(fan_params, vgg16, vggface,
                            w_landmark=args.aux_landmark,
                            w_vgg=args.aux_vgg,
                            w_vggface=args.aux_vggface)

    mesh = None
    if args.ray_devices:
        import jax

        from idealnerf_tpu.parallel import make_mesh

        mesh = make_mesh(n_ray=args.ray_devices,
                         devices=jax.devices()[: args.ray_devices])
        logger.info("ray-sharded second stage over %d devices",
                    args.ray_devices)

    trainer = SecondStageTrainer(
        cfg, identity, auds, init_params=init_params, crop=args.crop,
        seed=args.seed, aux_loss=aux, mesh=mesh,
    )
    logger.info("train_second_stage: %d frames, crop %d, aux=%s",
                identity.size, trainer.crop,
                "on" if aux is not None else "off")

    def on_metrics(step, m):
        summary.scalars(step, m)
        logger.info("[2ND] step %d loss %.5f psnr %.2f aux %.4f",
                    step, m["loss"], m["psnr"], m.get("aux_loss", 0.0))

    trainer.run(args.steps, on_metrics=on_metrics)

    from idealnerf_tpu.ckpt import CheckpointManager

    ckpt_dir = args.ckpt_dir or os.path.join(run_dir, "ckpt")
    CheckpointManager(ckpt_dir).save(
        args.steps,
        {"params": trainer.state.params,
         "latent_codes": trainer.state.latent_codes,
         "step": args.steps},
    )
    summary.close()
    logger.info("done; checkpoint in %s", ckpt_dir)


if __name__ == "__main__":
    main()
