"""Train the head model (reference: audio_exp_nerf.py; also covers the
agg and attention variants via --model_variant)."""

from __future__ import annotations

import os

from idealnerf_tpu.cli.common import (
    build_parser, make_summary, resolve_config, resolve_dataset,
)
from idealnerf_tpu.train.head import HeadTrainer
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--data_devices", type=int, default=0,
                        help="multi-chip: frames per step, sharded over "
                             "the 'data' mesh axis (one frame per chip "
                             "group); 0 = single-chip trainer")
    parser.add_argument("--ray_devices", type=int, default=0,
                        help="multi-chip: chips each frame's ray budget "
                             "shards over (the 'ray' mesh axis)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)
    dataset = resolve_dataset(args, cfg, mode="train")
    run_dir = os.path.join(cfg.basedir, cfg.expname)
    cfg.write(os.path.join(run_dir, "args.txt"))
    summary = make_summary(cfg, run_dir)

    ckpt_dir = args.ckpt_dir or os.path.join(run_dir, "ckpt")
    if args.data_devices or args.ray_devices:
        # ('data', 'ray') GSPMD mesh over the available chips
        # (parallel/trainers.py); the reference's counterpart is
        # DataParallel + the einops ray reshape (distribute_nerf.py:457)
        import jax

        from idealnerf_tpu.parallel import ShardedHeadTrainer, make_mesh

        devs = jax.devices()
        if args.data_devices and args.ray_devices:
            devs = devs[: args.data_devices * args.ray_devices]
        mesh = make_mesh(n_data=args.data_devices or None,
                         n_ray=args.ray_devices or None, devices=devs)
        trainer = ShardedHeadTrainer(cfg, dataset, mesh, seed=args.seed,
                                     ckpt_dir=ckpt_dir)
        logger.info("mesh %s over %d devices",
                    dict(zip(mesh.axis_names, mesh.devices.shape)),
                    mesh.devices.size)
    else:
        trainer = HeadTrainer(cfg, dataset, seed=args.seed,
                              ckpt_dir=ckpt_dir)
    logger.info(
        "train_head: %d frames, variant=%s, N_rand=%d",
        dataset.size, cfg.model_variant, cfg.N_rand,
    )

    def on_metrics(step, m):
        summary.scalars(step, m)
        logger.info("[TRAIN] step %d loss %.5f psnr %.2f lr %.2e",
                    step, m["loss"], m["psnr"], m["lr"])

    trainer.run(n_epochs=args.epochs, on_metrics=on_metrics)
    trainer.save()
    summary.close()
    logger.info("done at step %d; checkpoints in %s", trainer.global_step, ckpt_dir)


if __name__ == "__main__":
    main()
