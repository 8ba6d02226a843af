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
    args = build_parser(__doc__).parse_args(argv)
    cfg = resolve_config(args)
    dataset = resolve_dataset(args, cfg, mode="train")
    run_dir = os.path.join(cfg.basedir, cfg.expname)
    cfg.write(os.path.join(run_dir, "args.txt"))
    summary = make_summary(cfg, run_dir)

    ckpt_dir = args.ckpt_dir or os.path.join(run_dir, "ckpt")
    trainer = HeadTrainer(cfg, dataset, seed=args.seed, ckpt_dir=ckpt_dir)
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
