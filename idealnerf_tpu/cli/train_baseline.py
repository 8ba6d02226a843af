"""Train the AD-NeRF baseline head (reference: baseline.py /
head_baseline.py — audio-only conditioning, random frame order, precrop
warmup)."""

from __future__ import annotations

import os

from idealnerf_tpu.cli.common import (
    build_parser, make_summary, resolve_config, resolve_dataset,
)
from idealnerf_tpu.train.baseline import BaselineTrainer
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
    trainer = BaselineTrainer(cfg, dataset, seed=args.seed, ckpt_dir=ckpt_dir)

    def on_metrics(step, m):
        summary.scalars(step, m)
        logger.info("[BASELINE] step %d loss %.5f psnr %.2f", step,
                    m["loss"], m["psnr"])

    trainer.run(n_epochs=args.epochs, on_metrics=on_metrics)
    trainer.save()
    summary.close()


if __name__ == "__main__":
    main()
