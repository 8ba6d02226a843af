"""Train the torso/composite model against a frozen head checkpoint
(reference: NeRFs/TorsoNeRF/run_nerf.py, train_torso.py). The head comes
from --head_ckpt (a train_head checkpoint dir); com_imgs is the default
image source."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from idealnerf_tpu.cli.common import (
    build_parser, make_summary, resolve_config, resolve_dataset,
)
from idealnerf_tpu.train.state import init_train_state
from idealnerf_tpu.train.torso import TorsoTrainer
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.cli")


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--head_ckpt", type=str, required=False,
                        help="checkpoint dir of the trained head")
    parser.add_argument("--steps", type=int, default=None,
                        help="torso optimization steps")
    parser.add_argument("--smooth_audio", dest="cli_smooth_audio", type=int,
                        default=1)
    parser.add_argument("--data_devices", type=int, default=0,
                        help="multi-chip: frames per step over the "
                             "'data' mesh axis; 0 = single-chip trainer")
    parser.add_argument("--ray_devices", type=int, default=0,
                        help="multi-chip: chips each frame's ray budget "
                             "shards over")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)
    if args.synthetic:
        dataset = resolve_dataset(args, cfg, mode="train", gt_dirs="com_imgs")
    else:
        dataset = resolve_dataset(args, cfg, mode="train", gt_dirs="com_imgs")

    # frozen head: restore from checkpoint (or fresh init for dry runs)
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg, dataset.size)
    if args.head_ckpt:
        from idealnerf_tpu.ckpt import CheckpointManager

        # raw restore: the head is FROZEN here — only params, latents
        # and the step matter; the checkpointed opt_state may carry
        # either flat_optimizer layout and the latent table is sized to
        # the head's train set (same pattern as cli/eval_reenact.py)
        raw = CheckpointManager(args.head_ckpt).restore_raw()
        state = state._replace(
            step=jnp.asarray(raw["step"], jnp.int32),
            params=jax.tree.map(jnp.asarray, raw["params"]),
            latent_codes=jnp.asarray(raw["latent_codes"]))
        logger.info("loaded frozen head from %s (step %d)",
                    args.head_ckpt, int(state.step))
    else:
        logger.warning("no --head_ckpt given: using a fresh head (dry run)")

    run_dir = os.path.join(cfg.basedir, cfg.expname + "_torso")
    cfg.write(os.path.join(run_dir, "args.txt"))
    summary = make_summary(cfg, run_dir)
    ckpt_dir = args.ckpt_dir or os.path.join(run_dir, "ckpt")

    if args.data_devices or args.ray_devices:
        from idealnerf_tpu.parallel import ShardedTorsoTrainer, make_mesh

        devs = jax.devices()
        if args.data_devices and args.ray_devices:
            devs = devs[: args.data_devices * args.ray_devices]
        mesh = make_mesh(n_data=args.data_devices or None,
                         n_ray=args.ray_devices or None, devices=devs)
        logger.info("mesh %s over %d devices",
                    dict(zip(mesh.axis_names, mesh.devices.shape)),
                    mesh.devices.size)
        trainer = ShardedTorsoTrainer(
            cfg, dataset, state.params, mesh,
            latent_codes=state.latent_codes, seed=args.seed,
            smooth_audio=bool(args.cli_smooth_audio), ckpt_dir=ckpt_dir,
        )
    else:
        trainer = TorsoTrainer(
            cfg, dataset, state.params, latent_codes=state.latent_codes,
            seed=args.seed, smooth_audio=bool(args.cli_smooth_audio),
            ckpt_dir=ckpt_dir,
        )

    def on_metrics(step, m):
        summary.scalars(step, m, prefix="torso")
        logger.info("[TORSO] step %d loss %.5f psnr %.2f", step,
                    m["loss"], m["psnr"])

    n_steps = args.steps or cfg.N_iters * dataset.size
    trainer.run(n_steps=n_steps, on_metrics=on_metrics)
    trainer.save()
    summary.close()


if __name__ == "__main__":
    main()
