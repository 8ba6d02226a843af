"""Second-stage convergence rehearsal (round-2 review item #8).

Runs the reference-scale second stage (distribute_nerf.py:433-491:
full face-crop render + landmark aux loss, fine-tuning a trained head)
through the real CLI on the rehearsal subject: crop 256 at 450², the
aux FAN landmark loss ACTIVE in the gradient (random-init FAN — the
released 2DFAN-4 weights are env-blocked; the loss path, not the
pretrained prior, is what this exercises), driving audio from a second
synthetic subject. Reports steps/s and the loss/psnr/aux trajectory to
<out>/second_stage_rehearsal.json for BASELINE.md.

Usage:
  python scripts/rehearsal_2nd.py [--steps 2000] [--crop 256]
      [--aux_landmark 0.001] [--out runs/rehearsal2] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _collect_traj(out_dir, expname):
    """Sampled (step, loss, psnr, aux) rows from the run's metrics.jsonl."""
    import json as _json
    import os as _os

    mfile = None
    for root, _dirs, files in _os.walk(_os.path.join(out_dir, "logs")):
        # run dirs carry a stage suffix (e.g. <expname>_second)
        if "metrics.jsonl" in files and expname in _os.path.basename(root):
            mfile = _os.path.join(root, "metrics.jsonl")
    if not mfile:
        return []
    with open(mfile) as fh:
        traj = [_json.loads(ln) for ln in fh if ln.strip()]
    return [
        {k.split("/")[-1]: t[k]
         for k in ("step", "train/loss", "train/psnr", "train/aux_loss")
         if k in t} for t in traj[:: max(1, len(traj) // 20)]
    ]


def run_ablation(args, base_argv, w_landmark, fan_npz, fan_src,
                 gt_crop, bc_crop):
    """Per-loss second-stage ablation (round-4 verdict #7): identical
    runs except the aux term — MSE-only, +landmark (converged-FAN proxy
    when available), +vgg16 (probe-normalized; the reference wires VGG
    but comments its application out, distribute_nerf.py:483-486).
    Reports each row's final train PSNR over the same steps/seed."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from idealnerf_tpu.cli import train_second_stage
    from idealnerf_tpu.losses.vgg import init_vgg16, make_vgg16_loss

    vraw = float(make_vgg16_loss(init_vgg16(jax.random.PRNGKey(2)))(
        2.0 * gt_crop[None] - 1.0, 2.0 * bc_crop[None] - 1.0))
    w_vgg = args.aux_vgg / max(vraw, 1e-12)
    print(f"vgg16-loss probe (random init): raw={vraw:.3e} -> "
          f"weight={w_vgg:.3e}", flush=True)

    rows = {}
    runs = [("mse", []),
            ("landmark", (["--aux_landmark", str(w_landmark)]
                          + (["--fan_npz", fan_npz] if fan_npz else []))),
            ("vgg", ["--aux_vgg", str(w_vgg)])]
    for tag, extra in runs:
        expname = f"rehearsal_2nd_abl_{tag}"
        t0 = _time.time()
        train_second_stage.main(base_argv + extra + ["--expname", expname])
        wall = _time.time() - t0
        traj = _collect_traj(args.out, expname)
        tail = [t["psnr"] for t in traj[-5:] if "psnr" in t]
        rows[tag] = {
            "final_psnr_mean_tail": (round(sum(tail) / len(tail), 3)
                                     if tail else None),
            "wall_s": round(wall, 1),
            "trajectory": traj,
        }
        print(f"[ablate {tag}] tail PSNR "
              f"{rows[tag]['final_psnr_mean_tail']}", flush=True)

    res = {
        "steps_per_row": args.steps,
        "crop": args.crop,
        "fan": fan_src,
        "aux_landmark_target": args.aux_landmark,
        "aux_vgg_target": args.aux_vgg,
        "w_landmark": w_landmark,
        "w_vgg": w_vgg,
        "rows": rows,
        "psnr_effect_vs_mse": {
            t: (round(rows[t]["final_psnr_mean_tail"]
                      - rows["mse"]["final_psnr_mean_tail"], 3)
                if rows[t]["final_psnr_mean_tail"] is not None
                and rows["mse"]["final_psnr_mean_tail"] is not None
                else None)
            for t in ("landmark", "vgg")},
    }
    out_json = os.path.join(args.out, "second_stage_ablation.json")
    with open(out_json, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps({k: v for k, v in res.items() if k != "rows"}))
    print("wrote", out_json)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(ROOT, "runs", "rehearsal2"))
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--aux_landmark", type=float, default=0.001,
                   help="TARGET aux magnitude in image-loss units: the "
                        "raw landmark loss is probed once on a GT/plate "
                        "crop pair and the CLI weight set to "
                        "aux_landmark/probe. Random-init FAN (the "
                        "released 2DFAN-4 is env-blocked) emits "
                        "arbitrarily-scaled heatmaps — ~1e10 at crop "
                        "256 — so a fixed weight would either vanish or "
                        "destroy training; real converted weights make "
                        "the probe ≈ O(1) and this reduces to the "
                        "reference's fixed weighting "
                        "(distribute_nerf.py:487)")
    p.add_argument("--driving_seed", type=int, default=31)
    p.add_argument("--fan_proxy", type=int, default=1,
                   help="use <out>/fan_proxy.npz (train_fan_proxy.py) "
                        "when present — a FAN trained on this subject's "
                        "known landmarks, so the heatmap loss carries "
                        "signal; 0 = random init (round-3 behavior)")
    p.add_argument("--ablate", action="store_true",
                   help="run the per-loss ablation instead of the single "
                        "canonical rehearsal: mse-only vs +landmark "
                        "(proxy FAN) vs +vgg16, same seed/steps, final "
                        "PSNR per row -> second_stage_ablation.json")
    p.add_argument("--aux_vgg", type=float, default=0.001,
                   help="TARGET aux magnitude for the vgg16 ablation "
                        "row (probe-normalized like the landmark term)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU wiring check")
    args = p.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from idealnerf_tpu.cli import train_second_stage

    from idealnerf_tpu.data.synthetic import make_synthetic_dataset

    head_ckpt = None
    if args.smoke:
        # self-contained wiring check: tiny fresh subject, no checkpoint
        # (the rehearsal head ckpt carries TPU shardings)
        from idealnerf_tpu.data.export import write_reference_format

        args.out = "/tmp/rehearsal_2nd_smoke"
        ds = make_synthetic_dataset(n_frames=6, H=40, W=40, dim_expr=8,
                                    seed=3)
        cfg_path = write_reference_format(ds, args.out, subject="rehearsal")
    else:
        cfg_path = os.path.join(args.out, "HeadNeRF_config.txt")
        head_ckpt = os.path.join(args.out, "logs", "rehearsal_head", "ckpt")
        if not os.path.exists(cfg_path):
            sys.exit(f"no rehearsal subject at {args.out} — run "
                     "scripts/rehearsal.py first")

    # driving audio from a different synthetic subject (cross-identity,
    # like the reference's train/val pairing of two speakers)
    drv = make_synthetic_dataset(
        n_frames=24, H=66, W=66, dim_expr=8, seed=args.driving_seed)
    drv_aud = os.path.join(args.out, "driving_aud_2nd.npy")
    np.save(drv_aud, drv.auds)

    # probe the raw landmark-loss magnitude (same random FAN seed as the
    # CLI builds) on a GT-vs-background crop pair, so the aux term lands
    # at the requested magnitude regardless of the random init's scale
    import jax
    import jax.numpy as jnp

    from idealnerf_tpu.data.dataset import load_transforms_dataset
    from idealnerf_tpu.losses.landmark import make_fan_landmark_loss
    from idealnerf_tpu.pipeline.fan import init_fan

    probe_ds = load_transforms_dataset(args.out, mode="train", max_frames=1)
    crop = min(args.crop if not args.smoke else 24, min(probe_ds.hw))
    img = jnp.asarray(probe_ds.images[0], jnp.float32) / 255.0
    bcp = jnp.asarray(probe_ds.bc_img, jnp.float32) / 255.0
    x0 = int(min(max(probe_ds.face_rects[0][0], 0), probe_ds.hw[1] - crop))
    y0 = int(min(max(probe_ds.face_rects[0][1], 0), probe_ds.hw[0] - crop))
    gt_crop = img[y0:y0 + crop, x0:x0 + crop]
    bc_crop = bcp[y0:y0 + crop, x0:x0 + crop]
    fan_npz = os.path.join(args.out, "fan_proxy.npz")
    if args.fan_proxy and os.path.exists(fan_npz):
        # converged-FAN proxy (scripts/train_fan_proxy.py): the heatmap
        # loss carries real landmark signal for this subject
        fan_params = {k: jnp.asarray(v)
                      for k, v in np.load(fan_npz).items()}
        fan_src = "proxy"
    else:
        fan_params = init_fan(jax.random.PRNGKey(1))
        fan_src = "random"
        fan_npz = None
    lm = make_fan_landmark_loss(fan_params)
    raw = float(lm(gt_crop, bc_crop))
    weight = args.aux_landmark / max(raw, 1e-12)
    print(f"landmark-loss probe ({fan_src} FAN): raw={raw:.3e} -> "
          f"weight={weight:.3e} (target magnitude {args.aux_landmark})")

    base_argv = ["--config", cfg_path,
                 "--crop", str(args.crop), "--steps", str(args.steps),
                 "--driving_aud", drv_aud,
                 "--N_rand", "3072", "--N_samples", "64",
                 "--N_importance", "128", "--dim_aud", "64",
                 "--dim_latent", "32", "--lrate", "3e-4"]
    if head_ckpt:
        base_argv += ["--head_ckpt", head_ckpt]
    if args.smoke:
        base_argv += ["--crop", "24", "--steps", "8", "--dim_expr", "8",
                      "--N_samples", "8", "--N_importance", "8"]

    if args.ablate:
        return run_ablation(args, base_argv, weight, fan_npz, fan_src,
                            gt_crop, bc_crop)

    argv = base_argv + ["--aux_landmark", str(weight),
                        "--expname", "rehearsal_2nd"]
    if fan_npz:
        argv += ["--fan_npz", fan_npz]

    t0 = time.time()
    train_second_stage.main(argv)
    wall = time.time() - t0

    # trajectory from the run's TensorBoard-sibling JSONL
    mfile = None
    for root, _dirs, files in os.walk(os.path.join(
            args.out, "logs")):
        if "metrics.jsonl" in files and "rehearsal_2nd" in root:
            mfile = os.path.join(root, "metrics.jsonl")
    traj = []
    if mfile:
        with open(mfile) as fh:
            traj = [json.loads(ln) for ln in fh if ln.strip()]
    n_steps = args.steps if not args.smoke else 8
    res = {
        "steps": n_steps,
        "crop": args.crop if not args.smoke else 24,
        "fan": fan_src,
        "aux_target_magnitude": args.aux_landmark,
        "aux_probe_raw": raw,
        "aux_weight_used": weight,
        "wall_s": round(wall, 1),
        "steps_per_sec": round(n_steps / wall, 2),
        "trajectory": [
            {k.split("/")[-1]: t[k]
             for k in ("step", "train/loss", "train/psnr", "train/aux_loss")
             if k in t} for t in traj[:: max(1, len(traj) // 20)]
        ] if traj else [],
    }
    out_json = os.path.join(args.out, "second_stage_rehearsal.json")
    with open(out_json, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps({k: v for k, v in res.items() if k != "trajectory"}))
    print("trajectory points:", len(res["trajectory"]), "->", out_json)


if __name__ == "__main__":
    main()
