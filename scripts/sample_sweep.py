"""Eval sample-count sweep on a converged checkpoint.

The reference evaluates at 64 coarse + 192 importance samples per ray
(helper.py:66-69) — tuned for generic scenes. A talking head is a single
surface in a shallow depth range ([near,far] spans ~0.6 units), and the
hierarchical CDF concentrates fine samples on it, so far fewer samples
may hold quality. Every eval mode's cost is linear in the per-ray sample
count, making this the largest single fps lever left (the kernel is at
77% of its measured platform ceiling — ROADMAP.md).

Renders the val split at a ladder of (N_samples, N_importance) on the
trained checkpoint and reports PSNR/SSIM vs GT per rung ->
<out>/sample_sweep.json for BASELINE.md.

Usage: python scripts/sample_sweep.py [--out runs/rehearsal2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAPER = dict(N_rand=3072, dim_aud=64, dim_latent=32,
             mouth_rays=512, torso_rays=512)

LADDER = [(64, 192), (64, 128), (48, 96), (32, 64), (24, 48), (16, 32)]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(ROOT, "runs", "rehearsal2"))
    p.add_argument("--rungs", type=str, default=None,
                   help="comma list like 64+192,32+64 (default: ladder)")
    p.add_argument("--tighten", action="store_true",
                   help="also sweep with per-subject tightened near/far "
                        "(eval.renderer.subject_depth_range): higher "
                        "sample density at the same count")
    args = p.parse_args()

    from idealnerf_tpu.cli import render_val

    cfg_path = os.path.join(args.out, "HeadNeRF_config.txt")
    ckpt = os.path.join(args.out, "logs", "rehearsal_head", "ckpt")
    base = ["--config", cfg_path, "--head_ckpt", ckpt,
            "--save_path", os.path.join(args.out, "renders_sweep")]
    for k, v in PAPER.items():
        base += [f"--{k}", str(v)]

    rungs = LADDER
    if args.rungs:
        rungs = [tuple(int(x) for x in r.split("+"))
                 for r in args.rungs.split(",")]

    tight = None
    if args.tighten:
        import jax
        import jax.numpy as jnp

        from idealnerf_tpu.ckpt import CheckpointManager
        from idealnerf_tpu.config import ExperimentConfig
        from idealnerf_tpu.data.dataset import load_transforms_dataset
        from idealnerf_tpu.eval.renderer import (
            cached_depth_band, subject_depth_range,
        )

        cfg = ExperimentConfig.from_file(cfg_path, **PAPER)
        ds = load_transforms_dataset(cfg.datadir, mode="train",
                                     near=cfg.near, far=cfg.far)
        raw = CheckpointManager(ckpt).restore_raw()
        cd = (jnp.bfloat16 if jax.default_backend() == "tpu" else None)
        tight = cached_depth_band(
            ckpt, "head", raw["step"],
            lambda: subject_depth_range(
                cfg, raw["params"], jnp.asarray(raw["latent_codes"]), ds,
                compute_dtype=cd))
        print(f"tightened bounds: [{tight[0]:.4f}, {tight[1]:.4f}] "
              f"(config: [{cfg.near:.4f}, {cfg.far:.4f}])", flush=True)

    results = {}
    variants = [("", [])]
    if tight is not None:
        variants.append(("_tight", ["--near", str(tight[0]),
                                    "--far", str(tight[1])]))
    for s, imp in rungs:
        for suffix, extra in variants:
            t0 = time.time()
            m = render_val.main(base + extra +
                                ["--N_samples", str(s),
                                 "--N_importance", str(imp)])
            results[f"{s}+{imp}{suffix}"] = {
                "psnr": round(m["psnr"], 3), "ssim": round(m["ssim"], 4),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{s}+{imp}{suffix}:", results[f"{s}+{imp}{suffix}"],
                  flush=True)

    # merge into any existing sweep file (a --rungs subset run must not
    # wipe previously measured rungs); deltas are recomputed against
    # this run's reference rung for every entry that has a PSNR
    dest = os.path.join(args.out, "sample_sweep.json")
    if os.path.exists(dest):
        with open(dest) as fh:
            old = json.load(fh)
        old.update(results)
        results = old
    # deltas are ALWAYS anchored at the paper schedule when present
    # (bench.pick_quality_matched_rung reads delta_psnr_vs_64+192) —
    # anchoring at this run's first rung would leave a subset run's
    # entries invisible to the rung selection
    ref_key = "64+192" if "64+192" in results else (
        f"{rungs[0][0]}+{rungs[0][1]}")
    if ref_key in results:
        for k in results:
            results[k]["delta_psnr_vs_" + ref_key] = round(
                results[ref_key]["psnr"] - results[k]["psnr"], 3)
    with open(dest, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
