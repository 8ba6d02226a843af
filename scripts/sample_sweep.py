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

    results = {}
    for s, imp in rungs:
        t0 = time.time()
        m = render_val.main(base + ["--N_samples", str(s),
                                    "--N_importance", str(imp)])
        results[f"{s}+{imp}"] = {
            "psnr": round(m["psnr"], 3), "ssim": round(m["ssim"], 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{s}+{imp}:", results[f"{s}+{imp}"], flush=True)

    ref_key = f"{rungs[0][0]}+{rungs[0][1]}"
    for k in results:
        results[k]["delta_psnr_vs_" + ref_key] = round(
            results[ref_key]["psnr"] - results[k]["psnr"], 3)
    with open(os.path.join(args.out, "sample_sweep.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
