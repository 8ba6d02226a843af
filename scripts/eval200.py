"""Val-render the 200k full-schedule rehearsal head checkpoint.

The reference trains for N_iters=200000 (helper.py:109); the committed
quality evidence describes the 100k checkpoint. This renders the val
split on the 200k checkpoint (full / pruned_60 / masked_60) and writes
runs/rehearsal200.json — the full-schedule quality anchor plus the
pruned-mode deltas re-measured on the sharper model.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idealnerf_tpu.cli import render_val

PAPER = dict(N_rand=3072, N_samples=64, N_importance=128, dim_aud=64,
             dim_latent=32, mouth_rays=512, torso_rays=512,
             lrate="3e-4", lc_weight=0.005, i_weights=2000, i_print=200,
             # the 200k run crosses the scaled AudAttNet switch at 150k
             # (reference: 300k of its full schedule, helper.py:119-122);
             # eval must smooth the audio exactly when training did
             nosmo_iters=150000)


def main():
    base = ["--config", "runs/rehearsal2/HeadNeRF_config.txt",
            "--head_ckpt", "runs/rehearsal2/logs/rehearsal_head200/ckpt",
            "--save_path", "runs/rehearsal2/renders200"]
    for k, v in PAPER.items():
        base += [f"--{k}", str(v)]
    results = {}
    for name, extra in (("full", []), ("pruned_60", ["--pruned", "60"]),
                        ("masked_60", ["--pruned", "60",
                                       "--prior_masked", "1"])):
        t0 = time.time()
        m = render_val.main(base + extra)
        results[name] = {"psnr": m["psnr"], "ssim": m["ssim"],
                         "wall_s": round(time.time() - t0, 1)}
        print(name, results[name], flush=True)
    for mode in ("pruned_60", "masked_60"):
        results[f"delta_psnr_{mode}"] = round(
            results["full"]["psnr"] - results[mode]["psnr"], 3)
    with open("runs/rehearsal200.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
