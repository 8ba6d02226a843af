"""Convergence equivalence of the approx ray sampler (config
sampler_approx: lax.approx_max_k instead of exact top_k in
data.sampler). The profile (runs/train_profile.json) shows it saves
~10 ms/step (19.7 -> 24.5 steps/s at paper config) because the exact
top-k serializes against the optimizer chain; the property test
(tests/test_data_and_train.py) shows region budgets hold. This measures
what neither can off-chip: that TRAINING CONVERGES the same, on the TPU
where approx_max_k actually takes its approximate path (CPU falls back
to exact).

Trains the same synthetic 450-resolution subject twice from the same
seed at paper config, exact vs approx, and reports the PSNR trajectory
plus final train PSNR of both. Writes runs/sampler_equiv.json.

Usage: python scripts/sampler_equiv.py [--steps 2000] [--smoke]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data import make_synthetic_dataset
    from idealnerf_tpu.train import HeadTrainer

    paper = dict(N_rand=3072, N_samples=64, N_importance=128, dim_aud=64,
                 dim_expr=79, dim_latent=32, mouth_rays=512,
                 torso_rays=512, lrate=5e-4, nosmo_iters=10**9)
    hw, frames, steps = 450, 8, args.steps
    if args.smoke:
        paper.update(N_rand=128, N_samples=8, N_importance=8, dim_expr=8,
                     mouth_rays=16, torso_rays=16)
        hw, frames, steps = 48, 3, 40

    ds = make_synthetic_dataset(n_frames=frames, H=hw, W=hw,
                                dim_expr=paper["dim_expr"])
    out = {"steps": steps, "hw": hw,
           "backend": jax.devices()[0].platform, "runs": {}}
    for name, approx in (("exact", False), ("approx", True)):
        cfg = ExperimentConfig(**paper, sampler_approx=approx)
        tr = HeadTrainer(cfg, ds, seed=0)
        traj = []
        t0 = time.time()
        # one "epoch" here is the trainer's internal frame cycle; drive
        # by epochs sized to land on the requested step count
        steps_per_epoch = frames
        n_epochs = max(1, steps // steps_per_epoch)
        tr.run(n_epochs=n_epochs, log_every=max(steps // 10, 1),
               on_metrics=lambda s, m: traj.append(
                   (int(s), round(float(m.get("psnr", 0.0)), 3))))
        out["runs"][name] = {
            "final_step": int(tr.state.step),
            "trajectory": traj[-10:],
            "final_psnr": traj[-1][1] if traj else None,
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, out["runs"][name], flush=True)

    ex, ap = out["runs"]["exact"], out["runs"]["approx"]
    if ex["final_psnr"] and ap["final_psnr"]:
        out["final_psnr_delta"] = round(ap["final_psnr"] - ex["final_psnr"], 3)
    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "runs", "sampler_equiv.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
