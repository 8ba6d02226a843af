"""Full-resolution convergence rehearsal (round-1 review item #7).

Generates a disk-format synthetic subject at the reference's 450² paper
scale through the repo's own exporter, trains the head model through the
real CLI at paper config (N_rand 3072, 64+128 samples), then renders the
val split full-fidelity / foreground-pruned / prior-masked on the
converged checkpoint and reports PSNR/SSIM + the pruned-mode quality
deltas. Results land in <out>/results.json for BASELINE.md.

Usage:
  python scripts/rehearsal.py --out runs/rehearsal [--hw 450]
      [--frames 110] [--epochs 140] [--phase all|make|train|eval]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAPER = dict(N_rand=3072, N_samples=64, N_importance=128, dim_aud=64,
             dim_latent=32, mouth_rays=512, torso_rays=512,
             lrate=3e-4, lc_weight=0.005, i_weights=2000, i_print=200)


def phase_make(args):
    from idealnerf_tpu.data.export import write_reference_format
    from idealnerf_tpu.data.synthetic import make_synthetic_dataset

    # --with_torso writes the composite (com_imgs carry a torso) variant
    # of the SAME subject: identical seed/geometry => shared poses/audio
    # with the head-only run, as the torso stage requires (it trains
    # against the frozen head; reference run_nerf.py:499)
    ds = make_synthetic_dataset(
        n_frames=args.frames, H=args.hw, W=args.hw, dim_expr=args.dim_expr,
        seed=args.seed, with_torso=args.with_torso,
        sphere_radius=args.sphere_radius, cam_radius=args.cam_radius,
        motion_scale=args.motion_scale)
    cfg_path = write_reference_format(ds, args.out, subject="rehearsal",
                                      train_fraction=args.train_fraction)
    print("wrote subject:", cfg_path)
    return cfg_path


def phase_train(args):
    from idealnerf_tpu.cli import train_head

    cfg_path = os.path.join(args.out, "HeadNeRF_config.txt")
    argv = ["--config", cfg_path, "--epochs", str(args.epochs)]
    for k, v in PAPER.items():
        argv += [f"--{k}", str(v)]
    t0 = time.time()
    train_head.main(argv)
    print(f"training wall time: {time.time() - t0:.0f}s")


def phase_eval(args):
    from idealnerf_tpu.cli import render_val

    cfg_path = os.path.join(args.out, "HeadNeRF_config.txt")
    ckpt = args.head_ckpt or os.path.join(args.out, "logs",
                                          "rehearsal_head", "ckpt")
    base = ["--config", cfg_path, "--head_ckpt", ckpt,
            "--save_path", os.path.join(args.out, "renders")]
    for k, v in PAPER.items():
        base += [f"--{k}", str(v)]
    results = {}
    # masked keep fractions are a fraction of FRAME rays clamped to the
    # mask (keep_basis="frame", the round-4 fix): masked_40 gets the
    # same absolute fine budget as pruned_40, so masking only removes
    # coarse work. Under the old mask-basis semantics (keep·|mask| —
    # ~19% of frame rays at keep 0.4 on the 47% prior) masked_40
    # measured a 0.378 dB fine-starvation loss while GT == plate
    # outside the mask (the prior itself is lossless).
    all_modes = {
        "full": [],
        "pruned_40": ["--pruned", "40"],
        "pruned_60": ["--pruned", "60"],
        # frame-basis (round-4 default): same absolute fine budget as
        # the unmasked pruned mode
        "masked_40": ["--pruned", "40", "--prior_masked", "1"],
        "masked_60": ["--pruned", "60", "--prior_masked", "1"],
        # pre-round-4 mask-basis point, for the starvation record
        "masked_40_maskbasis": ["--pruned", "40", "--prior_masked", "1",
                                "--keep_basis", "mask"],
        # 28% of frame ~= the old masked_60 fine budget (0.6*47%),
        # which measured 0.002 dB — the candidate fps/quality knee
        "masked_28": ["--pruned", "28", "--prior_masked", "1"],
        # parse-silhouette prior (head_parse): ~31% coverage vs the
        # 47% rect union — cheaper coarse pass at the same fine budget
        "masked_40_hp": ["--pruned", "40", "--prior_masked", "1",
                         "--head_parse", "1"],
        "masked_28_hp": ["--pruned", "28", "--prior_masked", "1",
                         "--head_parse", "1"],
        "masked_40_tight": ["--pruned", "40", "--prior_masked", "1",
                            "--tighten_bounds", "1"],
        # zero-foreground-mass ray cut (round-5): the parse/rect prior
        # additionally intersected with where the TRAINED coarse field
        # carries mass on probe frames (field_occupancy_prior)
        "masked_60_occ": ["--pruned", "60", "--prior_masked", "1",
                          "--occ_prior", "1"],
        "masked_40_occ": ["--pruned", "40", "--prior_masked", "1",
                          "--occ_prior", "1"],
        "masked_28_occ": ["--pruned", "28", "--prior_masked", "1",
                          "--occ_prior", "1"],
    }
    default_modes = ("full,pruned_40,masked_40,masked_28,"
                     "masked_40_hp,masked_28_hp")
    modes = [m for m in (args.eval_modes or default_modes).split(",") if m]
    for name in modes:
        t0 = time.time()
        m = render_val.main(base + all_modes[name])
        results[name] = {"psnr": m["psnr"], "ssim": m["ssim"],
                         "wall_s": round(time.time() - t0, 1)}
        print(name, results[name], flush=True)
    res_path = os.path.join(args.out, "results.json")
    if os.path.exists(res_path):  # merge: keep prior modes' rows
        with open(res_path) as fh:
            results = {**json.load(fh), **results}
    for mode in modes:
        if mode != "full" and "full" in results:
            results[f"delta_psnr_{mode}"] = round(
                results["full"]["psnr"] - results[mode]["psnr"], 3)
    with open(res_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/rehearsal")
    p.add_argument("--hw", type=int, default=450)
    p.add_argument("--frames", type=int, default=110)
    p.add_argument("--dim_expr", type=int, default=79)
    p.add_argument("--epochs", type=int, default=140,
                   help="epochs over the train split (~100 steps each)")
    p.add_argument("--phase", default="all")
    p.add_argument("--seed", type=int, default=7,
                   help="subject seed (7 = the canonical rehearsal "
                        "subject; a different seed + geometry/motion "
                        "knobs makes an independent second subject)")
    p.add_argument("--sphere_radius", type=float, default=0.35)
    p.add_argument("--cam_radius", type=float, default=1.5)
    p.add_argument("--motion_scale", type=float, default=1.0)
    p.add_argument("--train_fraction", type=float, default=10.0 / 11.0,
                   help="train/val split point. 1.0 writes ALL frames "
                        "to the train json — used for held-out DRIVING "
                        "clips (same subject geometry, fresh seed) that "
                        "gate the temporal modes on the reenactment "
                        "workload (eval_aud_exp_nerf.py:435-496 "
                        "semantics: unseen audio/expressions, fixed "
                        "latent)")
    p.add_argument("--head_ckpt", default=None,
                   help="eval phase: checkpoint dir override (default: "
                        "<out>/logs/rehearsal_head/ckpt) — point at the "
                        "current best model so the masked operating "
                        "point is gated on what bench times")
    p.add_argument("--eval_modes", default=None,
                   help="comma list of eval-phase modes (default: full + "
                        "pruned_40 + the round-4 masked budget/prior "
                        "study); see phase_eval's all_modes")
    p.add_argument("--with_torso", action="store_true",
                   help="make phase: write the composite (with-torso) "
                        "variant of the subject (for train_torso runs)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU wiring check (small frames/budgets)")
    args = p.parse_args()
    if args.smoke:
        args.hw, args.frames, args.dim_expr = 66, 12, 8
        args.epochs = min(args.epochs, 3)
        PAPER.update(N_rand=256, mouth_rays=32, torso_rays=32,
                     N_samples=16, N_importance=16, i_weights=20, i_print=10)
    os.makedirs(args.out, exist_ok=True)
    if args.phase in ("all", "make"):
        phase_make(args)
    if args.phase in ("all", "train"):
        phase_train(args)
    if args.phase in ("all", "eval"):
        phase_eval(args)


if __name__ == "__main__":
    main()
