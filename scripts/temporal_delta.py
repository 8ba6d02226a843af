"""Temporal depth-cache composite quality delta on the rehearsal models.

Renders a val-split head+torso clip (sequential frames, as the video
eval does) three ways — full fidelity, and the temporal mode at a couple
of (refresh, s_delta) operating points — and reports PSNR(temporal vs
full), PSNR of each vs GT com_imgs, and warm fps. This is the measured
quality cost of keyframe+delta rendering on converged fields (reference
renders every frame from scratch: test_torso.py:513-534).

Usage: python scripts/temporal_delta.py [--frames 24] [--refresh 25]
           [--s_delta 32 16] [--tighten]
Writes runs/rehearsal2_com/temporal_delta.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COM = os.path.join(ROOT, "runs", "rehearsal2_com")
HEAD_CKPT = os.path.join(ROOT, "runs", "rehearsal2", "logs",
                         "rehearsal_head", "ckpt")
TORSO_CKPT = os.path.join(COM, "logs", "rehearsal_head_torso", "ckpt")


def psnr(a, b):
    import numpy as np

    return float(-10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--refresh", type=int, default=25)
    p.add_argument("--s_delta", type=int, nargs="+", default=[32, 16])
    p.add_argument("--out", default=None,
                   help="output json path (default: "
                        "runs/rehearsal2_com/temporal_delta.json — the "
                        "canonical evidence file bench.py gates on; pass "
                        "a different path for side studies, e.g. other "
                        "refresh intervals)")
    p.add_argument("--samples", type=int, default=None,
                   help="keyframe N_samples override (temporal modes "
                        "only; the full reference render stays at the "
                        "config schedule so the reported delta prices "
                        "both levers together)")
    p.add_argument("--importance", type=int, default=None,
                   help="keyframe N_importance override")
    p.add_argument("--s_delta_torso", type=int, default=None,
                   help="torso-field delta samples (composite modes "
                        "only; default: same as each --s_delta value). "
                        "Suffixes the composite mode keys with "
                        "'t<val>': s_delta_16t32")
    p.add_argument("--delta_keep", type=float, default=1.0,
                   help="fraction of prior rays re-rendered on delta "
                        "frames (keyframe's top foreground-mass set; "
                        "the rest hold the keyframe's pixels). <1 "
                        "suffixes the mode keys with 'k<pct>' so the "
                        "evidence stays distinct from unpruned runs")
    p.add_argument("--delta_keep_torso", type=float, default=None,
                   help="torso-field delta keep fraction (composite "
                        "modes only; default: same as --delta_keep). "
                        "The torso casts rays from the FIXED first "
                        "frame pose (run_nerf.py:499), so its frozen "
                        "rays are exact up to conditioning drift and "
                        "it tolerates a lower keep than the moving "
                        "head. Suffixes the composite mode keys with "
                        "'kt<pct>'")
    p.add_argument("--freeze_z_torso", action="store_true",
                   help="torso delta frames re-evaluate the network at "
                        "the KEYFRAME's exact depth grid (static torso "
                        "rays keep the keyframe quadrature valid all "
                        "cycle — removes in-band sampling bias and "
                        "out-of-band transmittance loss at the cost of "
                        "the keyframe grid width per kept ray). "
                        "Suffixes the composite mode keys with 'fz'")
    p.add_argument("--roll_k", type=int, default=0,
                   help="BOTH-FIELD rolling keyframe refresh (the "
                        "cli/serve spike-free cadence): no keyframes "
                        "after frame 0; every frame pays delta + 1/K of "
                        "a keyframe per field. Gates the serving "
                        "configuration vs GT over >=2 comb cycles. "
                        "Suffixes mode keys with 'roll<K>'")
    p.add_argument("--roll_k_torso", type=int, default=0,
                   help="torso REFRESH-ONLY rolling (composite modes "
                        "only): every frame re-renders 1/K of the torso "
                        "rays at the full keyframe schedule, bounding "
                        "each torso ray's conditioning age to K frames; "
                        "no torso delta pass (--delta_keep_torso / "
                        "--freeze_z_torso are ignored). Suffixes the "
                        "composite mode keys with 'rt<K>'")
    p.add_argument("--dilate_every", type=int, default=1,
                   help="run the spatial band dilation only on every "
                        "k-th delta frame (invalid rays carry their "
                        "previous band in between) — thins the "
                        "per-delta-frame fixed work. >1 suffixes mode "
                        "keys with 'd<k>'")
    p.add_argument("--uni_frac", type=float, default=0.25,
                   help="fraction of delta in-band samples placed "
                        "uniformly across the cached band (exploration "
                        "vs importance). Non-default suffixes mode keys "
                        "with 'u<pct>'")
    p.add_argument("--kf_blend", type=float, default=0.0,
                   help="fraction of delta importance samples drawn "
                        "from the KEYFRAME's full-res CDF instead of "
                        "the previous frame's (anchors the temporal "
                        "importance prior against drift). >0 suffixes "
                        "mode keys with 'b<pct>'")
    p.add_argument("--head_parse", action="store_true",
                   help="tighten the per-field priors from face-rect "
                        "boxes to parse silhouettes (foreground_prior"
                        "_fields head_parse — round-4 fewer-point-evals "
                        "lever). Suffixes mode keys with 'hp'")
    p.add_argument("--auto_rung", action="store_true",
                   help="pick the keyframe rung from runs/rehearsal2/"
                        "sample_sweep.json (cheapest rung within 0.05 dB "
                        "of the paper schedule, bench."
                        "pick_quality_matched_rung)")
    p.add_argument("--tighten", action="store_true",
                   help="temporal modes additionally start from each "
                        "field's own depth band (subject_depth_range + "
                        "torso_depth_range) for keyframes/fallbacks")
    p.add_argument("--split", default="val", choices=("val", "train"),
                   help="GT split to render/compare against. The val "
                        "split is ~10 frames, which silently clamps "
                        "--frames — any refresh > 10 then never renders "
                        "a second keyframe and long-interval drift goes "
                        "unmeasured. Use train (~100 frames) for drift "
                        "studies spanning whole keyframe cycles")
    p.add_argument("--head_ckpt", default=HEAD_CKPT,
                   help="head checkpoint dir (default: the rehearsal2 "
                        "100k head). Override to measure the gate on "
                        "another checkpoint (e.g. the 200k full-schedule "
                        "head) WITHOUT touching the default evidence — "
                        "write such runs to a different --out dir so "
                        "bench's gated selection stays consistent with "
                        "the checkpoints it times")
    p.add_argument("--torso_ckpt", default=TORSO_CKPT,
                   help="torso checkpoint dir (see --head_ckpt)")
    p.add_argument("--smooth_audio", type=int, default=0,
                   help="drive with AudAttNet-smoothed audio features — "
                        "set to 1 when the checkpoint trained past its "
                        "nosmo_iters switch (e.g. the 200k head)")
    p.add_argument("--subject_dir", default=COM,
                   help="subject run directory holding "
                        "HeadNeRF_config.txt + the with-torso data "
                        "(default: the canonical rehearsal2_com). For a "
                        "second subject pass its dir plus matching "
                        "--head_ckpt/--torso_ckpt/--out")
    args = p.parse_args()
    head_ckpt, torso_ckpt = args.head_ckpt, args.torso_ckpt

    import jax
    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.ckpt import CheckpointManager
    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data.dataset import load_transforms_dataset
    from idealnerf_tpu.eval.reenact import reenact
    from idealnerf_tpu.train.state import init_train_state
    from idealnerf_tpu.train.torso import init_torso_params

    cfg = ExperimentConfig.from_file(
        os.path.join(args.subject_dir, "HeadNeRF_config.txt"))
    identity = load_transforms_dataset(cfg.datadir, mode=args.split,
                                       near=cfg.near, far=cfg.far,
                                       gt_dirs="com_imgs")
    if args.frames > identity.size:
        print(f"NOTE: --frames {args.frames} clamped to the {args.split} "
              f"split's {identity.size} frames", flush=True)

    import dataclasses

    kf_s, kf_imp = cfg.N_samples, cfg.N_importance
    if args.auto_rung:
        sweep_path = os.path.join(ROOT, "runs", "rehearsal2",
                                  "sample_sweep.json")
        if os.path.exists(sweep_path):
            from bench import pick_quality_matched_rung

            with open(sweep_path) as fh:
                best = pick_quality_matched_rung(json.load(fh))
            if best:
                kf_s, kf_imp = best[0], best[1]
                print(f"auto keyframe rung {best[2]} "
                      f"(sweep delta {best[3]} dB)", flush=True)
    if args.samples:
        kf_s = args.samples
    if args.importance is not None:
        kf_imp = args.importance
    # keyframes (and band estimation) at the reduced rung; the reference
    # "full" render stays at the config schedule
    cfg_kf = dataclasses.replace(cfg, N_samples=kf_s, N_importance=kf_imp)

    state = init_train_state(jax.random.PRNGKey(0), cfg, identity.size)
    raw = CheckpointManager(head_ckpt).restore_raw()
    head_params = raw["params"]
    latents = jnp.asarray(raw["latent_codes"])
    like = {"torso_params": init_torso_params(jax.random.PRNGKey(0), cfg)}
    torso_params = CheckpointManager(torso_ckpt).restore_partial(like)[0][
        "torso_params"]
    print(f"head step {int(raw['step'])}, torso restored", flush=True)

    n = min(args.frames, identity.size)
    auds = identity.auds[:n]
    exprs = identity.exprs[:n] if cfg.dim_expr else None
    common = dict(
        driving_auds=auds, driving_exprs=exprs, latent_codes=latents,
        torso_params=torso_params, max_frames=n,
        smooth_audio=bool(args.smooth_audio),
    )

    bounds = None
    if args.tighten:
        from idealnerf_tpu.eval.renderer import (
            cached_depth_band, subject_depth_range, torso_depth_range,
        )

        ds_train = load_transforms_dataset(cfg.datadir, mode="train",
                                           near=cfg.near, far=cfg.far)
        bh = cached_depth_band(
            head_ckpt, "head", raw["step"],
            lambda: subject_depth_range(cfg, head_params, latents,
                                        ds_train))
        bt = cached_depth_band(
            torso_ckpt, "torso", CheckpointManager(torso_ckpt).latest_step(),
            lambda: torso_depth_range(cfg, torso_params, head_params,
                                      ds_train))
        bounds = dict(head=bh, torso=bt)
        print(f"tightened: head [{bh[0]:.4f},{bh[1]:.4f}] torso "
              f"[{bt[0]:.4f},{bt[1]:.4f}]", flush=True)

    # steady-state fps from per-frame wall times WITHIN one call (the
    # jitted renderers are closures built inside reenact — a second
    # reenact() call recompiles, so rerun-based "warm" timings measured
    # compile time and doubled the script's wall clock)
    def timed(render_cfg, **kw):
        ft: list = []
        frames_out = reenact(render_cfg, head_params, identity,
                             frame_times=ft, **kw)
        warm = (sum(ft[1:]) / (len(ft) - 1)) if len(ft) > 1 else ft[0]
        return frames_out, warm, ft

    def temporal_fps(ft, refresh):
        """Amortized steady-state fps for keyframe+delta rendering.

        Delta cost from warm delta frames; keyframe cost from a warm
        keyframe when the clip contains one (i%refresh==0, i>0). When it
        doesn't (frames <= refresh), the amortized fps is reported as
        None rather than approximated — the old fallback used the warm
        full render at the CONFIG schedule, which overstates a reduced
        keyframe rung's cost 4-8x and deflated the published number.
        Authoritative timing lives in bench.py anyway; pick --frames >
        --refresh to get a measured keyframe here."""
        deltas = [t for i, t in enumerate(ft) if i % refresh and i > 0]
        keys = [t for i, t in enumerate(ft) if i % refresh == 0 and i > 0]
        t_delta = sum(deltas) / max(len(deltas), 1)
        if keys:
            t_key = sum(keys) / len(keys)
            amortized = (t_key + (refresh - 1) * t_delta) / refresh
            fps_am = round(1.0 / amortized, 3)
        else:
            fps_am = None
        return (fps_am, round(1.0 / t_delta, 3), bool(keys))

    dest = args.out or os.path.join(args.subject_dir,
                                    "temporal_delta.json")

    def _write(out):
        # incremental write after EVERY measured mode: a timeout mid-run
        # keeps the rows already measured (a 40-min tunnel stall once
        # cost a whole run's evidence)
        with open(dest, "w") as f:
            json.dump(out, f, indent=2)

    full, t_full_warm, _ = timed(cfg, **common)

    gt = identity.images[:n].astype(np.float32) / 255.0
    out = {
        "frames": n,
        "split": args.split,
        # which clip the GT came from: a *_drive dir = the held-out
        # driving clip (reenactment workload); the subject's own dir =
        # the train/val split record
        "subject_dir": os.path.relpath(args.subject_dir, ROOT),
        "refresh": args.refresh,
        "keyframe_rung": f"{kf_s}+{kf_imp}",
        "head_ckpt": os.path.relpath(head_ckpt, ROOT),
        "head_step": int(raw["step"]),
        "torso_ckpt": os.path.relpath(torso_ckpt, ROOT),
        "tightened_bounds": (
            {k: [float(v[0]), float(v[1])] for k, v in bounds.items()}
            if bounds else None),
        "psnr_full_vs_gt": psnr(full, gt),
        "fps_full_warm": round(1.0 / t_full_warm, 3),
        "modes": {},
    }
    # mode-key grammar: "<s>[t<st>][_k<pct>][_kt<pct>][_u<pct>][_b<pct>]";
    # the torso tags (t, kt) are composite-only and must not leak into
    # the head-only keys
    k_tag = ("" if args.delta_keep >= 1.0
             else f"_k{round(args.delta_keep * 100)}")
    kt_tag = ("" if args.delta_keep_torso is None
              else f"_kt{round(args.delta_keep_torso * 100)}")
    u_tag = ("" if args.uni_frac == 0.25
             else f"_u{round(args.uni_frac * 100)}")
    b_tag = ("" if args.kf_blend <= 0
             else f"_b{round(args.kf_blend * 100)}")
    fz_tag = "_fz" if args.freeze_z_torso else ""
    d_tag = (f"_d{args.dilate_every}" if args.dilate_every > 1 else "")
    rt_tag = (f"_rt{args.roll_k_torso}" if args.roll_k_torso > 1 else "")
    roll_tag = (f"_roll{args.roll_k}" if args.roll_k > 1 else "")
    hp_tag = "_hp" if args.head_parse else ""
    ksuf = k_tag + u_tag + b_tag + d_tag + roll_tag + hp_tag
    ksuf_comp = (k_tag + kt_tag + u_tag + b_tag + d_tag + roll_tag
                 + rt_tag + fz_tag + hp_tag)
    tsuf = (f"t{args.s_delta_torso}" if args.s_delta_torso else "")
    place = dict(uni_frac=args.uni_frac, kf_blend=args.kf_blend,
                 dilate_every=args.dilate_every,
                 head_parse=args.head_parse)
    for s_delta in args.s_delta:
        kw = dict(temporal=args.refresh, s_delta=s_delta, use_prior=True,
                  bounds=bounds, delta_keep=args.delta_keep,
                  delta_keep_torso=args.delta_keep_torso,
                  freeze_z_torso=args.freeze_z_torso,
                  s_delta_torso=args.s_delta_torso, roll_k=args.roll_k,
                  roll_k_torso=args.roll_k_torso, **place, **common)
        tm, _, ft = timed(cfg_kf, **kw)
        fps_am, fps_delta, measured_key = temporal_fps(ft, args.refresh)
        m = {
            "psnr_temporal_vs_full": psnr(tm, full),
            "psnr_temporal_vs_gt": psnr(tm, gt),
            "delta_psnr_vs_gt": round(
                out["psnr_full_vs_gt"] - psnr(tm, gt), 3),
            "fps_temporal_warm": fps_am,
            "fps_delta_frames": fps_delta,
            "keyframe_cost_measured": measured_key,
        }
        out["modes"][f"s_delta_{s_delta}{tsuf}{ksuf_comp}"] = m
        print(f"s_delta={s_delta}{tsuf}{ksuf_comp}: {json.dumps(m)}",
              flush=True)
        _write(out)

    # head-only temporal (eval_aud_exp_nerf.py:437 workload) vs the full
    # head-only render AND vs head_imgs GT (round-4: the ≥40 dB
    # agreement gate alone is self-referential — head_imgs are the
    # head-over-plate ground truth the offline pipeline produces, the
    # exact thing a head-only render reconstructs)
    gt_h = None
    try:
        identity_h = load_transforms_dataset(cfg.datadir, mode=args.split,
                                             near=cfg.near, far=cfg.far,
                                             gt_dirs="head_imgs")
        gt_h = identity_h.images[:n].astype(np.float32) / 255.0
    except Exception as e:
        print(f"NOTE: no head_imgs GT ({e}); head gate stays "
              "agreement-only", flush=True)
    common_h = {k: v for k, v in common.items() if k != "torso_params"}
    full_h, t_full_warm, _ = timed(cfg, **common_h)  # rebinds keyframe proxy
    out["fps_head_full_warm"] = round(1.0 / t_full_warm, 3)
    if gt_h is not None:
        out["psnr_head_full_vs_gt"] = psnr(full_h, gt_h)
    for s_delta in args.s_delta:
        kw = dict(temporal=args.refresh, s_delta=s_delta, use_prior=True,
                  bounds=bounds["head"] if bounds else None,
                  delta_keep=args.delta_keep, roll_k=args.roll_k,
                  **place, **common_h)
        tm, _, ft = timed(cfg_kf, **kw)
        fps_am, fps_delta, measured_key = temporal_fps(ft, args.refresh)
        m = {
            "psnr_temporal_vs_full": psnr(tm, full_h),
            "fps_temporal_warm": fps_am,
            "fps_delta_frames": fps_delta,
            "keyframe_cost_measured": measured_key,
        }
        if gt_h is not None:
            m["psnr_temporal_vs_gt"] = psnr(tm, gt_h)
            m["delta_psnr_vs_gt"] = round(
                out["psnr_head_full_vs_gt"] - m["psnr_temporal_vs_gt"], 3)
        out["modes"][f"head_only_s_delta_{s_delta}{ksuf}"] = m
        print(f"head-only s_delta={s_delta}{ksuf}: {json.dumps(m)}",
              flush=True)
        _write(out)

    print(json.dumps(out, indent=2))
    _write(out)


if __name__ == "__main__":
    main()
