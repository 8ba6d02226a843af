"""Quality cost of an int8-quantized trunk, measured on a checkpoint.

Renders a random ray subset of val frames three ways and scores each
against ground truth:

  exact   f32 XLA path (the quality ceiling)
  quant   int8 trunk on BOTH passes (kernels/quant.py; the simulation is
          bit-exact to the int8 MXU — see its module docstring)
  hybrid  int8 COARSE pass + exact fine pass: the coarse pass only
          places fine samples, so its quantization error moves sample
          positions, not colors — candidate for a near-free ~45% cut of
          head point-evals (ROADMAP: coarse 16 on all prior rays vs
          fine 48 on 40%).

Decision input for the int8 Pallas kernel (goes with scripts/kdiag5.py's
speed half): pursue full-int8 only if quant stays within the composite
gate's budget; hybrid is the fallback.

CPU-runnable (no TPU needed): PYTHONPATH=. python scripts/quant_study.py
  --head_ckpt /tmp/ckpt_q --out runs/rehearsal2 --rays 4096 --frames 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(ROOT, "runs", "rehearsal2"))
    p.add_argument("--head_ckpt", default=None)
    p.add_argument("--rays", type=int, default=4096)
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--calib_pts", type=int, default=16384)
    p.add_argument("--pct", type=float, default=99.9)
    p.add_argument("--fg_only", action="store_true",
                   help="sample rays only where GT departs from the "
                        "background plate (subject pixels) — uniform "
                        "sampling dilutes the delta with bc-dominated "
                        "background rays")
    p.add_argument("--save", default=None, help="output json path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from idealnerf_tpu.cli.common import build_parser, resolve_config, \
        resolve_dataset
    from idealnerf_tpu.core.rays import get_rays
    from idealnerf_tpu.core.render import render_rays
    from idealnerf_tpu.kernels.quant import (
        calibrate, make_quant_field_fn, quantize_trunk,
    )
    from idealnerf_tpu.models.face_nerf import (
        fold_conditioning, make_field_fn, positional_encoding,
    )
    from idealnerf_tpu.models.variants import (
        variant_conditioning, variant_nerf_config,
    )
    from idealnerf_tpu.train.head import compute_aud_feature
    from idealnerf_tpu.train.state import init_train_state
    from idealnerf_tpu.ckpt import CheckpointManager

    cfg_path = os.path.join(args.out, "HeadNeRF_config.txt")
    cli = build_parser("quant study")
    cargs = cli.parse_args(["--config", cfg_path])
    cfg = resolve_config(cargs)
    ds = resolve_dataset(cargs, cfg, mode="val")
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    ckpt = args.head_ckpt or os.path.join(
        args.out, "logs", "rehearsal_head", "ckpt")
    raw = CheckpointManager(ckpt).restore_raw()
    params = raw["params"]
    latents = jnp.asarray(raw["latent_codes"])
    step = int(raw["step"])
    print(f"checkpoint step {step}", flush=True)

    head_cfg = variant_nerf_config(cfg)
    rcfg = cfg.render_config().eval_mode()
    data = ds.to_device()
    bc = data["bc_img"].astype(jnp.float32) / 255.0
    H, W = ds.hw
    smooth = cfg.dim_aud > 29 and step >= cfg.nosmo_iters

    # --- calibration: trunk input ranges from frame-0 sample points ---
    def frame_cond(i):
        aud = compute_aud_feature(
            state.params, data["auds"], data["aud_ids"], i, cfg, smooth)
        expr = data["exprs"][i] if cfg.dim_expr > 0 else None
        aud_arg, expr_arg = variant_conditioning(params, cfg, aud, expr)
        latent = latents[0] if cfg.dim_latent > 0 else None
        return dict(aud=aud_arg, expr=expr_arg, latent=latent)

    rng = np.random.default_rng(0)
    cond0 = frame_cond(0)
    ro, rd = get_rays(H, W, ds.focal, data["poses"][0][:3, :4],
                      cx=ds.cx, cy=ds.cy)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    n_cal_rays = max(64, args.calib_pts // rcfg.n_samples)
    sel = rng.choice(H * W, size=n_cal_rays, replace=False)
    t = np.linspace(ds.near, ds.far, rcfg.n_samples, dtype=np.float32)
    pts = (np.asarray(ro[sel])[:, None, :]
           + np.asarray(rd[sel])[:, None, :] * t[None, :, None])
    pe_cal = positional_encoding(
        jnp.asarray(pts.reshape(-1, 3)), head_cfg.multires)
    specs, qparams = {}, {}
    for field in ("coarse", "fine"):
        folded0 = fold_conditioning(params[field], head_cfg, **cond0)
        specs[field] = calibrate(
            params[field], head_cfg, folded0, pe_cal, pct=args.pct)
        qparams[field] = quantize_trunk(
            params[field], head_cfg, specs[field])
        print(f"calibrated {field}: s_pe={specs[field].s_pe:.4g} "
              f"s_h={['%.3g' % s for s in specs[field].s_h]}", flush=True)

    # --- per-frame ray-subset renders ---
    def render_subset(fns, sel, pose):
        ro, rd = get_rays(H, W, ds.focal, pose[:3, :4], cx=ds.cx, cy=ds.cy)
        ro = ro.reshape(-1, 3)[sel]
        rd = rd.reshape(-1, 3)[sel]
        bc_sel = bc.reshape(-1, 3)[sel]
        outs = {}
        outs["exact"] = render_rays(
            fns["coarse"], ro, rd, bc_sel, ds.near, ds.far, rcfg,
            fine_fn=fns["fine"])["rgb_map"]
        outs["quant"] = render_rays(
            fns["coarse_q"], ro, rd, bc_sel, ds.near, ds.far, rcfg,
            fine_fn=fns["fine_q"])["rgb_map"]
        outs["hybrid"] = render_rays(
            fns["coarse_q"], ro, rd, bc_sel, ds.near, ds.far, rcfg,
            fine_fn=fns["fine"])["rgb_map"]
        return outs

    def mse2psnr(m):
        return float(-10.0 * np.log10(max(m, 1e-12)))

    sums = {k: 0.0 for k in ("exact", "quant", "hybrid")}
    dsum = {k: 0.0 for k in ("quant", "hybrid")}
    n_total = 0
    for i in range(min(args.frames, ds.size)):
        cond = frame_cond(i)
        fns = {}
        for field in ("coarse", "fine"):
            fns[field] = make_field_fn(params[field], head_cfg, **cond)
            fns[field + "_q"] = make_quant_field_fn(
                params[field], head_cfg, specs[field],
                qparams=qparams[field], **cond)
        gt_full = np.asarray(
            data["images"][i]).reshape(-1, 3).astype(np.float32) / 255.0
        if args.fg_only:
            fg = np.abs(gt_full - np.asarray(bc).reshape(-1, 3)).max(-1) > 0.05
            pool = np.flatnonzero(fg)
        else:
            pool = np.arange(H * W)
        sel = rng.choice(pool, size=min(args.rays, pool.size), replace=False)
        gt = gt_full[sel]
        outs = render_subset(fns, jnp.asarray(sel),
                             data["poses"][i])
        n_total += sel.size
        for k, v in outs.items():
            v = np.asarray(v, np.float64)
            sums[k] += float(((np.clip(v, 0, 1) - gt) ** 2).sum())
            if k != "exact":
                ve = np.asarray(outs["exact"], np.float64)
                dsum[k] += float(((v - ve) ** 2).sum())
        print(f"frame {i}: " + " ".join(
            f"{k}={mse2psnr(((np.clip(np.asarray(v, np.float64), 0, 1) - gt) ** 2).mean()):.2f}"
            for k, v in outs.items()), flush=True)

    res = {
        "step": step, "rays": n_total, "pct": args.pct,
        "psnr": {k: mse2psnr(s / (n_total * 3)) for k, s in sums.items()},
        "psnr_vs_exact": {k: mse2psnr(s / (n_total * 3))
                          for k, s in dsum.items()},
    }
    res["delta_db"] = {k: res["psnr"]["exact"] - res["psnr"][k]
                       for k in ("quant", "hybrid")}
    print(json.dumps(res, indent=1), flush=True)
    if args.save:
        with open(args.save, "w") as fh:
            json.dump(res, fh, indent=1)
        print(f"wrote {args.save}")


if __name__ == "__main__":
    main()
