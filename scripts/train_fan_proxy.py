"""Train a converged-FAN proxy on the synthetic subject's landmarks.

The released 2DFAN-4 weights are env-blocked (loss/landmark_loss.py:53-66
loads a TorchScript archive; no egress here), so round-3's second-stage
rehearsal ran its aux landmark loss over a RANDOM-init FAN — proving
differentiability and throughput but not that landmark supervision
carries signal. This script closes that gap without external weights:
the synthetic subject's .lms landmarks are KNOWN (the exporter wrote
them), so the native FAN (pipeline/fan.py) can be trained supervised —
face-rect crops to 256², per-module gaussian heatmap regression
(intermediate supervision, Bulat & Tzimiropoulos ICCV'17) — until its
heatmaps localize the subject's landmarks. The result
(<out>/fan_proxy.npz) plugs into `train_second_stage --fan_npz` /
`rehearsal_2nd --ablate`, making the aux loss a real landmark prior for
THIS subject.

Usage: python scripts/train_fan_proxy.py [--steps 300] [--out runs/rehearsal2]
Writes <out>/fan_proxy.npz + <out>/fan_proxy.json (landmark-error
before/after, in heatmap px).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(ROOT, "runs", "rehearsal2"))
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--sigma", type=float, default=1.5,
                   help="target-heatmap gaussian sigma (heatmap px)")
    p.add_argument("--crop_size", type=int, default=256,
                   help="FAN input crop (pipeline/fan.CROP_SIZE); smoke "
                        "runs shrink it")
    p.add_argument("--max_frames", type=int, default=48)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.crop_size, args.steps, args.batch = 64, 4, 1
        args.max_frames = 4

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from idealnerf_tpu.data.dataset import load_transforms_dataset
    from idealnerf_tpu.pipeline.fan import (
        apply_fan, heatmaps_to_landmarks, init_fan,
    )

    out_dir = args.out
    if args.smoke:
        # smoke: never write artifacts over a real run directory
        out_dir = "/tmp/fan_proxy_smoke"
        os.makedirs(out_dir, exist_ok=True)
        if not os.path.exists(os.path.join(args.out,
                                           "HeadNeRF_config.txt")):
            from idealnerf_tpu.data.export import write_reference_format
            from idealnerf_tpu.data.synthetic import make_synthetic_dataset

            args.out = out_dir
            ds_s = make_synthetic_dataset(n_frames=4, H=66, W=66,
                                          dim_expr=8, seed=3)
            write_reference_format(ds_s, args.out, subject="rehearsal")

    ds = load_transforms_dataset(args.out, mode="train",
                                 max_frames=args.max_frames)
    H, W = ds.hw
    C = args.crop_size
    HM = C // 4  # FAN heatmap stride is 4

    # square face crops + landmarks mapped into the heatmap grid
    crops, targets = [], []
    for i in range(ds.size):
        x, y, w, h = [int(v) for v in ds.face_rects[i]]
        side = max(w, h)
        cx_, cy_ = x + w // 2, y + h // 2
        x0 = int(np.clip(cx_ - side // 2, 0, max(W - side, 0)))
        y0 = int(np.clip(cy_ - side // 2, 0, max(H - side, 0)))
        side = min(side, W - x0, H - y0)
        crop = ds.images[i, y0:y0 + side, x0:x0 + side].astype(
            np.float32) / 255.0
        crop = jax.image.resize(jnp.asarray(crop), (C, C, 3), "linear")
        lm = (ds.landmarks[i] - np.array([x0, y0])) * (HM / side)
        crops.append(np.asarray(crop))
        targets.append(lm.astype(np.float32))
    crops = np.stack(crops)          # (N, C, C, 3)
    lms_hm = np.stack(targets)       # (N, 68, 2) in heatmap px

    yy, xx = np.mgrid[0:HM, 0:HM].astype(np.float32)

    def gauss_maps(lms):
        d2 = ((xx[None] - lms[:, 0, None, None]) ** 2
              + (yy[None] - lms[:, 1, None, None]) ** 2)
        return np.exp(-d2 / (2.0 * args.sigma ** 2)).astype(np.float32)

    heat = np.stack([gauss_maps(l) for l in lms_hm])  # (N, 68, HM, HM)

    params = init_fan(jax.random.PRNGKey(1))

    # Forward-magnitude calibration: init_fan's random stack grows
    # activations ~2x per residual block (52 blocks -> ~1e10 outputs),
    # which makes supervised training diverge (intermediate-module MSE
    # explodes within 20 steps — measured). Iteratively rescale every
    # conv kernel by a global per-layer factor until the network's raw
    # output magnitude is O(10); homogeneity over the ~60-conv deepest
    # path gives the per-iteration exponent.
    calib = jnp.asarray(np.transpose(crops[:1], (0, 3, 1, 2)))

    def out_mag(p):
        outs = apply_fan(jax.tree.map(jnp.asarray, p), calib)
        return float(max(jnp.abs(o).max() for o in outs))

    for _ in range(8):
        m = out_mag(params)
        if m < 30.0:
            break
        s = m ** (-1.0 / 60.0)
        params = {k: (v * s if getattr(v, "ndim", 0) == 4 else v)
                  for k, v in params.items()}
    print(f"calibrated forward magnitude: {out_mag(params):.2f}",
          flush=True)

    # zero the per-module output convs (l{i}) so the initial prediction
    # is ~0 — the MSE starts at the target's scale and Adam converges
    # from step 0 (zero-init of a LAST layer keeps nonzero gradients)
    for k in list(params):
        if k.split(".")[0].startswith("l") and k.split(".")[0][1:].isdigit():
            params[k] = np.zeros_like(params[k])
    params = jax.tree.map(jnp.asarray, params)
    # clip: the random stack's internal activations are huge (the
    # residual al/bl paths accumulate unnormalized), so raw grads at
    # step 0 are explosive even though the zeroed head starts the loss
    # at target scale
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(args.lr))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, imgs, hms):
        def loss_fn(p):
            outs = apply_fan(p, jnp.transpose(imgs, (0, 3, 1, 2)))
            # intermediate supervision: every module's stack regresses
            # the target heatmaps
            return sum(jnp.mean((o - hms) ** 2) for o in outs) / len(outs)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def lm_err(params, imgs, lms):
        hm = apply_fan(params, jnp.transpose(imgs, (0, 3, 1, 2)))[-1]
        pred = heatmaps_to_landmarks(hm)
        return jnp.mean(jnp.linalg.norm(pred - lms, axis=-1))

    n_val = max(1, len(crops) // 8)
    tr_x, tr_y = crops[n_val:], heat[n_val:]
    va_x, va_l = jnp.asarray(crops[:n_val]), jnp.asarray(lms_hm[:n_val])

    err0 = float(lm_err(params, va_x, va_l))
    print(f"landmark error at random init: {err0:.2f} hm-px "
          f"({len(tr_x)} train crops, {n_val} val)", flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    losses = []
    for s in range(args.steps):
        idx = rng.integers(0, len(tr_x), args.batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(tr_x[idx]), jnp.asarray(tr_y[idx]))
        if s % 20 == 0 or s == args.steps - 1:
            losses.append((s, float(loss)))
            print(f"step {s}: heatmap mse {float(loss):.5f}", flush=True)
    wall = time.time() - t0

    err1 = float(lm_err(params, va_x, va_l))
    print(f"landmark error after {args.steps} steps: {err1:.2f} hm-px "
          f"(was {err0:.2f}; {args.steps / max(wall, 1e-9):.2f} steps/s)",
          flush=True)

    np.savez(os.path.join(out_dir, "fan_proxy.npz"),
             **{k: np.asarray(v) for k, v in params.items()})
    with open(os.path.join(out_dir, "fan_proxy.json"), "w") as fh:
        json.dump({
            "steps": args.steps, "batch": args.batch, "lr": args.lr,
            "crop_size": C, "train_crops": int(len(tr_x)),
            "val_crops": int(n_val), "wall_s": round(wall, 1),
            "landmark_err_hm_px_random_init": round(err0, 3),
            "landmark_err_hm_px_trained": round(err1, 3),
            "loss_trajectory": losses,
        }, fh, indent=2)
    print("wrote", os.path.join(out_dir, "fan_proxy.npz"))


if __name__ == "__main__":
    main()
