"""BFM-scale photometric-tracking wall time on the chip (round-2 review
item #4's timing sub-item).

Builds the reference-scale synthetic BFM stand-in (34.5k vertices / ~68k
triangles, id 100 / exp 79 — face_tracker.py:37-53) at 450², renders a
4-frame ground truth through the tile-binned soft rasterizer
(RasterConfig.bfm, zero overflow asserted), and times (a) one rasterizer
forward, (b) one photometric sliding-window refine step, and (c) a
40-step window refine — the per-window unit the tracker's real fit()
loop repeats (tracker.py:248-343). Writes track_bench.json.

Usage: python scripts/track_bench.py [--hw 450] [--frames 4]
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
    p.add_argument("--hw", type=int, default=450)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.hw, args.steps = 96, 3

    import numpy as np
    import jax
    import jax.numpy as jnp

    from idealnerf_tpu.pipeline.tracking.facemodel import Face3DMM
    from idealnerf_tpu.pipeline.tracking.geometry import (
        euler2rot, forward_transform, rot_trans_pts,
    )
    from idealnerf_tpu.pipeline.tracking.rasterizer import (
        RasterConfig, Render3DMM,
    )
    from idealnerf_tpu.pipeline.tracking.tracker import FaceTracker

    rng = np.random.RandomState(0)
    kw = (dict(n_id=100, n_exp=79, n_lat=150, n_lon=230, shell=True)
          if not args.smoke else dict(n_id=20, n_exp=10))
    model = Face3DMM.synthetic(with_contours=True, seed=5, **kw)
    n = args.frames
    h = w = args.hw
    focal = 1200.0 * args.hw / 450.0

    def smooth(a, b):
        t = np.linspace(0.0, 1.0, n)[:, None]
        return jnp.asarray((1 - t) * a + t * b, jnp.float32)

    n_id, n_exp = model.dims
    gt = {
        "id": jnp.asarray(rng.randn(n_id) * 0.3, jnp.float32),
        "exp": smooth(rng.randn(n_exp) * 0.3, rng.randn(n_exp) * 0.3),
        "euler": smooth(rng.uniform(-0.1, 0.1, 3),
                        rng.uniform(-0.1, 0.1, 3)),
        "trans": np.array([0.0, 0.0, -7.0])
        + smooth(rng.uniform(-0.05, 0.05, 3), rng.uniform(-0.05, 0.05, 3)),
    }
    tex_gt = jnp.asarray(rng.randn(model.n_tex) * 0.5, jnp.float32)
    light = jnp.zeros((n, 27)).at[:, ::9].add(0.3)

    cfg = RasterConfig.bfm(h, w)
    renderer = Render3DMM(focal, h, w, model.tris, cfg)
    geo = model.geometry(gt["id"][None], gt["exp"])
    rott = rot_trans_pts(geo, euler2rot(gt["euler"]), gt["trans"])
    texture = jnp.broadcast_to(model.texture(tex_gt[None]), geo.shape)

    # warm + overflow check
    out, overflow = renderer(rott, texture, light, return_overflow=True)
    jax.block_until_ready(out)
    assert int(overflow) == 0, f"bin overflow {int(overflow)} at BFM scale"
    gt_imgs = np.asarray(out[..., :3])

    reps = 6
    t0 = time.time()
    for _ in range(reps):
        out = renderer(rott, texture, light)
        _ = float(jnp.sum(out))  # force a host fetch (axon-safe timing)
    t_raster = (time.time() - t0) / reps

    lan3d = model.get_3dlandmarks(gt["id"][None], gt["exp"], gt["euler"],
                                  gt["trans"], focal, (w / 2, h / 2))
    lms = np.asarray(forward_transform(lan3d, gt["euler"], gt["trans"],
                                       focal, (w / 2, h / 2))[..., :2])

    tracker = FaceTracker(model, h, w, focal_candidates=[focal],
                          raster_cfg=cfg)
    params = {
        "id": gt["id"],
        "exp": gt["exp"] + 0.08,
        "euler": gt["euler"] + jnp.asarray([[0.006, -0.004, 0.003]] * n),
        "trans": gt["trans"] + jnp.asarray([[0.015, -0.01, 0.03]] * n),
    }
    # compile pass
    t0 = time.time()
    refined, _ = tracker._photometric_refine(
        params, tex_gt, light, gt_imgs, lms, focal, batch=n, steps=1)
    jax.block_until_ready(refined["exp"])
    t_first = time.time() - t0
    # steady window
    t0 = time.time()
    refined, _ = tracker._photometric_refine(
        params, tex_gt, light, gt_imgs, lms, focal, batch=n,
        steps=args.steps)
    _ = float(jnp.sum(refined["exp"]))
    t_window = time.time() - t0

    res = {
        "hw": h, "frames": n, "vertices": int(model.mu.shape[0] // 3),
        "tris": int(model.tris.shape[0]),
        "raster_forward_s": round(t_raster, 4),
        "photometric_window_first_s_incl_compile": round(t_first, 2),
        f"photometric_window_{args.steps}step_s": round(t_window, 2),
        "s_per_photometric_step": round(t_window / args.steps, 4),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(ROOT, "runs", "track_bench.json"), "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
