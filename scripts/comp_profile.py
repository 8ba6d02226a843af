"""Per-stage cost profile of the quality-matched composite renderer —
where do the ~87 ms/frame go at the 16+32 rung?

The fast composite runs SIX jitted programs per frame (two coarse, keep,
two fine, composite — deliberately split: the axon remote compiler fails
on programs holding >=3 pallas launches). bench.py times only the
end-to-end loop; this script times each stage in its own
accumulate-then-fetch loop (>=reps iterations, one host fetch — the axon
timing discipline BASELINE.md documents) plus the end-to-end frame, so
glue = end_to_end − Σstages is measured, not guessed.

Writes runs/comp_profile.json.
Usage: python scripts/comp_profile.py [--reps 30] [--smoke]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--samples", type=int, default=16)
    p.add_argument("--importance", type=int, default=32)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data import make_synthetic_dataset
    from idealnerf_tpu.eval.renderer import (
        foreground_prior_fields, make_composite_fast_renderer,
    )
    from idealnerf_tpu.models.face_nerf import init_face_nerf

    on_tpu = jax.devices()[0].platform != "cpu"
    hw = 48 if args.smoke else 450
    if args.smoke:
        args.reps = 2

    cfg = ExperimentConfig(
        dim_aud=64, dim_expr=8, dim_latent=32,
        N_samples=args.samples, N_importance=args.importance,
    )
    nerf_cfg = cfg.face_nerf_config()
    torso_cfg = ExperimentConfig(
        dim_aud=cfg.dim_aud_body + 42, dim_expr=0, dim_latent=0,
        N_samples=args.samples, N_importance=args.importance,
    ).face_nerf_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    params = {"coarse": init_face_nerf(ks[0], nerf_cfg),
              "fine": init_face_nerf(ks[1], nerf_cfg)}
    torso_params = {"coarse": init_face_nerf(ks[2], torso_cfg),
                    "fine": init_face_nerf(ks[3], torso_cfg)}
    aud = jax.random.normal(ks[4], (cfg.dim_aud,))
    expr = jax.random.normal(ks[5], (cfg.dim_expr,))
    latent = jax.random.normal(ks[6], (cfg.dim_latent,))
    signal = jax.random.normal(ks[7], (cfg.dim_aud_body + 42,))

    ds = make_synthetic_dataset(n_frames=2, H=hw, W=hw,
                                dim_expr=cfg.dim_expr, with_torso=True)
    H, W = ds.hw
    focal = ds.focal
    pose = jnp.asarray(ds.poses[0])
    bc = jnp.asarray(ds.bc_img, jnp.float32) / 255.0
    mask_h, mask_t = foreground_prior_fields(ds)
    near, far = 0.3, 0.9
    cd = jnp.bfloat16 if on_tpu else jnp.float32

    render = make_composite_fast_renderer(
        nerf_cfg, torso_cfg, H, W, focal, near, far, cfg.render_config(),
        compute_dtype=cd,
        prior_mask_head=jnp.asarray(np.asarray(mask_h)),
        prior_mask_torso=jnp.asarray(np.asarray(mask_t)),
        keep_head=0.4, keep_torso=0.4,
        _expose_stages=True,
    )
    stages = render.stages  # dict of jitted stage fns + constant maps

    cond_h = (aud, expr, latent)
    cond_t = (signal, None, None)

    def fetch(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def timeit(fn, *a, **kw):
        """Accumulate-then-fetch loop; returns ms/iteration."""
        out = fn(*a, **kw)
        fetch(out)  # compile + warm
        fetch(fn(*a, **kw))
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            o = jax.tree.leaves(fn(*a, **kw))[0]
            acc = o if acc is None else acc + o
        fetch(acc)
        return (time.perf_counter() - t0) / args.reps * 1e3

    res = {"hw": hw, "rung": f"{args.samples}+{args.importance}",
           "reps": args.reps,
           "backend": "tpu" if on_tpu else "cpu", "stages_ms": {}}

    sh = stages["coarse"](params, pose, bc, cond_h, stages["sel_h"])
    st_ = stages["coarse"](torso_params, pose, bc, cond_t,
                           stages["sel_t"], is_torso=True)
    keep_h, keep_t = stages["keep"](sh["acc"], sh["lw"], st_["acc"],
                                    st_["lw"])
    head_f = stages["fine"](params, sh, keep_h, cond_h)
    torso_f = stages["fine"](torso_params, st_, keep_t, cond_t,
                             is_torso=True)

    res["stages_ms"]["coarse_head"] = round(timeit(
        stages["coarse"], params, pose, bc, cond_h, stages["sel_h"]), 2)
    res["stages_ms"]["coarse_torso"] = round(timeit(
        stages["coarse"], torso_params, pose, bc, cond_t,
        stages["sel_t"], is_torso=True), 2)
    res["stages_ms"]["keep"] = round(timeit(
        stages["keep"], sh["acc"], sh["lw"], st_["acc"], st_["lw"]), 2)
    res["stages_ms"]["fine_head"] = round(timeit(
        stages["fine"], params, sh, keep_h, cond_h), 2)
    res["stages_ms"]["fine_torso"] = round(timeit(
        stages["fine"], torso_params, st_, keep_t, cond_t,
        is_torso=True), 2)
    res["stages_ms"]["composite"] = round(timeit(
        stages["composite"], sh, st_, keep_h, keep_t, head_f, torso_f,
        bc), 2)

    def frame():
        return render(params, torso_params, pose, pose, bc, aud=aud,
                      signal=signal, expr=expr, latent=latent)

    float(frame().mean())
    float(frame().mean())
    t0 = time.perf_counter()
    acc = None
    for _ in range(args.reps):
        f = frame()
        acc = f if acc is None else acc + f
    float(acc.mean())
    res["end_to_end_ms"] = round(
        (time.perf_counter() - t0) / args.reps * 1e3, 2)
    res["sum_stages_ms"] = round(sum(res["stages_ms"].values()), 2)
    res["glue_ms"] = round(res["end_to_end_ms"] - res["sum_stages_ms"], 2)
    res["fps"] = round(1e3 / res["end_to_end_ms"], 2)

    print(json.dumps(res, indent=2))
    out_path = os.path.join(ROOT, "runs", "comp_profile.json")
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
