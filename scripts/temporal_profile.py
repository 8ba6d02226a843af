"""Per-stage cost profile of the temporal composite DELTA frame — where
does the steady-state delta-frame time go, and how much of it is fixed
(per-frame glue: ray gen, sample_pdf, sort, band maintenance, dispatch)
vs per-point network compute?

A delta frame runs THREE jitted programs (head delta, torso delta,
composite — each field program holds its single pallas launch plus the
XLA depth-placement/band-update glue). This times each program in its
own accumulate-then-fetch loop (the axon timing discipline BASELINE.md
documents), the end-to-end delta frame, and the end-to-end frame at a
second s_delta so the fixed cost can be read off the slope:

    t(s) = fixed + slope * s   =>   fixed = t(s1) - slope * s1

Timing is content-independent (static shapes), so random fields measure
real cost; quality is scripts/temporal_delta.py's job.

Writes runs/temporal_profile.json.
Usage: python scripts/temporal_profile.py [--reps 20] [--smoke]
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
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--samples", type=int, default=16)
    p.add_argument("--importance", type=int, default=32)
    p.add_argument("--s_delta", type=int, default=32)
    p.add_argument("--s_delta2", type=int, default=16,
                   help="second operating point for the slope fit")
    p.add_argument("--delta_keep", type=float, default=0.6)
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
    from idealnerf_tpu.eval.renderer import foreground_prior_fields
    from idealnerf_tpu.eval.temporal import make_temporal_composite_renderer
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

    def build(s_delta, expose=False, dilate_every=1, in_kernel=None):
        return make_temporal_composite_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg.render_config(), compute_dtype=cd,
            prior_mask_head=jnp.asarray(np.asarray(mask_h)),
            prior_mask_torso=jnp.asarray(np.asarray(mask_t)),
            s_delta=s_delta, delta_keep_head=args.delta_keep,
            delta_keep_torso=args.delta_keep,
            dilate_every=dilate_every, in_kernel_delta=in_kernel,
            _expose_stages=expose)

    render = build(args.s_delta, expose=True)

    def fetch(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def timeit(fn, *a, **kw):
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

    cond_h = (aud, expr, latent)
    cond_t = (signal, None, None)

    # keyframe -> caches; then profile the steady-state delta programs
    _, _, _, cache_h = render.stages["head"](params, pose, bc, cond_h,
                                             None)
    rgb_h, _, _, cache_h = render.stages["head"](params, pose, bc,
                                                 cond_h, cache_h)
    _, _, _, cache_t = render.stages["torso"](torso_params, pose, bc,
                                              cond_t, None)
    _, lw_t, fg_t, cache_t = render.stages["torso"](torso_params, pose,
                                                    bc, cond_t, cache_t)

    res = {"hw": hw, "rung": f"{args.samples}+{args.importance}",
           "s_delta": args.s_delta, "delta_keep": args.delta_keep,
           "reps": args.reps,
           "backend": "tpu" if on_tpu else "cpu", "stages_ms": {}}
    res["stages_ms"]["head_delta"] = round(timeit(
        render.stages["head"], params, pose, bc, cond_h, cache_h), 2)
    res["stages_ms"]["torso_delta"] = round(timeit(
        render.stages["torso"], torso_params, pose, bc, cond_t,
        cache_t), 2)
    res["stages_ms"]["composite"] = round(timeit(
        render.stages["composite"], rgb_h, lw_t, fg_t, bc), 2)

    def steady(r):
        """End-to-end delta-frame ms at the renderer's own cache."""
        def call(c):
            return r(params, torso_params, pose, pose, bc, aud=aud,
                     signal=signal, expr=expr, latent=latent, cache=c)
        f, c = call(None)
        float(f.mean())
        for _ in range(3):
            f, c = call(c)
            float(f.mean())
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            f, c = call(c)
            acc = f if acc is None else acc + f
        float(acc.mean())
        return (time.perf_counter() - t0) / args.reps * 1e3

    res["end_to_end_ms"] = round(steady(render), 2)
    res["sum_stages_ms"] = round(sum(res["stages_ms"].values()), 2)
    res["glue_ms"] = round(res["end_to_end_ms"] - res["sum_stages_ms"], 2)
    res["fps"] = round(1e3 / res["end_to_end_ms"], 2)

    # slope fit: second s_delta isolates the per-sample cost from the
    # per-frame fixed cost
    if args.s_delta2 and args.s_delta2 != args.s_delta:
        t2 = steady(build(args.s_delta2))
        s1, s2 = args.s_delta, args.s_delta2
        slope = (res["end_to_end_ms"] - t2) / (s1 - s2)
        res["end_to_end_ms_s2"] = round(t2, 2)
        res["s_delta2"] = s2
        res["ms_per_sample"] = round(slope, 3)
        res["fixed_ms"] = round(res["end_to_end_ms"] - slope * s1, 2)

    # fused-delta-kernel share: the same operating point with the delta
    # depth placement + band computation forced back to XLA
    # (in_kernel_delta=False) — the difference is what
    # kernels.fused_render_delta deletes from the per-delta-frame fixed
    # cost (sample_pdf masked reduces, sort, band cumsum, the depth
    # grid's HBM round trip)
    if on_tpu:
        t_xla = steady(build(args.s_delta, in_kernel=False))
        res["end_to_end_ms_xla_delta"] = round(t_xla, 2)
        res["kernel_delta_saving_ms"] = round(
            t_xla - res["end_to_end_ms"], 2)

    # dilation share of the fixed cost: the same operating point with
    # the spatial band dilation thinned out entirely (dilate_every so
    # large it never fires after the keyframe) — the difference is the
    # two live fields' per-delta-frame dilation cost (grid scatter +
    # separable min/max windows + gather), the part dilate_every
    # amortizes and freeze_z deletes
    t_nd = steady(build(args.s_delta, dilate_every=1_000_000))
    res["end_to_end_ms_nodilate"] = round(t_nd, 2)
    res["dilation_ms"] = round(res["end_to_end_ms"] - t_nd, 2)

    # scanned-cycle path: T delta frames per lax.scan program
    # (render.cycle) — how much of the fixed cost is per-frame
    # dispatch/glue the scan amortizes?
    def steady_cycle(r, T):
        def call(c):
            return r(params, torso_params, pose, pose, bc, aud=aud,
                     signal=signal, expr=expr, latent=latent, cache=c)
        f, c = call(None)
        float(f.mean())
        f, c = call(c)          # delta-shaped cache (scan carry shape)
        float(f.mean())
        xs = dict(poses=jnp.tile(pose[None], (T, 1, 1)),
                  auds=jnp.tile(aud[None], (T, 1)),
                  signals=jnp.tile(signal[None], (T, 1)),
                  exprs=jnp.tile(expr[None], (T, 1)),
                  latents=jnp.tile(latent[None], (T, 1)))
        fr, c = r.cycle(params, torso_params, xs["poses"], pose, bc, c,
                        auds=xs["auds"], signals=xs["signals"],
                        exprs=xs["exprs"], latents=xs["latents"])
        float(fr.mean())        # compile + warm
        reps = max(2, args.reps // 4)
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            fr, c = r.cycle(params, torso_params, xs["poses"], pose, bc,
                            c, auds=xs["auds"], signals=xs["signals"],
                            exprs=xs["exprs"], latents=xs["latents"])
            acc = fr if acc is None else acc + fr
        float(acc.mean())
        return (time.perf_counter() - t0) / (reps * T) * 1e3

    T_cyc = 4 if args.smoke else 24
    res["cycle_ms_per_frame"] = round(
        steady_cycle(build(args.s_delta), T_cyc), 2)
    res["cycle_T"] = T_cyc
    res["cycle_fps"] = round(1e3 / res["cycle_ms_per_frame"], 2)
    if args.s_delta2 and args.s_delta2 != args.s_delta:
        res["cycle_ms_per_frame_s2"] = round(
            steady_cycle(build(args.s_delta2), T_cyc), 2)

    print(json.dumps(res, indent=2))
    # smoke runs must not clobber the measured TPU evidence
    name = ("temporal_profile_smoke.json" if args.smoke
            else "temporal_profile.json")
    with open(os.path.join(ROOT, "runs", name), "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
