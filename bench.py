"""Benchmark: full-frame 450² hierarchical (64+192-sample) conditioned
FaceNeRF render — the reference's FPS-critical eval path
(eval_aud_exp_nerf.py: 450²×256 ≈ 51.8M conditioned-MLP point evals per
frame, muxed at 25 fps).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star 25 FPS per chip at this workload (BASELINE.md —
the reference publishes no number; 25 fps is its video mux rate and the
driver-set target).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


# Operating-point selection lives in the package now
# (idealnerf_tpu/eval/operating_points.py) so eval_reenact
# --auto_temporal and this bench read the same gated configs; names
# re-exported here for callers/tests that import them from bench.
from idealnerf_tpu.eval.operating_points import (  # noqa: F401
    TEMPORAL_EVIDENCE_FILES, load_temporal_evidence,
    pick_quality_matched_rung, pick_temporal_mode_configs,
    pick_temporal_points,
)


def main():
    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.eval.renderer import make_frame_renderer
    from idealnerf_tpu.models.face_nerf import init_face_nerf

    on_tpu_backend = jax.default_backend() == "tpu"
    # CPU fallback (driver runs this on a real chip): shrink the frame so
    # a no-TPU environment still produces a comparable-shape JSON line
    H = W = 450 if on_tpu_backend else 96
    focal = 1200.0 if on_tpu_backend else 256.0
    cx = cy = H / 2.0
    near, far = 0.5772005200386048, 1.1772005200386046  # May (README.md:46-47)

    # BENCH_SAMPLES / BENCH_IMPORTANCE parametrize the per-ray sample
    # schedule (default = the reference's paper schedule); used to quote
    # fps at a quality-matched reduced rung once scripts/sample_sweep.py
    # has measured the knee on a converged model
    cfg = ExperimentConfig(
        dim_aud=64, dim_expr=79, dim_latent=32,
        N_samples=int(os.environ.get("BENCH_SAMPLES", "64")),
        N_importance=int(os.environ.get("BENCH_IMPORTANCE", "128")),
    )
    nerf_cfg = cfg.face_nerf_config()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    params = {
        "coarse": init_face_nerf(ks[0], nerf_cfg),
        "fine": init_face_nerf(ks[1], nerf_cfg),
    }
    pose = jnp.concatenate(
        [jnp.eye(3), jnp.array([[0.0], [0.0], [0.85]])], axis=1
    )
    bc = jax.random.uniform(ks[2], (H, W, 3))
    aud = jax.random.normal(ks[3], (64,))
    expr = jax.random.normal(ks[4], (79,))
    latent = jnp.ones((32,))

    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else None
    n_frames = int(os.environ.get("BENCH_FRAMES", "4"))
    keep = float(os.environ.get("BENCH_KEEP", "0.4"))

    def timed(render):
        # NOTE: through the axon remote tunnel block_until_ready() can
        # return before device execution finishes; accumulate frames and
        # fetch to host so timing covers real execution. Warm 3 rounds:
        # the remote relay inflates the first executions of every new
        # executable (a time-based ramp, not just the first call).
        for _ in range(3):
            frame = render(params, pose, bc, aud=aud, expr=expr, latent=latent)
            float(frame.mean())
        t0 = time.perf_counter()
        acc = None
        for i in range(n_frames):
            frame = render(params, pose, bc, aud=aud + 0.01 * i, expr=expr,
                           latent=latent)
            acc = frame if acc is None else acc + frame
        float(acc.mean())
        return n_frames / (time.perf_counter() - t0)

    # 1. full-fidelity hierarchical render. Default on TPU: the per-ray
    # fused Pallas kernel with in-kernel compositing ("ray", 105 TF/s on
    # the fine pass — kernels/fused_render.py). BENCH_PALLAS=0 forces the
    # XLA path, =1 the per-point fused-MLP kernel.
    mode = os.environ.get("BENCH_PALLAS", "ray")
    use_pallas = {"0": False, "1": True, "ray": "ray"}.get(mode, "ray")
    if not on_tpu:
        use_pallas = False
    render_full = make_frame_renderer(
        nerf_cfg, H, W, focal, near, far, cfg.render_config(),
        cx=cx, cy=cy, tile=(H * W) // 12,  # 12 tiles
        compute_dtype=compute_dtype, use_pallas=use_pallas,
    )
    fps_full = timed(render_full)

    # 2. foreground-pruned eval (fine pass on top-40% rays by coarse
    # opacity; visually identical on converged models), fused kernel in
    # both passes on TPU.
    from idealnerf_tpu.eval.renderer import render_frame_pruned
    from idealnerf_tpu.models.face_nerf import make_field_fn

    if on_tpu:
        from idealnerf_tpu.eval.renderer import make_pruned_frame_renderer

        render_pruned = make_pruned_frame_renderer(
            nerf_cfg, H, W, focal, near, far, cfg.render_config(),
            cx=cx, cy=cy, tile=(H * W) // 12, keep_fraction=keep,
            compute_dtype=compute_dtype,
        )
    else:
        @jax.jit
        def render_pruned(params, pose, bc_img, aud=None, expr=None,
                          latent=None):
            cf = make_field_fn(params["coarse"], nerf_cfg, aud, expr, latent,
                               compute_dtype=compute_dtype)
            ff = make_field_fn(params["fine"], nerf_cfg, aud, expr, latent,
                               compute_dtype=compute_dtype)
            return render_frame_pruned(
                cf, ff, H, W, focal, pose, bc_img, near, far,
                cfg.render_config(), cx=cx, cy=cy, tile=(H * W) // 12,
                keep_fraction=keep,
            )

    fps_pruned = timed(render_pruned)

    # 3. subject-prior masked eval: rays outside the subject's foreground
    # prior (union of face rects + torso parse masks — the quantities the
    # offline pipeline produces, audio_exp_nerf.py:163-187) skip all
    # network work. The mask is DERIVED FROM DATA via
    # eval.renderer.foreground_prior: from the on-disk rehearsal subject
    # when present (real parse maps, runs/rehearsal2), else from a
    # 450² synthetic subject's parse masks/face rects.
    import numpy as np

    from idealnerf_tpu.eval.renderer import (
        foreground_prior, render_frame_prior_masked,
    )

    mask = None
    mask_src = None
    rehearsal_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "runs", "rehearsal2"
    )
    if on_tpu_backend and os.path.isdir(
        os.path.join(rehearsal_dir, "parsing")
    ):
        try:
            from idealnerf_tpu.data.dataset import load_transforms_dataset

            ds_prior = load_transforms_dataset(
                rehearsal_dir, mode="train", skip=10, max_frames=24
            )
            if ds_prior.hw == (H, W):
                mask, k_coarse = foreground_prior(ds_prior)
                mask_src = "rehearsal2_parse"
        except Exception as e:  # missing/partial run dir: fall through
            print(f"# prior from rehearsal2 failed: {e}", file=sys.stderr)
    if mask is None:
        from idealnerf_tpu.data.synthetic import make_synthetic_dataset

        ds_prior = make_synthetic_dataset(
            n_frames=6, H=H, W=W, dim_expr=8, with_torso=True
        )
        mask, k_coarse = foreground_prior(ds_prior)
        mask_src = "synthetic_parse"
    mask_coverage = float(np.asarray(mask).mean())
    mask_dev = jnp.asarray(mask)

    # keep 0.4 within the prior: the 50k-step converged-model rehearsal
    # measured the keep-0.4 quality delta at +0.005 dB (runs/rehearsal2)
    keep_masked = float(os.environ.get("BENCH_KEEP_MASKED", "0.4"))
    if on_tpu:
        render_masked = make_pruned_frame_renderer(
            nerf_cfg, H, W, focal, near, far, cfg.render_config(),
            cx=cx, cy=cy, tile=(H * W) // 12, keep_fraction=keep_masked,
            compute_dtype=compute_dtype,
            prior_mask=mask_dev, k_coarse=k_coarse,
        )
    else:
        @jax.jit
        def render_masked(params, pose, bc_img, aud=None, expr=None,
                          latent=None):
            cf = make_field_fn(params["coarse"], nerf_cfg, aud, expr, latent,
                               compute_dtype=compute_dtype)
            ff = make_field_fn(params["fine"], nerf_cfg, aud, expr, latent,
                               compute_dtype=compute_dtype)
            return render_frame_prior_masked(
                cf, ff, H, W, focal, pose, bc_img, near, far,
                cfg.render_config(), mask_dev, k_coarse, cx=cx, cy=cy,
                keep_fraction=keep_masked,
            )

    fps_masked = timed(render_masked)

    # 4. head+torso composite at full fidelity — the north-star workload
    # (test_torso.py:513-534: head rays from the frame pose, torso rays
    # from the fixed first-frame pose, layered composite). Two full
    # hierarchical field renders per frame.
    from idealnerf_tpu.eval.renderer import make_composite_frame_renderer

    torso_cfg = ExperimentConfig(
        dim_aud=cfg.dim_aud_body + 42, dim_expr=0, dim_latent=0,
        N_samples=cfg.N_samples, N_importance=cfg.N_importance,
    ).face_nerf_config()
    torso_params = {
        "coarse": init_face_nerf(jax.random.PRNGKey(7), torso_cfg),
        "fine": init_face_nerf(jax.random.PRNGKey(8), torso_cfg),
    }
    signal = jax.random.normal(ks[5], (cfg.dim_aud_body + 42,))
    render_comp = make_composite_frame_renderer(
        nerf_cfg, torso_cfg, H, W, focal, near, far, cfg.render_config(),
        cx=cx, cy=cy, compute_dtype=compute_dtype,
        use_pallas="ray" if on_tpu else False, tile=(H * W) // 12,
    )

    def timed_comp(render):
        def call():
            return render(params, torso_params, pose, pose, bc,
                          aud=aud, signal=signal, expr=expr,
                          latent=latent)
        for _ in range(3):
            float(call().mean())
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_frames):
            f = call()
            acc = f if acc is None else acc + f
        float(acc.mean())
        return n_frames / (time.perf_counter() - t0)

    fps_comp = timed_comp(render_comp)

    # 5. composite FAST mode — per-FIELD priors (head: face rects;
    # torso: parse silhouette — foreground_prior_fields on the same
    # data-derived subject as mode 3) + per-field pruning, with the
    # head ranking occlusion-weighted by the torso's coarse
    # transmittance (eval/renderer.make_composite_fast_renderer).
    from idealnerf_tpu.eval.renderer import (
        foreground_prior_fields, make_composite_fast_renderer,
    )

    try:
        mask_h, mask_t = foreground_prior_fields(ds_prior)
    except Exception:
        mask_h = mask_t = np.asarray(mask)
    cov_h = float(np.asarray(mask_h).mean())
    cov_t = float(np.asarray(mask_t).mean())

    if on_tpu:
        render_comp_fast = make_composite_fast_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg.render_config(), cx=cx, cy=cy,
            compute_dtype=compute_dtype,
            prior_mask_head=jnp.asarray(mask_h),
            prior_mask_torso=jnp.asarray(mask_t),
            keep_head=keep_masked, keep_torso=keep_masked,
        )
        fps_comp_fast = timed_comp(render_comp_fast)
        comp_fast_ran = True
    else:
        # the fused kernels only run in (slow) interpret mode off-TPU;
        # the fast mode is meaningless there — report the full-fidelity
        # number but mark that the fast path never executed
        fps_comp_fast = fps_comp
        comp_fast_ran = False

    # 6. temporal depth-cache composite (eval/temporal.py) — the VIDEO
    # renderer: keyframes every BENCH_REFRESH frames pay the full
    # hierarchical schedule on the prior rays; frames in between resample
    # each ray only inside its cached foreground depth band at
    # BENCH_S_DELTA samples/ray. Timing is content-independent (static
    # shapes), so random fields measure real fps; the quality contract is
    # measured on trained checkpoints by scripts/temporal_delta.py.
    fps_temporal_video = fps_temporal_delta = None
    fps_temporal_video_loop = fps_temporal_head_video_loop = None
    temporal_quality = None
    if on_tpu:
        from idealnerf_tpu.eval.temporal import (
            make_temporal_composite_renderer,
        )

        # per-mode operating point (refresh interval, s_delta, keyframe
        # rung) = the quality-holding configuration with the largest
        # keyframe interval and cheapest s_delta across every
        # scripts/temporal_delta.py evidence file; env defaults otherwise
        default_sd = int(os.environ.get("BENCH_S_DELTA", "32"))
        default_refresh = int(os.environ.get("BENCH_REFRESH", "25"))
        td_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "runs", "rehearsal2_com")
        cands = load_temporal_evidence(td_dir)
        temporal_quality = pick_temporal_mode_configs(
            cands, default_sd, default_refresh)
        comp_conf = temporal_quality["comp"]
        head_conf = temporal_quality["head"]

        import dataclasses as _dc

        def cfg_at(rung):
            if not rung:
                return cfg
            s_kf, imp_kf = map(int, rung.split("+"))
            return _dc.replace(cfg, N_samples=s_kf, N_importance=imp_kf)

        refresh = comp_conf["refresh"]
        s_delta = comp_conf["s_delta"]
        dk = comp_conf.get("delta_keep", 1.0)
        render_temporal = make_temporal_composite_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg_at(comp_conf["keyframe_rung"]).render_config(),
            cx=cx, cy=cy,
            compute_dtype=compute_dtype,
            prior_mask_head=jnp.asarray(mask_h),
            prior_mask_torso=jnp.asarray(mask_t), s_delta=s_delta,
            delta_keep_head=dk,
            delta_keep_torso=(comp_conf.get("delta_keep_torso") or dk),
            s_delta_torso=comp_conf.get("s_delta_torso"),
            uni_frac=comp_conf.get("uni_frac", 0.25),
            kf_blend=comp_conf.get("kf_blend", 0.0),
            freeze_z_torso=comp_conf.get("freeze_z_torso", False),
            dilate_every=comp_conf.get("dilate_every", 1),
        )

        def tcall(cache):
            return render_temporal(params, torso_params, pose, pose, bc,
                                   aud=aud, signal=signal, expr=expr,
                                   latent=latent, cache=cache)

        # warm both executables (keyframe and delta programs)
        for _ in range(2):
            f, c0 = tcall(None)
            float(f.mean())
        for _ in range(3):
            f, c0 = tcall(c0)
            float(f.mean())
        # amortized video fps over one refresh period (1 keyframe +
        # refresh-1 delta frames), accumulate-then-fetch — per-frame loop
        t0 = time.perf_counter()
        acc, cache = None, None
        for i in range(refresh):
            f, cache = tcall(None if i == 0 else cache)
            acc = f if acc is None else acc + f
        float(acc.mean())
        fps_temporal_video_loop = refresh / (time.perf_counter() - t0)
        # steady-state delta-frame fps (per-frame loop)
        t0 = time.perf_counter()
        acc = None
        for _ in range(max(n_frames, 8)):
            f, cache = tcall(cache)
            acc = f if acc is None else acc + f
        float(acc.mean())
        fps_temporal_delta = max(n_frames, 8) / (time.perf_counter() - t0)

        # production video path (cli/eval_reenact.py --cycle, default):
        # each cycle's delta frames after the first run as ONE scanned
        # program — identical frames (equivalence-tested), one dispatch
        # + one bulk fetch per cycle
        T_cyc = refresh - 2
        fps_temporal_video = fps_temporal_video_loop
        if T_cyc > 0:
            xs_c = dict(
                poses=jnp.tile(pose[None], (T_cyc, 1, 1)),
                auds=jnp.tile(aud[None], (T_cyc, 1)),
                signals=jnp.tile(signal[None], (T_cyc, 1)),
                exprs=jnp.tile(expr[None], (T_cyc, 1)),
                latents=jnp.tile(latent[None], (T_cyc, 1)))

            def ccall(c):
                return render_temporal.cycle(
                    params, torso_params, xs_c["poses"], pose, bc, c,
                    auds=xs_c["auds"], signals=xs_c["signals"],
                    exprs=xs_c["exprs"], latents=xs_c["latents"])

            fr, cache = ccall(cache)
            float(fr.mean())        # compile + warm
            t0 = time.perf_counter()
            acc = None
            for rep in range(3):    # 3 cycles: kf + delta + scan chunk
                f, c0 = tcall(None)
                a = f.mean()
                f, c0 = tcall(c0)
                a = a + f.mean()
                fr, c0 = ccall(c0)
                a = a + fr.mean()
                acc = a if acc is None else acc + a
            float(acc)
            fps_temporal_video = (
                3 * refresh / (time.perf_counter() - t0))

        # head-only temporal (the single-field video path,
        # eval_aud_exp_nerf.py:437 workload) under the same subject prior
        # as mode 3
        from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

        refresh_h = head_conf["refresh"]
        render_temporal_head = make_temporal_frame_renderer(
            nerf_cfg, H, W, focal, near, far,
            cfg_at(head_conf["keyframe_rung"]).render_config(),
            cx=cx, cy=cy, compute_dtype=compute_dtype,
            prior_mask=mask_dev, s_delta=head_conf["s_delta"],
            delta_keep=head_conf.get("delta_keep", 1.0),
            uni_frac=head_conf.get("uni_frac", 0.25),
            kf_blend=head_conf.get("kf_blend", 0.0),
            dilate_every=head_conf.get("dilate_every", 1),
        )

        def hcall(cache):
            return render_temporal_head(params, pose, bc, aud=aud,
                                        expr=expr, latent=latent,
                                        cache=cache)

        for _ in range(2):
            f, hc = hcall(None)
            float(f.mean())
        for _ in range(3):
            f, hc = hcall(hc)
            float(f.mean())
        t0 = time.perf_counter()
        acc, hc = None, None
        for i in range(refresh_h):
            f, hc = hcall(None if i == 0 else hc)
            acc = f if acc is None else acc + f
        float(acc.mean())
        fps_temporal_head_video_loop = (
            refresh_h / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        acc = None
        for _ in range(max(n_frames, 8)):
            f, hc = hcall(hc)
            acc = f if acc is None else acc + f
        float(acc.mean())
        fps_temporal_head_delta = (
            max(n_frames, 8) / (time.perf_counter() - t0))

        # scanned-cycle head video (production path)
        T_h = refresh_h - 2
        fps_temporal_head_video = fps_temporal_head_video_loop
        if T_h > 0:
            xs_h = dict(poses=jnp.tile(pose[None], (T_h, 1, 1)),
                        auds=jnp.tile(aud[None], (T_h, 1)),
                        exprs=jnp.tile(expr[None], (T_h, 1)),
                        latents=jnp.tile(latent[None], (T_h, 1)))

            def hccall(c):
                return render_temporal_head.cycle(
                    params, xs_h["poses"], bc, c, auds=xs_h["auds"],
                    exprs=xs_h["exprs"], latents=xs_h["latents"])

            fr, hc = hccall(hc)
            float(fr.mean())
            t0 = time.perf_counter()
            acc = None
            for rep in range(3):
                f, h0 = hcall(None)
                a = f.mean()
                f, h0 = hcall(h0)
                a = a + f.mean()
                fr, h0 = hccall(h0)
                a = a + fr.mean()
                acc = a if acc is None else acc + a
            float(acc)
            fps_temporal_head_video = (
                3 * refresh_h / (time.perf_counter() - t0))
    else:
        fps_temporal_head_video = fps_temporal_head_delta = None

    # 7. quality-matched reduced sample schedule — EVIDENCE-GATED: only
    # when scripts/sample_sweep.py has measured (on the converged
    # rehearsal checkpoint) that a cheaper rung holds quality within
    # 0.05 dB of the paper 64+192 schedule. Bounds tightening changes
    # quality, not cost, so fps here only needs the rung.
    qm = None
    sweep_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "runs", "rehearsal2", "sample_sweep.json")
    if on_tpu and os.path.exists(sweep_path):
        with open(sweep_path) as fh:
            sweep = json.load(fh)
        best = pick_quality_matched_rung(sweep)
        if best and best[:2] != (cfg.N_samples, cfg.N_importance):
            s_qm, imp_qm, rung, delta = best
            import dataclasses as _dc

            cfg_qm = _dc.replace(cfg, N_samples=s_qm, N_importance=imp_qm)
            qm_masked = make_pruned_frame_renderer(
                nerf_cfg, H, W, focal, near, far, cfg_qm.render_config(),
                cx=cx, cy=cy, tile=(H * W) // 12,
                keep_fraction=keep_masked, compute_dtype=compute_dtype,
                prior_mask=mask_dev, k_coarse=k_coarse,
            )
            qm_comp = make_composite_fast_renderer(
                nerf_cfg, torso_cfg, H, W, focal, near, far,
                cfg_qm.render_config(), cx=cx, cy=cy,
                compute_dtype=compute_dtype,
                prior_mask_head=jnp.asarray(mask_h),
                prior_mask_torso=jnp.asarray(mask_t),
                keep_head=keep_masked, keep_torso=keep_masked,
            )
            qm = {
                "rung": rung, "delta_db_on_converged_model": delta,
                "fps_prior_masked": round(timed(qm_masked), 3),
                "fps_head_torso_composite": round(timed_comp(qm_comp), 3),
            }

    # 8. temporal quality gates — scripts/temporal_delta.py measures, on
    # the converged rehearsal checkpoints over a sequential val clip, how
    # far the keyframe+delta video renderer drifts from the per-frame
    # full render. Only when that measurement exists AND holds at the
    # timed operating point do the temporal fps rows count toward the
    # best-mode numbers below (gates computed in section 6).
    comp_video_ok = bool(
        temporal_quality and temporal_quality["comp"]["quality_ok"])
    head_video_ok = bool(
        temporal_quality and temporal_quality["head"]["quality_ok"])

    # best-mode rollups: every candidate beyond the directly-timed modes
    # is gated on a measured quality delta from a converged checkpoint
    comp_candidates = [fps_comp_fast]
    if qm:
        comp_candidates.append(qm["fps_head_torso_composite"])
    if comp_video_ok and fps_temporal_video:
        comp_candidates.append(fps_temporal_video)
    fps_comp_best = max(comp_candidates)

    head_candidates = [fps_full, fps_pruned, fps_masked]
    if qm:
        head_candidates.append(qm["fps_prior_masked"])
    if head_video_ok and fps_temporal_head_video:
        head_candidates.append(fps_temporal_head_video)
    fps = max(head_candidates)
    rays_per_sec = fps * H * W
    baseline_fps = 25.0
    print(
        json.dumps(
            {
                "metric": "render_fps_450p_64+192_best_mode",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 3),
                "extra": {
                    "fps_full_fidelity": round(fps_full, 3),
                    "full_mode_pallas": str(use_pallas),
                    "fps_fg_pruned": round(fps_pruned, 3),
                    "fps_prior_masked": round(fps_masked, 3),
                    "fps_head_torso_composite_full": round(fps_comp, 3),
                    "fps_head_torso_composite_fast": round(fps_comp_fast, 3),
                    "fps_head_torso_composite_best": round(fps_comp_best, 3),
                    "composite_fast_ran": comp_fast_ran,
                    "fps_head_torso_temporal_video": (
                        round(fps_temporal_video, 3)
                        if fps_temporal_video else None),
                    "fps_head_torso_temporal_video_loop": (
                        round(fps_temporal_video_loop, 3)
                        if fps_temporal_video_loop else None),
                    "fps_head_torso_temporal_delta": (
                        round(fps_temporal_delta, 3)
                        if fps_temporal_delta else None),
                    "fps_head_temporal_video": (
                        round(fps_temporal_head_video, 3)
                        if fps_temporal_head_video else None),
                    "fps_head_temporal_video_loop": (
                        round(fps_temporal_head_video_loop, 3)
                        if fps_temporal_head_video_loop else None),
                    "fps_head_temporal_delta": (
                        round(fps_temporal_head_delta, 3)
                        if fps_temporal_head_delta else None),
                    "quality_matched": qm,
                    "temporal_quality": temporal_quality,
                    "prior_mask_source": mask_src,
                    "prior_mask_coverage": round(mask_coverage, 4),
                    "prior_coverage_head": round(cov_h, 4),
                    "prior_coverage_torso": round(cov_t, 4),
                    "keep_fraction": keep,
                    "rays_per_sec": int(rays_per_sec),
                    "frame_hw": H,
                    "sample_schedule": f"{cfg.N_samples}+{cfg.N_importance}",
                    "backend": jax.default_backend(),
                    "compute_dtype": str(compute_dtype),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
