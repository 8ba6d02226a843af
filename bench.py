"""Benchmark: full-frame 450² hierarchical (64+192-sample) conditioned
FaceNeRF render — the reference's FPS-critical eval path
(eval_aud_exp_nerf.py: 450²×256 ≈ 51.8M conditioned-MLP point evals per
frame, muxed at 25 fps).

TIMEOUT-PROOF DESIGN (round-4): the claim-bearing modes (quality-gated
temporal composite / temporal head / composite fast / quality-matched)
run FIRST, and an updated headline JSON line is printed after EVERY
mode — so a driver that kills the process mid-run still captures the
best-so-far number from the tail of stdout. Each mode is wrapped in
try/except and skipped once the wall-clock budget (BENCH_BUDGET_S,
default 1500 s) is exhausted. The LAST printed JSON line is always the
most complete measurement.

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

# Operating-point selection lives in the package
# (idealnerf_tpu/eval/operating_points.py) so eval_reenact
# --auto_temporal and this bench read the same gated configs; names
# re-exported here for callers/tests that import them from bench.
from idealnerf_tpu.eval.operating_points import (  # noqa: F401
    TEMPORAL_EVIDENCE_FILES, load_temporal_evidence, pick_masked_point,
    pick_quality_matched_rung, pick_temporal_mode_configs,
    pick_temporal_points,
)

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _elapsed():
    return time.perf_counter() - T_START


def _budget_left():
    return BUDGET_S - _elapsed()


class BenchState:
    """Accumulates per-mode results; emit() prints the headline JSON
    line reflecting everything measured so far (the driver tails stdout,
    so the last line printed before any timeout is what lands)."""

    def __init__(self, H, backend, compute_dtype, schedule):
        self.x = {
            "fps_full_fidelity": None,
            "full_mode_pallas": None,
            "fps_fg_pruned": None,
            "fps_prior_masked": None,
            "fps_head_torso_composite_full": None,
            "fps_head_torso_composite_fast": None,
            "fps_head_torso_composite_best": None,
            "composite_fast_ran": False,
            "fps_head_torso_temporal_video": None,
            "fps_head_torso_temporal_video_loop": None,
            "fps_head_torso_temporal_delta": None,
            "fps_head_temporal_video": None,
            "fps_head_temporal_video_loop": None,
            "fps_head_temporal_delta": None,
            "quality_matched": None,
            "masked_point": None,
            "temporal_quality": None,
            "prior_mask_source": None,
            "prior_mask_coverage": None,
            "prior_coverage_head": None,
            "prior_coverage_torso": None,
            "keep_fraction": None,
            "rays_per_sec": None,
            "frame_hw": H,
            "sample_schedule": schedule,
            "backend": backend,
            "compute_dtype": str(compute_dtype),
            "elapsed_s": 0,
            "modes_skipped": [],
        }
        self.H = H

    def comp_video_ok(self):
        tq = self.x["temporal_quality"]
        return bool(tq and tq["comp"]["quality_ok"])

    def head_video_ok(self):
        tq = self.x["temporal_quality"]
        return bool(tq and tq["head"]["quality_ok"])

    def emit(self):
        x = self.x
        # best-mode rollups: every candidate beyond the directly-timed
        # modes is gated on a measured quality delta from a converged
        # checkpoint (see section comments below)
        comp_candidates = [v for v in (x["fps_head_torso_composite_fast"],)
                           if v]
        qm = x["quality_matched"]
        if qm and qm.get("fps_head_torso_composite"):
            comp_candidates.append(qm["fps_head_torso_composite"])
        if self.comp_video_ok() and x["fps_head_torso_temporal_video"]:
            comp_candidates.append(x["fps_head_torso_temporal_video"])
        x["fps_head_torso_composite_best"] = (
            round(max(comp_candidates), 3) if comp_candidates else None)

        head_candidates = [
            v for v in (x["fps_full_fidelity"], x["fps_fg_pruned"],
                        x["fps_prior_masked"]) if v]
        if qm and qm.get("fps_prior_masked"):
            head_candidates.append(qm["fps_prior_masked"])
        if self.head_video_ok() and x["fps_head_temporal_video"]:
            head_candidates.append(x["fps_head_temporal_video"])

        candidates = head_candidates + comp_candidates
        fps = max(candidates) if candidates else 0.0
        x["rays_per_sec"] = int(fps * self.H * self.H)
        x["elapsed_s"] = round(_elapsed(), 1)
        baseline_fps = 25.0
        full = {
            "metric": "render_fps_450p_64+192_best_mode",
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / baseline_fps, 3),
            "extra": x,
        }
        # Full evidence dump: stderr + runs/bench_live.json — NEVER the
        # final stdout line. The driver keeps only a 2000-char tail of
        # stdout; rounds 3 and 4 both lost the headline because the
        # evidence payload (~4.6 KB on one line) overflowed that tail.
        print(json.dumps(full), file=sys.stderr, flush=True)
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            os.makedirs(os.path.join(here, "runs"), exist_ok=True)
            with open(os.path.join(here, "runs", "bench_live.json"),
                      "w") as fh:
                json.dump(full, fh, indent=1)
        except OSError:
            pass
        # Compact headline LAST on stdout (≤ ~400 chars): the driver
        # parses the last JSON line of the stdout tail.
        tq = x["temporal_quality"] or {}
        compact = {
            "metric": "render_fps_450p_64+192_best_mode",
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / baseline_fps, 3),
            "fps_head_temporal": x["fps_head_temporal_video"],
            "fps_composite_temporal": x["fps_head_torso_temporal_video"],
            "fps_composite_best": x["fps_head_torso_composite_best"],
            "fps_prior_masked": x["fps_prior_masked"],
            "fps_full": x["fps_full_fidelity"],
            "head_gate_ok": self.head_video_ok(),
            "comp_gate_ok": self.comp_video_ok(),
            "hw": self.H,
            "backend": x["backend"],
            "elapsed_s": x["elapsed_s"],
        }
        line = json.dumps(compact)
        assert len(line) < 900, f"headline too long ({len(line)} chars)"
        print(line, flush=True)


def _mode(state, name, min_budget_s, fn):
    """Run one benchmark mode with budget + exception guards, then emit
    the updated headline."""
    if _budget_left() < min_budget_s:
        state.x["modes_skipped"].append(name)
        print(f"# skip {name}: {_budget_left():.0f}s left "
              f"< {min_budget_s}s needed", file=sys.stderr)
        return
    try:
        fn()
    except Exception as e:
        state.x["modes_skipped"].append(name)
        print(f"# mode {name} failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    state.emit()


def main():
    import numpy as np

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.eval.renderer import (
        foreground_prior, foreground_prior_fields, make_frame_renderer,
        render_frame_prior_masked, render_frame_pruned,
    )
    from idealnerf_tpu.models.face_nerf import init_face_nerf, make_field_fn

    on_tpu = jax.default_backend() == "tpu"
    # CPU fallback (driver runs this on a real chip): shrink the frame so
    # a no-TPU environment still produces a comparable-shape JSON line
    H = W = int(os.environ.get("BENCH_H", "450" if on_tpu else "96"))
    focal = 1200.0 if on_tpu else 256.0
    cx = cy = H / 2.0
    near, far = 0.5772005200386048, 1.1772005200386046  # May (README.md:46-47)

    cfg = ExperimentConfig(
        dim_aud=64, dim_expr=79, dim_latent=32,
        N_samples=int(os.environ.get("BENCH_SAMPLES", "64")),
        N_importance=int(os.environ.get("BENCH_IMPORTANCE", "128")),
    )
    nerf_cfg = cfg.face_nerf_config()
    compute_dtype = jnp.bfloat16 if on_tpu else None
    n_frames = int(os.environ.get("BENCH_FRAMES", "4"))
    keep = float(os.environ.get("BENCH_KEEP", "0.4"))
    # masked budget: the measured-gated cheapest point from the
    # rehearsal quality study (runs/rehearsal2/results.json) when
    # present — frame-basis keep + optionally the parse-silhouette
    # prior, each row gated at ≤0.05 dB vs the full render on the
    # converged checkpoint; BENCH_KEEP_MASKED overrides.
    keep_masked = 0.4
    masked_kind = "rect"
    masked_point_delta = None
    res_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "runs", "rehearsal2", "results.json")
    if os.path.exists(res_path):
        try:
            with open(res_path) as fh:
                mp = pick_masked_point(json.load(fh))
            if mp:
                keep_masked, masked_kind, masked_point_delta = mp
        except Exception as e:
            print(f"# masked-point pick failed: {e}", file=sys.stderr)
    if "BENCH_KEEP_MASKED" in os.environ:
        keep_masked = float(os.environ["BENCH_KEEP_MASKED"])
        masked_kind = "rect"
        masked_point_delta = None
    masked_hp = masked_kind == "hp"

    state = BenchState(H, jax.default_backend(), compute_dtype,
                       f"{cfg.N_samples}+{cfg.N_importance}")
    state.x["keep_fraction"] = keep

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

    torso_cfg = ExperimentConfig(
        dim_aud=cfg.dim_aud_body + 42, dim_expr=0, dim_latent=0,
        N_samples=cfg.N_samples, N_importance=cfg.N_importance,
    ).face_nerf_config()
    torso_params = {
        "coarse": init_face_nerf(jax.random.PRNGKey(7), torso_cfg),
        "fine": init_face_nerf(jax.random.PRNGKey(8), torso_cfg),
    }
    signal = jax.random.normal(ks[5], (cfg.dim_aud_body + 42,))

    def timed(render, warm=3):
        # NOTE: through the axon remote tunnel block_until_ready() can
        # return before device execution finishes; accumulate frames and
        # fetch to host so timing covers real execution. Warm rounds:
        # the remote relay inflates the first executions of every new
        # executable (a time-based ramp, not just the first call).
        for _ in range(warm):
            frame = render(params, pose, bc, aud=aud, expr=expr,
                           latent=latent)
            float(frame.mean())
        t0 = time.perf_counter()
        acc = None
        for i in range(n_frames):
            frame = render(params, pose, bc, aud=aud + 0.01 * i, expr=expr,
                           latent=latent)
            acc = frame if acc is None else acc + frame
        float(acc.mean())
        return n_frames / (time.perf_counter() - t0)

    def timed_comp(render, warm=3):
        def call():
            return render(params, torso_params, pose, pose, bc,
                          aud=aud, signal=signal, expr=expr, latent=latent)
        for _ in range(warm):
            float(call().mean())
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_frames):
            f = call()
            acc = f if acc is None else acc + f
        float(acc.mean())
        return n_frames / (time.perf_counter() - t0)

    # ---- subject prior masks (shared by every fast mode) -------------
    # Rays outside the subject's foreground prior (union of face rects +
    # torso parse masks — the quantities the offline pipeline produces,
    # audio_exp_nerf.py:163-187) skip all network work. Derived FROM DATA
    # via eval.renderer.foreground_prior: from the on-disk rehearsal
    # subject when present (real parse maps, runs/rehearsal2), else from
    # a 450² synthetic subject's parse masks/face rects.
    here = os.path.dirname(os.path.abspath(__file__))
    mask = mask_src = None
    rehearsal_dir = os.path.join(here, "runs", "rehearsal2")
    if on_tpu and os.path.isdir(os.path.join(rehearsal_dir, "parsing")):
        try:
            from idealnerf_tpu.data.dataset import load_transforms_dataset

            ds_prior = load_transforms_dataset(
                rehearsal_dir, mode="train", skip=10, max_frames=24)
            if ds_prior.hw == (H, W):
                mask, k_coarse = foreground_prior(ds_prior)
                mask_src = "rehearsal2_parse"
        except Exception as e:  # missing/partial run dir: fall through
            print(f"# prior from rehearsal2 failed: {e}", file=sys.stderr)
    if mask is None:
        from idealnerf_tpu.data.synthetic import make_synthetic_dataset

        ds_prior = make_synthetic_dataset(
            n_frames=6, H=H, W=W, dim_expr=8, with_torso=True)
        mask, k_coarse = foreground_prior(ds_prior)
        mask_src = "synthetic_parse"
    mask_dev = jnp.asarray(mask)
    state.x["prior_mask_source"] = mask_src
    state.x["prior_mask_coverage"] = round(float(np.asarray(mask).mean()), 4)

    # masked-mode prior at the gated point (parse silhouette / field
    # occupancy when the quality study gated it)
    mask_m_dev, k_m = mask_dev, k_coarse
    if masked_hp:
        try:
            m_hp, k_hp = foreground_prior(ds_prior, head_parse=True)
            mask_m_dev, k_m = jnp.asarray(m_hp), k_hp
        except Exception as e:
            print(f"# hp prior failed: {e}", file=sys.stderr)
            masked_kind, masked_hp = "rect", False
    elif masked_kind == "occ":
        # the zero-mass cut mask is a TRAINED-field artifact: cached by
        # render_val --occ_prior beside the gated checkpoint
        # (cached_occupancy_prior); bench's random timing params can't
        # recompute it
        import glob as _glob

        occs = sorted(_glob.glob(os.path.join(
            here, "runs", "rehearsal2", "logs", "rehearsal_head200",
            "ckpt", "occ_prior_*.npy")))
        if occs and mask_src == "rehearsal2_parse":
            m_occ = np.load(occs[-1])
            if m_occ.shape == (H, W):
                k_occ = int(m_occ.sum())
                k_m = min(H * W, ((k_occ + 255) // 256) * 256)
                mask_m_dev = jnp.asarray(m_occ)
                occ_np = m_occ
            else:
                masked_kind = "rect"
        else:
            masked_kind = "rect"
    state.x["masked_point"] = {
        "keep": keep_masked, "prior_kind": masked_kind,
        "delta_db_on_converged_model": masked_point_delta,
        "coverage": round(float(np.asarray(mask_m_dev).mean()), 4)}

    try:
        mask_h, mask_t = foreground_prior_fields(ds_prior)
    except Exception:
        mask_h = mask_t = np.asarray(mask)
    # Zero-mass cut for the PER-FRAME composite modes' head field: rays
    # where the trained head field carries no mass composite the plate
    # for the head layer — the same exactness argument as the parse
    # prior. The temporal modes keep the exact prior their quality gate
    # was measured with; the torso field keeps its parse prior (the occ
    # mask was probed on the head field).
    mask_h_pf = (np.asarray(mask_h) & occ_np if masked_kind == "occ"
                 else mask_h)
    state.x["prior_coverage_head"] = round(float(np.asarray(mask_h).mean()), 4)
    state.x["prior_coverage_head_perframe"] = round(
        float(np.asarray(mask_h_pf).mean()), 4)
    state.x["prior_coverage_torso"] = round(
        float(np.asarray(mask_t).mean()), 4)

    # ---- temporal operating points (host-side, instant) --------------
    # Per-mode operating point (refresh interval, s_delta, keyframe rung,
    # per-field delta_keep) = the quality-holding configuration with the
    # largest keyframe interval and cheapest s_delta across every
    # scripts/temporal_delta.py evidence file. Timing is
    # content-independent (static shapes), so random fields measure real
    # fps; the quality contract is measured on trained checkpoints.
    default_sd = int(os.environ.get("BENCH_S_DELTA", "32"))
    default_refresh = int(os.environ.get("BENCH_REFRESH", "25"))
    comp_conf = head_conf = None
    if on_tpu:
        try:
            cands = load_temporal_evidence(
                os.path.join(here, "runs", "rehearsal2_com"))
            state.x["temporal_quality"] = pick_temporal_mode_configs(
                cands, default_sd, default_refresh)
            comp_conf = state.x["temporal_quality"]["comp"]
            head_conf = state.x["temporal_quality"]["head"]
        except Exception as e:
            print(f"# temporal evidence load failed: {e}", file=sys.stderr)
    state.emit()  # first (empty-modes) line: schema lands even on a crash

    import dataclasses as _dc

    def cfg_at(rung):
        if not rung:
            return cfg
        s_kf, imp_kf = map(int, rung.split("+"))
        return _dc.replace(cfg, N_samples=s_kf, N_importance=imp_kf)

    # ================= MODE 1 (claim-bearing): temporal composite =====
    # Temporal depth-cache composite (eval/temporal.py) — the VIDEO
    # renderer: keyframes every `refresh` frames pay the full
    # hierarchical schedule on the prior rays; frames in between
    # resample each ray only inside its cached foreground depth band at
    # s_delta samples/ray; per-field delta_keep freezes weak-foreground
    # rays at keyframe quality (kt1: the static-pose torso is frozen
    # between keyframes). This is the 25-fps north-star passer.
    def run_temporal_comp():
        from idealnerf_tpu.eval.temporal import (
            make_temporal_composite_renderer,
        )

        refresh = comp_conf["refresh"]
        s_delta = comp_conf["s_delta"]
        dk = comp_conf.get("delta_keep", 1.0)
        mh_c, mt_c = mask_h, mask_t
        if comp_conf.get("head_parse"):
            # the gated point was measured with parse-silhouette priors
            mh_c, mt_c = foreground_prior_fields(ds_prior, head_parse=True)
        render_temporal = make_temporal_composite_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg_at(comp_conf["keyframe_rung"]).render_config(),
            cx=cx, cy=cy, compute_dtype=compute_dtype,
            prior_mask_head=jnp.asarray(mh_c),
            prior_mask_torso=jnp.asarray(mt_c), s_delta=s_delta,
            delta_keep_head=dk,
            delta_keep_torso=(comp_conf.get("delta_keep_torso") or dk),
            s_delta_torso=comp_conf.get("s_delta_torso"),
            uni_frac=comp_conf.get("uni_frac", 0.25),
            kf_blend=comp_conf.get("kf_blend", 0.0),
            freeze_z_torso=comp_conf.get("freeze_z_torso", False),
            dilate_every=comp_conf.get("dilate_every", 1),
            roll_k_torso=comp_conf.get("roll_k_torso", 0) or 0,
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
        # refresh-1 delta frames), accumulate-then-fetch, per-frame loop
        t0 = time.perf_counter()
        acc, cache = None, None
        for i in range(refresh):
            f, cache = tcall(None if i == 0 else cache)
            acc = f if acc is None else acc + f
        float(acc.mean())
        loop_fps = refresh / (time.perf_counter() - t0)
        state.x["fps_head_torso_temporal_video_loop"] = round(loop_fps, 3)
        # until the scanned-cycle program lands, quote the loop number
        state.x["fps_head_torso_temporal_video"] = round(loop_fps, 3)
        state.emit()  # land the north-star number NOW

        # steady-state delta-frame fps (per-frame loop)
        t0 = time.perf_counter()
        acc = None
        for _ in range(max(n_frames, 8)):
            f, cache = tcall(cache)
            acc = f if acc is None else acc + f
        float(acc.mean())
        state.x["fps_head_torso_temporal_delta"] = round(
            max(n_frames, 8) / (time.perf_counter() - t0), 3)
        state.emit()

        # production video path (cli/eval_reenact.py --cycle, default):
        # each cycle's delta frames after the first run as ONE scanned
        # program — identical frames (equivalence-tested), one dispatch
        # + one bulk fetch per cycle
        # roll_k_torso has no scanned-cycle program (3 pallas launches
        # per scanned program exceeds the axon budget) — the per-frame
        # loop number above IS the production path there
        T_cyc = refresh - 2
        if (T_cyc > 0 and _budget_left() > 120
                and not comp_conf.get("roll_k_torso")):
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
            state.x["fps_head_torso_temporal_video"] = round(
                3 * refresh / (time.perf_counter() - t0), 3)

    # ================= MODE 2 (claim-bearing): temporal head ==========
    # Head-only temporal video (the single-field eval_aud_exp_nerf.py:437
    # workload) under the same subject prior as the masked mode.
    def run_temporal_head():
        from idealnerf_tpu.eval.temporal import make_temporal_frame_renderer

        refresh_h = head_conf["refresh"]
        mask_head_mode = mask_dev
        if head_conf.get("head_parse"):
            m_hp, _ = foreground_prior(ds_prior, head_parse=True)
            mask_head_mode = jnp.asarray(m_hp)
        render_th = make_temporal_frame_renderer(
            nerf_cfg, H, W, focal, near, far,
            cfg_at(head_conf["keyframe_rung"]).render_config(),
            cx=cx, cy=cy, compute_dtype=compute_dtype,
            prior_mask=mask_head_mode, s_delta=head_conf["s_delta"],
            delta_keep=head_conf.get("delta_keep", 1.0),
            uni_frac=head_conf.get("uni_frac", 0.25),
            kf_blend=head_conf.get("kf_blend", 0.0),
            dilate_every=head_conf.get("dilate_every", 1),
        )

        def hcall(cache):
            return render_th(params, pose, bc, aud=aud, expr=expr,
                             latent=latent, cache=cache)

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
        loop_fps = refresh_h / (time.perf_counter() - t0)
        state.x["fps_head_temporal_video_loop"] = round(loop_fps, 3)
        state.x["fps_head_temporal_video"] = round(loop_fps, 3)
        state.emit()

        t0 = time.perf_counter()
        acc = None
        for _ in range(max(n_frames, 8)):
            f, hc = hcall(hc)
            acc = f if acc is None else acc + f
        float(acc.mean())
        state.x["fps_head_temporal_delta"] = round(
            max(n_frames, 8) / (time.perf_counter() - t0), 3)
        state.emit()

        # scanned-cycle head video (production path)
        T_h = refresh_h - 2
        if T_h > 0 and _budget_left() > 120:
            xs_h = dict(poses=jnp.tile(pose[None], (T_h, 1, 1)),
                        auds=jnp.tile(aud[None], (T_h, 1)),
                        exprs=jnp.tile(expr[None], (T_h, 1)),
                        latents=jnp.tile(latent[None], (T_h, 1)))

            def hccall(c):
                return render_th.cycle(
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
            state.x["fps_head_temporal_video"] = round(
                3 * refresh_h / (time.perf_counter() - t0), 3)

    # head first: two compiled programs vs the composite's four, so the
    # biggest gated number (48+ fps head video) lands earliest; the
    # composite's 25-fps north-star row follows
    if on_tpu and head_conf:
        _mode(state, "temporal_head", 60, run_temporal_head)
    if on_tpu and comp_conf:
        _mode(state, "temporal_composite", 60, run_temporal_comp)

    # ================= MODE 3: composite FAST =========================
    # Per-FIELD priors (head: face rects; torso: parse silhouette) +
    # per-field opacity pruning, head ranking occlusion-weighted by the
    # torso's coarse transmittance (eval/renderer.
    # make_composite_fast_renderer).
    def run_comp_fast():
        from idealnerf_tpu.eval.renderer import make_composite_fast_renderer

        render_comp_fast = make_composite_fast_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg.render_config(), cx=cx, cy=cy,
            compute_dtype=compute_dtype,
            prior_mask_head=jnp.asarray(mask_h_pf),
            prior_mask_torso=jnp.asarray(mask_t),
            keep_head=keep_masked, keep_torso=keep_masked,
        )
        state.x["fps_head_torso_composite_fast"] = round(
            timed_comp(render_comp_fast), 3)
        state.x["composite_fast_ran"] = True

    if on_tpu:
        _mode(state, "composite_fast", 90, run_comp_fast)

    # ================= MODE 4: quality-matched reduced rung ===========
    # EVIDENCE-GATED: only when scripts/sample_sweep.py has measured (on
    # the converged rehearsal checkpoint) that a cheaper rung holds
    # quality within 0.05 dB of the paper 64+192 schedule.
    def run_qm():
        from idealnerf_tpu.eval.renderer import (
            make_composite_fast_renderer, make_pruned_frame_renderer,
        )

        sweep_path = os.path.join(
            here, "runs", "rehearsal2", "sample_sweep.json")
        if not os.path.exists(sweep_path):
            return
        with open(sweep_path) as fh:
            sweep = json.load(fh)
        best = pick_quality_matched_rung(sweep)
        if not best or best[:2] == (cfg.N_samples, cfg.N_importance):
            return
        s_qm, imp_qm, rung, delta = best
        cfg_qm = _dc.replace(cfg, N_samples=s_qm, N_importance=imp_qm)
        qm_masked = make_pruned_frame_renderer(
            nerf_cfg, H, W, focal, near, far, cfg_qm.render_config(),
            cx=cx, cy=cy, tile=(H * W) // 12,
            keep_fraction=keep_masked, compute_dtype=compute_dtype,
            prior_mask=mask_m_dev, k_coarse=k_m,
        )
        qm_fps_masked = round(timed(qm_masked), 3)
        state.x["quality_matched"] = {
            "rung": rung, "delta_db_on_converged_model": delta,
            "fps_prior_masked": qm_fps_masked,
        }
        state.emit()
        qm_comp = make_composite_fast_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg_qm.render_config(), cx=cx, cy=cy,
            compute_dtype=compute_dtype,
            prior_mask_head=jnp.asarray(mask_h_pf),
            prior_mask_torso=jnp.asarray(mask_t),
            keep_head=keep_masked, keep_torso=keep_masked,
        )
        state.x["quality_matched"]["fps_head_torso_composite"] = round(
            timed_comp(qm_comp), 3)

    if on_tpu:
        _mode(state, "quality_matched", 90, run_qm)

    # ================= MODE 5: prior-masked (paper rung) ==============
    # Fine budget normalized to mask coverage (round-4 starvation fix).
    def run_masked():
        if on_tpu:
            from idealnerf_tpu.eval.renderer import (
                make_pruned_frame_renderer,
            )

            render_masked = make_pruned_frame_renderer(
                nerf_cfg, H, W, focal, near, far, cfg.render_config(),
                cx=cx, cy=cy, tile=(H * W) // 12,
                keep_fraction=keep_masked, compute_dtype=compute_dtype,
                prior_mask=mask_m_dev, k_coarse=k_m,
            )
        else:
            @jax.jit
            def render_masked(params, pose, bc_img, aud=None, expr=None,
                              latent=None):
                cf = make_field_fn(params["coarse"], nerf_cfg, aud, expr,
                                   latent, compute_dtype=compute_dtype)
                ff = make_field_fn(params["fine"], nerf_cfg, aud, expr,
                                   latent, compute_dtype=compute_dtype)
                return render_frame_prior_masked(
                    cf, ff, H, W, focal, pose, bc_img, near, far,
                    cfg.render_config(), mask_m_dev, k_m, cx=cx, cy=cy,
                    keep_fraction=keep_masked,
                )

        state.x["fps_prior_masked"] = round(timed(render_masked), 3)

    _mode(state, "prior_masked", 90, run_masked)

    # ================= MODE 6: fg-pruned (paper rung) =================
    def run_pruned():
        if on_tpu:
            from idealnerf_tpu.eval.renderer import (
                make_pruned_frame_renderer,
            )

            render_pruned = make_pruned_frame_renderer(
                nerf_cfg, H, W, focal, near, far, cfg.render_config(),
                cx=cx, cy=cy, tile=(H * W) // 12, keep_fraction=keep,
                compute_dtype=compute_dtype,
            )
        else:
            @jax.jit
            def render_pruned(params, pose, bc_img, aud=None, expr=None,
                              latent=None):
                cf = make_field_fn(params["coarse"], nerf_cfg, aud, expr,
                                   latent, compute_dtype=compute_dtype)
                ff = make_field_fn(params["fine"], nerf_cfg, aud, expr,
                                   latent, compute_dtype=compute_dtype)
                return render_frame_pruned(
                    cf, ff, H, W, focal, pose, bc_img, near, far,
                    cfg.render_config(), cx=cx, cy=cy, tile=(H * W) // 12,
                    keep_fraction=keep,
                )

        state.x["fps_fg_pruned"] = round(timed(render_pruned), 3)

    _mode(state, "fg_pruned", 120, run_pruned)

    # ================= MODE 7: composite full fidelity ================
    # Two full hierarchical field renders per frame (test_torso.py:
    # 513-534 workload) — slow (~1.2 s/frame); runs late so it can't
    # starve the claim-bearing modes.
    def run_comp_full():
        from idealnerf_tpu.eval.renderer import make_composite_frame_renderer

        render_comp = make_composite_frame_renderer(
            nerf_cfg, torso_cfg, H, W, focal, near, far,
            cfg.render_config(), cx=cx, cy=cy, compute_dtype=compute_dtype,
            use_pallas="ray" if on_tpu else False, tile=(H * W) // 12,
        )
        state.x["fps_head_torso_composite_full"] = round(
            timed_comp(render_comp, warm=2), 3)

    _mode(state, "composite_full", 180, run_comp_full)

    # ================= MODE 8: full fidelity ==========================
    # Full-frame 450² hierarchical render, per-ray fused Pallas kernel
    # with in-kernel compositing ("ray", 105 TF/s on the fine pass —
    # kernels/fused_render.py). BENCH_PALLAS=0 forces the XLA path,
    # =1 the per-point fused-MLP kernel. ~0.7 s/frame: runs last.
    def run_full():
        mode_env = os.environ.get("BENCH_PALLAS", "ray")
        use_pallas = {"0": False, "1": True, "ray": "ray"}.get(
            mode_env, "ray")
        if not on_tpu:
            use_pallas = False
        render_full = make_frame_renderer(
            nerf_cfg, H, W, focal, near, far, cfg.render_config(),
            cx=cx, cy=cy, tile=(H * W) // 12,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        )
        state.x["full_mode_pallas"] = str(use_pallas)
        state.x["fps_full_fidelity"] = round(timed(render_full, warm=2), 3)

    _mode(state, "full_fidelity", 150, run_full)


if __name__ == "__main__":
    main()
