"""CLI smoke tests: the user-facing entry points run end-to-end with
--synthetic at tiny scale (in-process main() calls — same argv surface
as python -m)."""

import os
import sys

import numpy as np
import pytest

COMMON = [
    "--synthetic", "3", "--synthetic_hw", "32",
    "--dim_aud", "64", "--dim_expr", "8", "--dim_latent", "32",
    "--N_rand", "96", "--mouth_rays", "8", "--torso_rays", "8",
    "--N_samples", "6", "--N_importance", "6",
    "--nosmo_iters", "1000000", "--i_print", "5",
    "--density_activation", "softplus",
]


def _args(tmp_path, expname, extra=()):
    return COMMON + ["--basedir", str(tmp_path), "--expname", expname,
                     *extra]


def test_cli_render_val_rejects_inert_flag_combos(tmp_path):
    """--prior_masked without --pruned and --ray_devices with --pruned
    would silently not do what they claim — they must error loudly."""
    from idealnerf_tpu.cli.render_val import main as val_main

    with pytest.raises(SystemExit):
        val_main(_args(tmp_path, "flags", ["--prior_masked", "1"]))
    with pytest.raises(SystemExit):
        val_main(_args(tmp_path, "flags",
                       ["--pruned", "40", "--ray_devices", "8"]))


def test_cli_train_head_then_eval_chain(tmp_path):
    from idealnerf_tpu.cli.eval_reenact import main as eval_main
    from idealnerf_tpu.cli.render_val import main as val_main
    from idealnerf_tpu.cli.train_head import main as train_main

    train_main(_args(tmp_path, "smoke", ["--epochs", "2"]))
    ckpt = str(tmp_path / "smoke" / "ckpt")
    assert os.path.isdir(ckpt)
    assert os.path.exists(tmp_path / "smoke" / "args.txt")
    assert os.path.exists(tmp_path / "smoke" / "metrics.jsonl")

    out = str(tmp_path / "out")
    eval_main(_args(tmp_path, "smoke",
                    ["--head_ckpt", ckpt, "--max_frames", "1",
                     "--save_path", out]))
    assert os.path.getsize(os.path.join(out, "smoke.avi")) > 0

    val_metrics = val_main(_args(tmp_path, "smoke",
                                 ["--head_ckpt", ckpt, "--max_frames", "1",
                                  "--save_path", out]))
    assert np.isfinite(val_metrics["psnr"])
    assert np.isfinite(val_metrics["ssim"])


def test_cli_reenact_auto_temporal(tmp_path):
    """--auto_temporal reads gated evidence and renders a temporal clip
    at the measured configuration; with no gated point it errors."""
    import json

    from idealnerf_tpu.cli.eval_reenact import main as eval_main
    from idealnerf_tpu.cli.train_head import main as train_main

    train_main(_args(tmp_path, "autot", ["--epochs", "1"]))
    ckpt = str(tmp_path / "autot" / "ckpt")

    ev_dir = tmp_path / "evidence"
    ev_dir.mkdir()
    # no evidence at all -> loud error
    with pytest.raises(SystemExit):
        eval_main(_args(tmp_path, "autot",
                        ["--head_ckpt", ckpt, "--max_frames", "1",
                         "--auto_temporal", str(ev_dir)]))
    # gated head point at a tiny keyframe rung -> renders
    with open(ev_dir / "temporal_delta.json", "w") as fh:
        json.dump({"refresh": 3, "keyframe_rung": "6+6",
                   "tightened_bounds": None,
                   "modes": {"head_only_s_delta_6_k60":
                             {"psnr_temporal_vs_full": 44.0}}}, fh)
    out = str(tmp_path / "out_autot")
    eval_main(_args(tmp_path, "autot",
                    ["--head_ckpt", ckpt, "--max_frames", "4",
                     "--save_path", out, "--auto_temporal", str(ev_dir)]))
    assert os.path.getsize(os.path.join(out, "autot.avi")) > 0


def test_cli_train_torso_against_head(tmp_path):
    from idealnerf_tpu.cli.train_head import main as train_main
    from idealnerf_tpu.cli.train_torso import main as torso_main

    train_main(_args(tmp_path, "smoke2", ["--epochs", "1"]))
    torso_main(_args(tmp_path, "smoke2",
                     ["--head_ckpt", str(tmp_path / "smoke2" / "ckpt"),
                      "--steps", "2", "--smooth_audio", "0"]))
    assert os.path.isdir(tmp_path / "smoke2_torso" / "ckpt")


def test_cli_train_second_stage(tmp_path):
    """Second-stage CLI: fine-tune from a head checkpoint with the aux
    landmark loss active (random-init FAN — the weights are env-blocked;
    the reference's active aux term, distribute_nerf.py:487-491)."""
    import idealnerf_tpu.pipeline.fan as fan_mod

    from idealnerf_tpu.cli.train_head import main as train_main
    from idealnerf_tpu.cli.train_second_stage import main as second_main

    train_main(_args(tmp_path, "smoke3", ["--epochs", "1"]))
    old = fan_mod.NUM_MODULES
    fan_mod.NUM_MODULES = 1   # keep the random-init FAN cheap on CPU
    try:
        second_main(_args(
            tmp_path, "smoke3",
            ["--head_ckpt", str(tmp_path / "smoke3" / "ckpt"),
             "--crop", "24", "--steps", "2", "--aux_landmark", "0.1"]))
    finally:
        fan_mod.NUM_MODULES = old
    assert os.path.isdir(tmp_path / "smoke3_second" / "ckpt")
    assert os.path.exists(tmp_path / "smoke3_second" / "metrics.jsonl")


def test_cli_train_baseline(tmp_path):
    from idealnerf_tpu.cli.train_baseline import main

    main(_args(tmp_path, "base", ["--epochs", "1", "--precrop_iters", "2"]))
    assert os.path.isdir(tmp_path / "base" / "ckpt")


def test_cli_process_data_missing_inputs(tmp_path):
    from idealnerf_tpu.cli.process_data import main

    os.makedirs(tmp_path / "subj" / "ori_imgs")
    # no frames at all -> clean error path, no exception
    main(["--id_dir", str(tmp_path / "subj")])


def test_cli_train_head_sharded_mesh(tmp_path):
    """--data_devices/--ray_devices route train_head through the
    ('data','ray') GSPMD mesh (parallel/trainers.ShardedHeadTrainer) on
    the virtual 8-device CPU mesh, and render_val consumes the produced
    checkpoint."""
    import jax

    from idealnerf_tpu.cli.render_val import main as val_main
    from idealnerf_tpu.cli.train_head import main as train_main

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    train_main(_args(tmp_path, "mesh", ["--epochs", "2",
                                        "--data_devices", "2",
                                        "--ray_devices", "4",
                                        "--i_weights", "2"]))
    ckpt = str(tmp_path / "mesh" / "ckpt")
    assert os.path.isdir(ckpt)
    # the sharded trainer logs through the same metrics file
    assert os.path.exists(tmp_path / "mesh" / "metrics.jsonl")
    out = str(tmp_path / "out_mesh")
    val_metrics = val_main(_args(tmp_path, "mesh",
                                 ["--head_ckpt", ckpt, "--max_frames", "1",
                                  "--save_path", out]))
    assert np.isfinite(val_metrics["psnr"])
    # ray-sharded eval through the same CLI matches the plain render
    val_sharded = val_main(_args(tmp_path, "mesh",
                                 ["--head_ckpt", ckpt, "--max_frames", "1",
                                  "--save_path", str(tmp_path / "out_rs"),
                                  "--ray_devices", "8"]))
    assert abs(val_sharded["psnr"] - val_metrics["psnr"]) < 1e-3


def test_cli_train_torso_sharded_mesh(tmp_path):
    import jax

    from idealnerf_tpu.cli.train_head import main as train_main
    from idealnerf_tpu.cli.train_torso import main as torso_main

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    train_main(_args(tmp_path, "mesh2", ["--epochs", "1"]))
    torso_main(_args(tmp_path, "mesh2",
                     ["--head_ckpt", str(tmp_path / "mesh2" / "ckpt"),
                      "--steps", "2", "--smooth_audio", "0",
                      "--data_devices", "2", "--ray_devices", "4"]))
    assert os.path.isdir(tmp_path / "mesh2_torso" / "ckpt")


def test_bench_emit_compact_headline():
    """BenchState.emit's LAST stdout line must survive the driver's
    2000-char stdout tail: compact (<900 chars), JSON-parseable, with
    the evidence dump routed to stderr (BENCH_r03/r04 both lost the
    headline to oversize final lines)."""
    import importlib.util
    import io
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    st = bench.BenchState(450, "tpu", "bf16", "64+192")
    st.x["fps_head_temporal_video"] = 43.2
    st.x["fps_head_torso_temporal_video"] = 38.9
    # oversize evidence payload (the round-4 failure shape)
    st.x["temporal_quality"] = {
        "comp": {"quality_ok": True}, "head": {"quality_ok": True},
        "evidence": [{"modes": {f"m{i}": float(i) for i in range(200)}}]}
    cap, old = io.StringIO(), sys.stdout
    sys.stdout = cap
    try:
        st.emit()
    finally:
        sys.stdout = old
    out = cap.getvalue()
    last = out[-2000:].strip().splitlines()[-1]  # what the driver sees
    assert len(last) < 900
    d = _json.loads(last)
    assert d["value"] == 43.2
    assert d["unit"] == "frames/sec/chip"
    assert abs(d["vs_baseline"] - 43.2 / 25.0) < 1e-6


def test_bench_masked_point_measured_wall_ranking():
    """pick_masked_point prefers the gated row with the smallest
    MEASURED wall_s; cost model only for rows lacking walls (round-4
    regression: the cost model picked the measured-slowest hp row)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    pick = bench.pick_masked_point

    # the round-4 shape: hp at keep=0.28 is cost-model-cheapest but
    # measured-slowest; keep=0.60 is measured-fastest among gated rows
    res = {
        "masked_28_hp": {"wall_s": 68.7}, "delta_psnr_masked_28_hp": 0.001,
        "masked_28": {"wall_s": 37.3}, "delta_psnr_masked_28": 0.001,
        "masked_40": {"wall_s": 45.1}, "delta_psnr_masked_40": 0.001,
        "masked_60": {"wall_s": 35.1}, "delta_psnr_masked_60": 0.002,
    }
    keep, kind, delta = pick(res)
    assert (keep, kind) == (0.60, "rect") and delta == 0.002
    # ungated rows never picked regardless of speed
    res["delta_psnr_masked_60"] = 0.4
    assert pick(res)[:2] == (0.28, "rect")
    # a measured-faster occupancy-cut row wins outright
    res["masked_60_occ"] = {"wall_s": 24.0}
    res["delta_psnr_masked_60_occ"] = 0.003
    assert pick(res)[:2] == (0.60, "occ")
    # wall-less rows rank after every measured row...
    res2 = {"delta_psnr_masked_28_hp": 0.001,
            "masked_40": {"wall_s": 45.1}, "delta_psnr_masked_40": 0.001}
    assert pick(res2)[:2] == (0.40, "rect")
    # ...but the cost model still breaks ties when no walls exist
    # (smaller coarse set first: occ < hp < rect at equal keep)
    res3 = {"delta_psnr_masked_28_hp": 0.001,
            "delta_psnr_masked_40": 0.001}
    assert pick(res3)[:2] == (0.28, "hp")
    res3["delta_psnr_masked_28_occ"] = 0.001
    assert pick(res3)[:2] == (0.28, "occ")
    assert pick({}) is None


def test_bench_quality_matched_rung_selection():
    """bench.pick_quality_matched_rung: cheapest rung within 0.05 dB of
    the paper schedule, tight variants eligible, missing ref -> None."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    pick = bench.pick_quality_matched_rung

    sweep = {
        "64+192": {"delta_psnr_vs_64+192": 0.0},
        "32+64": {"delta_psnr_vs_64+192": 0.03},
        "32+64_tight": {"delta_psnr_vs_64+192": 0.01},
        "16+32": {"delta_psnr_vs_64+192": 0.4},   # too lossy
        "24+48_tight": {"delta_psnr_vs_64+192": 0.04},
    }
    s, imp, rung, delta = pick(sweep)
    assert (s, imp) == (24, 48) and rung == "24+48_tight"
    assert pick({"48+96": {"delta_psnr_vs_48+96": 0.0}}) is None
    # nothing within tolerance except the reference itself
    only_ref = {"64+192": {"delta_psnr_vs_64+192": 0.0},
                "16+32": {"delta_psnr_vs_64+192": 1.0}}
    assert pick(only_ref)[:2] == (64, 192)


def test_bench_temporal_operating_point_selection():
    """bench.pick_temporal_points: cheapest quality-holding s_delta per
    mode, gates closed when evidence is missing or at another refresh."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    td = {
        "refresh": 25,
        "keyframe_rung": "32+64",
        "modes": {
            "s_delta_32": {"delta_psnr_vs_gt": 0.02,
                           "psnr_temporal_vs_full": 43.1},
            "head_only_s_delta_32": {"psnr_temporal_vs_full": 41.0},
            "s_delta_16": {"delta_psnr_vs_gt": 0.04,
                           "psnr_temporal_vs_full": 40.2},
            "head_only_s_delta_16": {"psnr_temporal_vs_full": 31.0},
        },
    }
    tq = bench.pick_temporal_points(td, 25)
    # composite holds at both points -> cheapest (16); head only at 32
    assert tq["keyframe_rung"] == "32+64"
    assert tq["s_delta_comp"] == 16 and tq["composite_video_quality_ok"]
    assert tq["s_delta_head"] == 32 and tq["head_video_quality_ok"]
    assert tq["composite_delta_db_vs_gt"]["s_delta_32"] == 0.02
    # evidence measured at refresh 25 does not cover refresh 50
    tq50 = bench.pick_temporal_points(td, 50)
    assert tq50["keyframe_rung"] is None  # wrong refresh -> rung unusable
    assert not tq50["composite_video_quality_ok"]
    assert not tq50["head_video_quality_ok"]
    assert tq50["s_delta_comp"] == 32  # env default fallback
    # no evidence at all
    tq0 = bench.pick_temporal_points(None, 25, default_s_delta=24)
    assert tq0["s_delta_comp"] == 24 and not tq0["composite_video_quality_ok"]

    # per-field torso keep grammar (kt): parsed, costed per field,
    # reported back as delta_keep_torso_comp
    td_kt = {
        "refresh": 25,
        "keyframe_rung": "16+32",
        "modes": {
            "s_delta_32_k60": {"delta_psnr_vs_gt": 0.03},
            "s_delta_32t16_k60_kt40": {"delta_psnr_vs_gt": 0.04},
        },
    }
    tqkt = bench.pick_temporal_points(td_kt, 25)
    # cost: 32*.6 both fields = 19.2 vs (32*.6 + 16*.4)/2 = 12.8 -> the
    # asymmetric point is cheaper and wins
    assert tqkt["composite_video_quality_ok"]
    assert tqkt["s_delta_comp"] == 32
    assert tqkt["s_delta_torso_comp"] == 16
    assert tqkt["delta_keep_comp"] == 0.6
    assert tqkt["delta_keep_torso_comp"] == 0.4
    assert "s_delta_32t16_k60_kt40" in tqkt["composite_delta_db_vs_gt"]

    # frozen-z torso grammar (fz): boolean tag, costed at the keyframe
    # grid width for the torso, surfaced as freeze_z_torso_comp
    td_fz = {
        "refresh": 25,
        "keyframe_rung": "16+32",
        "modes": {
            "s_delta_32_k60_kt40_fz": {"delta_psnr_vs_gt": 0.03},
            "s_delta_32_k60": {"delta_psnr_vs_gt": 0.2},
        },
    }
    tqfz = bench.pick_temporal_points(td_fz, 25)
    # cost fz: (5 + 32*.6 + 48*.4)/2 = 21.8 — parses and gates
    assert tqfz["composite_video_quality_ok"]
    assert tqfz["freeze_z_torso_comp"] is True
    assert tqfz["delta_keep_torso_comp"] == 0.4
    assert "s_delta_32_k60_kt40_fz" in tqfz["composite_delta_db_vs_gt"]

    # the per-field FIXED work term (measured 11.2 ms/frame split over
    # the live fields — runs/temporal_profile.json): a frozen-z torso
    # pays none of it, so at equal head config fz outranks a live
    # band-maintained torso even though its nominal grid (keyframe
    # width 48) is wider than s_delta
    td_fx = {
        "refresh": 25,
        "keyframe_rung": "16+32",
        "modes": {
            # cost (5 + 16*.6 + 5 + 16*.01)/2 = 9.88
            "s_delta_16_k60_kt1": {"delta_psnr_vs_gt": 0.03},
            # cost (5 + 16*.6 + 48*.01)/2 = 7.54 -> wins
            "s_delta_16_k60_kt1_fz": {"delta_psnr_vs_gt": 0.04},
        },
    }
    tqfx = bench.pick_temporal_points(td_fx, 25)
    assert tqfx["composite_video_quality_ok"]
    assert tqfx["freeze_z_torso_comp"] is True
    assert tqfx["delta_keep_torso_comp"] == 0.01

    # stacked dilate_every + frozen-z grammar (the production composite
    # point): d2 amortizes the dilation share of the live head's fixed
    # work (DIL, measured from temporal_profile.json's dilation on/off
    # split), so at equal gate the d2 point outranks plain fz
    td_d2 = {
        "refresh": 25,
        "keyframe_rung": "16+32",
        "modes": {
            "s_delta_16_k60_kt1_fz": {"delta_psnr_vs_gt": -0.116},
            "s_delta_16_k60_kt1_d2_fz": {"delta_psnr_vs_gt": -0.755},
            "s_delta_12_k60_kt1_d2_fz": {"delta_psnr_vs_gt": -0.396},
        },
    }
    tqd2 = bench.pick_temporal_points(td_d2, 25)
    assert tqd2["composite_video_quality_ok"]
    assert tqd2["s_delta_comp"] == 12  # cheapest gated: fewer samples + d2
    assert tqd2["dilate_every_comp"] == 2
    assert tqd2["freeze_z_torso_comp"] is True
    assert tqd2["delta_keep_torso_comp"] == 0.01
    assert "s_delta_12_k60_kt1_d2_fz" in tqd2["composite_delta_db_vs_gt"]


def test_bench_temporal_mode_configs_across_files():
    """bench.pick_temporal_mode_configs: per mode, largest quality-
    holding refresh wins; gates independent between modes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    td25 = {
        "refresh": 25, "keyframe_rung": "32+64",
        "tightened_bounds": {"head": [0.8, 1.9]},
        "modes": {
            "s_delta_16": {"delta_psnr_vs_gt": 0.01,
                           "psnr_temporal_vs_full": 45.0},
            "head_only_s_delta_16": {"psnr_temporal_vs_full": 44.0},
        },
    }
    td50 = {
        "refresh": 50, "keyframe_rung": "64+192",
        "modes": {
            # composite holds at 50 only at s_delta 32; head fails at 50
            "s_delta_32": {"delta_psnr_vs_gt": 0.04,
                           "psnr_temporal_vs_full": 41.0},
            "s_delta_16": {"delta_psnr_vs_gt": 0.2,
                           "psnr_temporal_vs_full": 30.0},
            "head_only_s_delta_32": {"psnr_temporal_vs_full": 35.0},
        },
    }
    out = bench.pick_temporal_mode_configs([td25, td50], 32, 25)
    # composite: refresh 50 holds (at s_delta 32, paper keyframes)
    assert out["comp"] == {"quality_ok": True, "refresh": 50,
                           "s_delta": 32, "s_delta_torso": None,
                           "delta_keep": 1.0, "delta_keep_torso": None,
                           "freeze_z_torso": False, "uni_frac": 0.25,
                           "kf_blend": 0.0, "dilate_every": 1,
                           "roll_k_torso": 0, "roll_k": 0,
                           "head_parse": False,
                           "keyframe_rung": "64+192"}
    # head: only refresh 25 holds (s_delta 16, qm keyframes)
    assert out["head"] == {"quality_ok": True, "refresh": 25,
                           "s_delta": 16, "s_delta_torso": None,
                           "delta_keep": 1.0, "delta_keep_torso": None,
                           "freeze_z_torso": False, "uni_frac": 0.25,
                           "kf_blend": 0.0, "dilate_every": 1,
                           "roll_k_torso": 0, "roll_k": 0,
                           "head_parse": False,
                           "keyframe_rung": "32+64"}
    assert len(out["evidence"]) == 2
    assert out["evidence"][0]["tightened"] is True
    # no evidence -> env defaults, gates closed
    out0 = bench.pick_temporal_mode_configs([], 24, 30)
    assert not out0["comp"]["quality_ok"] and out0["comp"]["refresh"] == 30
    assert out0["head"]["s_delta"] == 24


def test_bench_temporal_roll_torso_points():
    """_rt<K>-suffixed modes (temporal_delta.py --roll_k_torso): parse,
    cost model (torso = rung_width/K, no fixed work), and carriage of
    roll_k_torso into the picked composite config."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    td = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {
            # torso delta at s32 ungated; torso refresh-roll gated
            "s_delta_32_k80": {"delta_psnr_vs_gt": 0.4},
            "s_delta_32_k80_rt10": {"delta_psnr_vs_gt": 0.03},
            "head_only_s_delta_32_k80": {"psnr_temporal_vs_full": 55.3},
        },
    }
    tq = bench.pick_temporal_points(td, 25)
    assert tq["composite_video_quality_ok"]
    assert tq["s_delta_comp"] == 32 and tq["delta_keep_comp"] == 0.8
    assert tq["roll_k_torso_comp"] == 10
    assert tq["composite_delta_db_vs_gt"]["s_delta_32_k80_rt10"] == 0.03
    # cost: head fixed+32*0.8 = 31.2; torso rung_width 48/10 = 4.8
    assert abs(tq["cost_comp"] - (5.6 + 32 * 0.8 + 48 / 10) / 2) < 1e-6
    out = bench.pick_temporal_mode_configs([td], 32, 25)
    assert out["comp"]["quality_ok"]
    assert out["comp"]["roll_k_torso"] == 10
    # head picks never carry a torso roll
    assert out["head"]["roll_k_torso"] == 0


def test_bench_temporal_roll_cadence_gating():
    """_roll<K>-suffixed modes gate the cli/serve rolling cadence:
    default selection (roll_k=0) ignores them; roll_k=K selects ONLY
    points measured at that cadence and carries roll_k into the
    config; an unmeasured cadence stays gated closed."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from idealnerf_tpu.eval.operating_points import (
        pick_temporal_mode_configs,
    )

    td = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {
            "head_only_s_delta_16_k60": {"psnr_temporal_vs_full": 52.0,
                                         "delta_psnr_vs_gt": 0.01},
            "head_only_s_delta_16_k60_roll16": {
                "psnr_temporal_vs_full": 47.0, "delta_psnr_vs_gt": 0.02},
        },
    }
    out0 = pick_temporal_mode_configs([td], 32, 25)
    assert out0["head"]["quality_ok"] and out0["head"]["roll_k"] == 0
    out16 = pick_temporal_mode_configs([td], 32, 25, roll_k=16)
    assert out16["head"]["quality_ok"] and out16["head"]["roll_k"] == 16
    assert out16["head"]["s_delta"] == 16
    # a cadence with no measured gate stays closed
    out8 = pick_temporal_mode_configs([td], 32, 25, roll_k=8)
    assert not out8["head"]["quality_ok"]


def test_bench_temporal_delta_keep_points():
    """_k<pct>-suffixed modes (temporal_delta.py --delta_keep) are
    operating points: cost-ranked by s_delta*keep, carried into the
    picked config as delta_keep."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    td = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {
            # unpruned s32 misses the composite gate; pruned s32 holds
            "s_delta_32": {"delta_psnr_vs_gt": 0.054,
                           "psnr_temporal_vs_full": 48.7},
            "s_delta_32_k60": {"delta_psnr_vs_gt": 0.048,
                               "psnr_temporal_vs_full": 48.7},
            "head_only_s_delta_32": {"psnr_temporal_vs_full": 54.6},
            "head_only_s_delta_32_k60": {"psnr_temporal_vs_full": 52.0},
        },
    }
    tq = bench.pick_temporal_points(td, 25)
    assert tq["composite_video_quality_ok"]
    assert tq["s_delta_comp"] == 32 and tq["delta_keep_comp"] == 0.6
    # head: both hold; k60 is cheaper (32*0.6 < 32*1.0)
    assert tq["s_delta_head"] == 32 and tq["delta_keep_head"] == 0.6
    assert tq["composite_delta_db_vs_gt"]["s_delta_32_k60"] == 0.048
    out = bench.pick_temporal_mode_configs([td], 32, 25)
    assert out["comp"]["quality_ok"] and out["comp"]["delta_keep"] == 0.6

    # across files at the SAME refresh, the cheaper gated point wins
    # (s_delta * delta_keep), regardless of file order
    plain = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {"s_delta_32": {"delta_psnr_vs_gt": 0.04},
                  "head_only_s_delta_32":
                      {"psnr_temporal_vs_full": 54.6}},
    }
    out2 = bench.pick_temporal_mode_configs([plain, td], 32, 25)
    assert out2["comp"]["delta_keep"] == 0.6
    assert "_cost" not in out2["comp"]

    # per-field torso counts: "s_delta_16t32_k60" parses to head 16 /
    # torso 32 / keep 0.6 and, when gated, beats s32 uniform on cost
    td_t = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {
            "s_delta_32_k60": {"delta_psnr_vs_gt": 0.048},
            "s_delta_16t32_k60": {"delta_psnr_vs_gt": 0.04},
            "head_only_s_delta_32": {"psnr_temporal_vs_full": 54.6},
        },
    }
    tqt = bench.pick_temporal_points(td_t, 25)
    assert tqt["composite_video_quality_ok"]
    assert tqt["s_delta_comp"] == 16
    assert tqt["s_delta_torso_comp"] == 32
    assert tqt["delta_keep_comp"] == 0.6
    assert tqt["composite_delta_db_vs_gt"]["s_delta_16t32_k60"] == 0.04
    outt = bench.pick_temporal_mode_configs([td_t], 32, 25)
    assert outt["comp"]["s_delta_torso"] == 32
    assert outt["comp"]["s_delta"] == 16

    # depth-placement suffixes (temporal_delta.py --uni_frac/--kf_blend)
    # parse into the picked config so bench/auto_temporal rebuild the
    # exact renderer the evidence measured
    td_b = {
        "refresh": 25, "keyframe_rung": "16+32",
        "modes": {
            "s_delta_32_k60": {"delta_psnr_vs_gt": 0.09},
            "s_delta_16_k60_u50_b50": {"delta_psnr_vs_gt": 0.03},
            "head_only_s_delta_16_k60_b50":
                {"psnr_temporal_vs_full": 47.0},
        },
    }
    tqb = bench.pick_temporal_points(td_b, 25)
    assert tqb["composite_video_quality_ok"]
    assert tqb["s_delta_comp"] == 16 and tqb["delta_keep_comp"] == 0.6
    assert tqb["uni_frac_comp"] == 0.5 and tqb["kf_blend_comp"] == 0.5
    assert tqb["uni_frac_head"] == 0.25 and tqb["kf_blend_head"] == 0.5
    assert (tqb["composite_delta_db_vs_gt"]["s_delta_16_k60_u50_b50"]
            == 0.03)
    outb = bench.pick_temporal_mode_configs([td_b], 32, 25)
    assert outb["comp"]["uni_frac"] == 0.5
    assert outb["comp"]["kf_blend"] == 0.5
    assert outb["head"]["kf_blend"] == 0.5


@pytest.mark.slow
def test_cli_serve_streams_synthetic(tmp_path):
    """cli.serve pushes the driving track through TemporalStream frame
    by frame, writes the streamed video, and reports latency stats."""
    import json

    from idealnerf_tpu.cli.serve import main as serve_main
    from idealnerf_tpu.cli.train_head import main as train_main

    train_main(_args(tmp_path, "srv", ["--epochs", "1"]))
    ckpt = str(tmp_path / "srv" / "ckpt")
    out = str(tmp_path / "out_srv")
    stats = serve_main(_args(tmp_path, "srv",
                             ["--head_ckpt", ckpt, "--max_frames", "3",
                              "--refresh", "2", "--s_delta", "6",
                              "--save_path", out]))
    assert stats["frames"] == 3
    assert stats["warmup_s"] > 0
    assert stats["steady_fps"] > 0
    assert os.path.getsize(os.path.join(out, "srv_stream.avi")) > 0

    # gated evidence consumption, same grammar as --auto_temporal
    ev_dir = tmp_path / "evsrv"
    ev_dir.mkdir()
    with open(ev_dir / "temporal_delta.json", "w") as fh:
        json.dump({"refresh": 2, "keyframe_rung": "6+6",
                   "tightened_bounds": None,
                   "modes": {"head_only_s_delta_6_k60":
                             {"psnr_temporal_vs_full": 44.0}}}, fh)
    stats = serve_main(_args(tmp_path, "srv",
                             ["--head_ckpt", ckpt, "--max_frames", "3",
                              "--auto_temporal", str(ev_dir)]))
    assert stats["frames"] == 3

    # rolling keyframe refresh: same entry point, bounded-latency mode
    stats = serve_main(_args(tmp_path, "srv",
                             ["--head_ckpt", ckpt, "--max_frames", "3",
                              "--s_delta", "6", "--roll_k", "2"]))
    assert stats["frames"] == 3
    assert stats["roll_k"] == 2
