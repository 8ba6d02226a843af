"""Per-frame serving latency of the real-time stream on the chip.

Drives eval.stream.TemporalStream over the rehearsal composite subject
at the quality-gated operating point (the same gated config bench.py
and --auto_temporal consume) and records what a live caller sees:
per-push wall-clock percentiles, keyframe vs delta split, and the
25-fps (40 ms) deadline hit rate. Offline video fps amortizes keyframes
over scanned cycles; a live server cannot — each frame is fetched
before emission, so this is the honest serving number, keyframe spikes
included (a jitter buffer of one keyframe latency hides them).

Usage: python scripts/stream_latency.py [--frames 100] [--mode comp|head]
Writes runs/stream_latency.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COM = os.path.join(ROOT, "runs", "rehearsal2_com")
HEAD_CKPT = os.path.join(ROOT, "runs", "rehearsal2", "logs",
                         "rehearsal_head", "ckpt")
TORSO_CKPT = os.path.join(COM, "logs", "rehearsal_head_torso", "ckpt")


def pct(xs, q):
    import numpy as np

    return float(np.percentile(np.asarray(xs), q))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--mode", choices=("comp", "head"), default="comp")
    p.add_argument("--roll_k", type=int, default=0,
                   help="rolling keyframe refresh: no keyframe spikes — "
                        "every frame pays delta + 1/K of a keyframe "
                        "(eval/stream.py roll_k)")
    p.add_argument("--quality", type=int, default=0,
                   help="also re-render the first N pushes through a "
                        "refresh=1 stream (per-frame full render at the "
                        "gated keyframe rung) and report agreement dB")
    p.add_argument("--out", default=os.path.join(ROOT, "runs",
                                                 "stream_latency.json"))
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.ckpt import CheckpointManager
    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data.dataset import load_transforms_dataset
    from idealnerf_tpu.eval.operating_points import gated_video_config
    from idealnerf_tpu.eval.stream import TemporalStream
    from idealnerf_tpu.train.torso import init_torso_params

    cfg = ExperimentConfig.from_file(os.path.join(COM, "HeadNeRF_config.txt"))
    identity = load_transforms_dataset(cfg.datadir, mode="val",
                                       near=cfg.near, far=cfg.far,
                                       gt_dirs="com_imgs")

    conf = gated_video_config(COM, args.mode)
    if conf is None or not conf.get("quality_ok", False):
        print(json.dumps({"error": f"no gated {args.mode} operating "
                                   f"point in {COM}"}))
        return 1
    if conf.get("keyframe_rung"):
        s_kf, imp_kf = map(int, conf["keyframe_rung"].split("+"))
        cfg = dataclasses.replace(cfg, N_samples=s_kf, N_importance=imp_kf)

    raw = CheckpointManager(HEAD_CKPT).restore_raw()
    head_params = raw["params"]
    latents = jnp.asarray(raw["latent_codes"])
    torso_params = None
    if args.mode == "comp":
        like = {"torso_params": init_torso_params(
            __import__("jax").random.PRNGKey(0), cfg)}
        torso_params = CheckpointManager(TORSO_CKPT).restore_partial(
            like)[0]["torso_params"]

    if args.roll_k:
        # rolling mode has no keyframe CDF to anchor on — force
        # kf_blend off even if a future gated point carries one
        # (TemporalStream refuses roll_k + kf_blend > 0)
        if conf.get("kf_blend"):
            print(f"# roll_k: dropping gated kf_blend={conf['kf_blend']}",
                  flush=True)
        # both-field rolling excludes the torso refresh-roll (the roll
        # delta pass covers the torso) and the keyframe-CDF anchor
        conf = dict(conf, roll_k=args.roll_k, kf_blend=0.0,
                    roll_k_torso=0)
    stream = TemporalStream(cfg, head_params, identity,
                            torso_params=torso_params,
                            latent_codes=latents, operating_point=conf,
                            use_prior=True, smooth_audio=True)
    warmup_s = stream.warmup()
    print(f"warmup (all programs compiled): {warmup_s:.1f}s", flush=True)

    # tunnel round-trip floor: dispatch+fetch of a trivial program.
    # Through the axon relay this measures ~200 ms — the per-push
    # latencies below are RTT-dominated, NOT device compute; on a
    # locally-attached chip subtract ~this from every percentile.
    import time as _time

    import jax as _jax

    @_jax.jit
    def _tiny(x):
        return x + 1.0

    z = jnp.zeros((1,))
    float(_tiny(z)[0])  # compile
    rtts = []
    for _ in range(10):
        t0 = _time.perf_counter()
        float(_tiny(z)[0])
        rtts.append((_time.perf_counter() - t0) * 1000.0)
    tunnel_rtt_ms = round(pct(rtts, 50), 2)
    print(f"tunnel round-trip floor: {tunnel_rtt_ms} ms", flush=True)

    n = args.frames
    emitted = 0
    kept_frames = []
    for i in range(n):
        f = stream.push(identity.auds[i % identity.auds.shape[0]],
                        expr=identity.exprs[i % identity.size])
        emitted += f is not None
        if f is not None and len(kept_frames) < args.quality:
            kept_frames.append(f)
    for f in stream.flush():
        emitted += 1
        if len(kept_frames) < args.quality:
            kept_frames.append(f)
    assert emitted == n, (emitted, n)

    quality_db = None
    if args.quality:
        # anchor: refresh=1 => every push is a monolithic keyframe =
        # per-frame full hierarchical render at the gated keyframe rung
        anchor = TemporalStream(
            cfg, head_params, identity, torso_params=torso_params,
            latent_codes=latents,
            operating_point=dict(conf, refresh=1, roll_k=0),
            use_prior=True, smooth_audio=True)
        anchor.warmup()
        ref_frames = []
        for i in range(n):
            f = anchor.push(identity.auds[i % identity.auds.shape[0]],
                            expr=identity.exprs[i % identity.size])
            if f is not None and len(ref_frames) < len(kept_frames):
                ref_frames.append(f)
        for f in anchor.flush():
            if len(ref_frames) < len(kept_frames):
                ref_frames.append(f)
        a = np.stack(kept_frames)
        b = np.stack(ref_frames)
        mse = np.mean((a - b) ** 2, axis=(1, 2, 3))
        per = -10.0 * np.log10(np.maximum(mse, 1e-12))
        quality_db = {"frames": int(len(kept_frames)),
                      "mean_db": round(float(per.mean()), 2),
                      "min_db": round(float(per.min()), 2)}

    # ---- device-compute isolation: queue-depth sweep -----------------
    # Per-push wall through the tunnel is RTT-dominated (the ~200 ms
    # floor above). Dispatch WINDOWS of K delta pushes with ONE scalar
    # fetch at the end: wall(K) = RTT + K * compute (device executions
    # serialize; dispatches pipeline through the relay), so the slope
    # of wall vs K is the measured per-push DEVICE COMPUTE — the number
    # a locally-attached deployment would see — and the intercept
    # re-measures the transport floor. Verdict-r4 item #6: this
    # replaces the amortization *argument* with a measured artifact.
    sweep_stream = TemporalStream(cfg, head_params, identity,
                                  torso_params=torso_params,
                                  latent_codes=latents,
                                  operating_point=conf, use_prior=True,
                                  smooth_audio=True)
    sweep_stream.warmup()
    si = 0

    def sweep_push(device=True):
        nonlocal si
        aud = identity.auds[si % identity.auds.shape[0]]
        expr = identity.exprs[si % identity.size]
        si += 1
        return (sweep_stream.push_device(aud, expr=expr) if device
                else sweep_stream.push(aud, expr=expr))

    while sweep_push(device=False) is None:    # prime past the lookahead
        pass
    refresh_s = sweep_stream.refresh
    ks = (1, 2, 4, 8)
    walls = {k: [] for k in ks}
    for k in ks:
        for _ in range(6):
            # keep keyframes out of the timed window (rolling mode has
            # none after frame 0)
            if not sweep_stream.roll_k:
                while ((sweep_stream._out_i % refresh_s) == 0
                       or (sweep_stream._out_i % refresh_s) + k
                       > refresh_s):
                    sweep_push(device=False)
            t0 = _time.perf_counter()
            acc = None
            for _ in range(k):
                f = sweep_push()
                acc = f.mean() if acc is None else acc + f.mean()
            float(acc)                          # ONE forced fetch
            walls[k].append((_time.perf_counter() - t0) * 1000.0)
    med = {k: float(np.median(v)) for k, v in walls.items()}
    kk = np.asarray(ks, np.float64)
    ww = np.asarray([med[k] for k in ks])
    slope, intercept = np.polyfit(kk, ww, 1)
    compute_samples = [(w - intercept) / k for k in ks if k >= 2
                       for w in walls[k]]
    compute_isolation = {
        "method": "queue-depth sweep: K delta pushes per single fetch; "
                  "wall(K) = intercept(RTT) + K*compute_ms",
        "window_walls_ms": {str(k): [round(w, 1) for w in v]
                           for k, v in walls.items()},
        "rtt_intercept_ms": round(float(intercept), 2),
        "compute_ms_per_frame": round(float(slope), 2),
        "compute_ms_p50": round(float(np.percentile(compute_samples, 50)),
                                2),
        "compute_ms_p95": round(float(np.percentile(compute_samples, 95)),
                                2),
        "deadline_40ms_compute_ok": bool(slope <= 40.0),
    }
    print(f"compute isolation: {json.dumps(compute_isolation)}",
          flush=True)

    times = np.asarray(stream.frame_times) * 1000.0
    refresh = stream.refresh
    # skip the first cycle (axon per-executable warmup ramp; compiles
    # were already paid by stream.warmup()); in rolling mode only frame
    # 0 is a keyframe — skip one comb cycle instead
    skip = stream.roll_k if stream.roll_k else refresh
    steady = times[skip:]
    if stream.roll_k:
        is_kf = np.zeros(len(times), bool)
        is_kf[0] = True
    else:
        is_kf = (np.arange(len(times)) % refresh) == 0
    kf, dl = steady[is_kf[skip:]], steady[~is_kf[skip:]]
    out = {
        "mode": args.mode,
        "roll_k": stream.roll_k,
        "quality_vs_full": quality_db,
        "frames": n,
        "operating_point": {k: conf[k] for k in
                            ("refresh", "s_delta", "s_delta_torso",
                             "delta_keep", "delta_keep_torso",
                             "freeze_z_torso", "dilate_every",
                             "roll_k_torso", "roll_k", "head_parse",
                             "keyframe_rung") if k in conf},
        "lookahead_frames": stream.algorithmic_latency_frames,
        "warmup_s": round(warmup_s, 1),
        "tunnel_rtt_floor_ms": tunnel_rtt_ms,
        "compute_isolation": compute_isolation,
        "p50_ms": round(pct(steady, 50), 2),
        "p95_ms": round(pct(steady, 95), 2),
        "p99_ms": round(pct(steady, 99), 2),
        "max_ms": round(float(steady.max()), 2),
        "keyframe_p50_ms": round(pct(kf, 50), 2) if len(kf) else None,
        "delta_p50_ms": round(pct(dl, 50), 2) if len(dl) else None,
        "deadline_40ms_hit_rate": round(float((steady <= 40.0).mean()), 4),
        "steady_fps": round(1000.0 / float(steady.mean()), 2),
        "first_cycle_ms": [round(float(t), 1) for t in times[:refresh][:8]],
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
