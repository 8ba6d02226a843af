"""Where does the trained AudAttNet put its attention mass?

The synthetic subject's mouth is driven by the CENTER frame's audio
window, so a fully converged smoothed regime should place the 8-window
attention's peak at the center position (index smo_size//2). Round 4's
25k-post-switch model had only moved it partway (BASELINE.md). This
measures, over the subject's real audio windows: the mean attention
distribution across window positions, the fraction of windows whose
argmax is the center, and the mean center weight — the plateau
evidence if val PSNR stalls below the pre-switch anchor (reference
gives this regime 100k+ steps, helper.py:119-122).

Usage: python scripts/audatt_peak.py [--ckpt DIR] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=os.path.join(
        ROOT, "runs", "rehearsal2", "logs", "rehearsal_head200", "ckpt"))
    p.add_argument("--subject", default=os.path.join(
        ROOT, "runs", "rehearsal2"))
    p.add_argument("--out", default=os.path.join(
        ROOT, "runs", "audatt_peak.json"))
    args = p.parse_args()

    import jax

    # AudioNet/AttNet inference is tiny — run on host CPU so this probe
    # never queues behind chip jobs (sitecustomize pins the axon
    # platform before env vars are read; the config API still works)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from idealnerf_tpu.ckpt import CheckpointManager
    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.models.audio_net import apply_audio_net
    from idealnerf_tpu.models.nn import conv1d, dense, leaky_relu

    cfg = ExperimentConfig.from_file(
        os.path.join(args.subject, "HeadNeRF_config.txt"))
    raw = CheckpointManager(args.ckpt).restore_raw()
    params = raw["params"]
    auds = np.load(os.path.join(args.subject, "aud.npy")).astype(
        np.float32)

    feats = apply_audio_net(params["aud_net"], jnp.asarray(auds),
                            win_size=cfg.win_size)
    m, smo = feats.shape[0], cfg.smo_size
    half = smo // 2

    def att_weights(i):
        """The softmax the smoothing applies at frame i (interior
        frames only — callers pass half <= i < m - half)."""
        win = jax.lax.dynamic_slice_in_dim(feats, i - half, smo, 0)
        ap = params["aud_att"]
        dim_aud = ap["conv"][0]["w"].shape[1]
        y = jnp.transpose(win[:, :dim_aud])[None]
        for conv in ap["conv"]:
            y = leaky_relu(conv1d(conv, y, stride=1, padding=1))
        logits = dense(ap["att"], y.reshape(1, smo))
        return jax.nn.softmax(logits, axis=1).reshape(smo)

    idx = jnp.arange(half, m - half)
    w = jax.vmap(att_weights)(idx)              # (frames, smo)
    w = np.asarray(w)
    out = {
        "ckpt": os.path.relpath(args.ckpt, ROOT),
        "step": int(raw["step"]),
        "smo_size": int(smo),
        "center_index": int(half),
        "mean_attention_by_position": [round(float(x), 4)
                                       for x in w.mean(0)],
        "argmax_at_center_fraction": round(
            float((w.argmax(1) == half).mean()), 4),
        "mean_center_weight": round(float(w[:, half].mean()), 4),
        "uniform_weight": round(1.0 / smo, 4),
        "frames": int(w.shape[0]),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
