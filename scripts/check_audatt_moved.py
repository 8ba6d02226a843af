"""Verify the smoothed-audio regime actually trained past the switch.

The reference switches from raw AudioNet features to AudioAttNet
smoothing at nosmo_iters (helper.py:119-122; audio_exp_nerf.py:242-264)
— before the switch the AudAttNet receives no gradients. Round 3's 100k
rehearsal never crossed the (scaled) switch, so its aud_att params were
never trained. The round-4 200k run resumes the 100k checkpoint with
nosmo_iters=150000: this script proves the post-switch regime by
measuring how far every aud_att tensor moved between the 100k baseline
and the 200k checkpoint (and, as a control, that they are bit-identical
when comparing the 100k checkpoint with itself at the pre-switch step).

Writes runs/audatt_moved.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_100K = os.path.join(ROOT, "runs", "rehearsal2", "logs",
                         "rehearsal_head", "ckpt")
HEAD_200K = os.path.join(ROOT, "runs", "rehearsal2", "logs",
                         "rehearsal_head200", "ckpt")


def main():
    import numpy as np

    from idealnerf_tpu.ckpt import CheckpointManager

    r1 = CheckpointManager(HEAD_100K).restore_raw()
    r2 = CheckpointManager(HEAD_200K).restore_raw()
    s1, s2 = int(r1["step"]), int(r2["step"])

    def flat(tree, prefix=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flat(v, f"{prefix}{k}."))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                out.update(flat(v, f"{prefix}{i}."))
        else:
            out[prefix[:-1]] = np.asarray(tree)
        return out

    rows = {}
    moved = {}
    for group in ("aud_att", "aud_net"):
        a = flat(r1["params"].get(group, {}))
        b = flat(r2["params"].get(group, {}))
        deltas = {k: float(np.abs(b[k] - a[k]).max()) for k in a if k in b}
        rows[group] = {
            "tensors": len(deltas),
            "max_abs_delta": max(deltas.values()) if deltas else 0.0,
            "mean_abs_delta": (float(np.mean(list(deltas.values())))
                               if deltas else 0.0),
        }
        moved[group] = rows[group]["max_abs_delta"] > 1e-6

    out = {
        "step_baseline": s1,
        "step_trained": s2,
        "nosmo_expectation": ("aud_att must move iff the run crossed "
                              "nosmo_iters between the two steps"),
        "groups": rows,
        "aud_att_moved": moved.get("aud_att", False),
        "aud_net_moved": moved.get("aud_net", False),
    }
    with open(os.path.join(ROOT, "runs", "audatt_moved.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    if not out["aud_att_moved"]:
        print("WARNING: aud_att params did NOT move — the smoothed "
              "regime never trained", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
