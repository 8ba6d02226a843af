"""Evidence-gated eval operating points.

Every fast rendering mode in this framework is QUALITY-GATED: its
configuration (sample rung, keyframe interval, delta sample count, ray
keep fraction) is only used when a measurement on a converged checkpoint
shows the quality cost is within tolerance. The measurements live in
JSON evidence files produced by the measurement scripts —
``scripts/sample_sweep.py`` (per-rung PSNR/SSIM of the val render) and
``scripts/temporal_delta.py`` (temporal keyframe+delta video vs the
per-frame full render and vs GT). This module is the single reader of
those files: ``bench.py`` uses it to decide what to time and claim, and
``cli/eval_reenact.py --auto_temporal`` uses it to hand a user the
gated video configuration without reading JSON by hand.

The reference has no analog — it renders everything at the full 64+192
schedule (eval_aud_exp_nerf.py:437, test_torso.py:513-534).
"""

from __future__ import annotations

import json
import os
from typing import Optional

# evidence filename pattern bench.py and --auto_temporal look for, in
# the subject's run directory: every scripts/temporal_delta.py output
# (canonical temporal_delta.json plus side studies like
# temporal_delta_b50.json) is considered — study files need no
# registration here, the mode keys inside carry the configuration.
TEMPORAL_EVIDENCE_FILES = "temporal_delta*.json"


def load_temporal_evidence(evidence_dir: str) -> list:
    """All temporal evidence dicts found in ``evidence_dir``."""
    import glob as _glob

    cands = []
    for p in sorted(_glob.glob(
            os.path.join(evidence_dir, TEMPORAL_EVIDENCE_FILES))):
        with open(p) as fh:
            cands.append(json.load(fh))
    return cands


def pick_quality_matched_rung(sweep, ref_prefix="64+", max_delta=0.05):
    """Cheapest (N_samples, N_importance) rung in a sample_sweep.json
    dict whose measured PSNR delta vs the paper schedule is within
    ``max_delta`` dB. Cost model: coarse s + fine (s+imp) point evals.
    Returns (s, imp, rung_key, delta) or None."""
    ref_key = next((k for k in sweep
                    if k.startswith(ref_prefix) and "_tight" not in k),
                   None)
    if ref_key is None:
        return None
    best = None
    for k, v in sweep.items():
        delta = v.get(f"delta_psnr_vs_{ref_key}")
        if delta is None or delta > max_delta:
            continue
        s, imp = map(int, k.replace("_tight", "").split("+"))
        cost = 2 * s + imp
        if best is None or cost < best[0]:
            best = (cost, s, imp, k, delta)
    return best[1:] if best else None


def pick_masked_point(results: dict, max_delta: float = 0.05):
    """Fastest measured-gated prior-masked eval config from a
    rehearsal results.json (scripts/rehearsal.py phase_eval rows
    ``delta_psnr_masked_<keep>[_hp]`` with per-row ``wall_s``,
    frame-basis budgets).

    Returns (keep_fraction, prior_kind, delta_db) or None, where
    prior_kind is "rect" (face-rect ∪ torso-parse union), "hp"
    (parse-silhouette prior), or "occ" (field-occupancy zero-mass cut,
    round-5). Ranking: smallest MEASURED wall_s among gated rows — the
    cost model (fine cost ∝ keep, smaller coarse set wins) mis-ranked
    hp priors whose irregular ray set is slower despite lower coverage
    (round-4: it picked masked_28_hp at 68.7 s over masked_60 at
    35.1 s). Rows without a measured wall fall back to the cost model,
    ranked AFTER every measured row."""
    kind_rank = {"occ": 0.0, "hp": 0.0005, "rect": 0.001}
    cands = []
    for keep in (28, 40, 60):
        for kind in ("occ", "hp", "rect"):
            key = (f"masked_{keep}"
                   + ("" if kind == "rect" else f"_{kind}"))
            d = results.get(f"delta_psnr_{key}")
            if d is None or d > max_delta:
                continue
            wall = (results.get(key) or {}).get("wall_s")
            rank = ((0, wall) if wall
                    else (1, keep / 100.0 + kind_rank[kind]))
            cands.append((rank, (keep / 100.0, kind, d)))
    cands.sort(key=lambda c: c[0])
    return cands[0][1] if cands else None


def pick_temporal_points(td, refresh, default_s_delta=32, fps_trust=True):
    """Per-mode temporal operating points from temporal_delta.json
    evidence (scripts/temporal_delta.py, converged checkpoints).

    For each of composite / head-only, picks the CHEAPEST measured
    s_delta whose quality gate holds - composite: <=0.05 dB PSNR-vs-GT
    delta; head-only: >=40 dB agreement with the per-frame full render
    (<1% RMS pixel error) - provided the evidence was measured at this
    keyframe interval (drift grows with refresh, so refresh-25 evidence
    does not cover refresh-50 timing). Falls back to ``default_s_delta``
    with the quality gate CLOSED when no measured point holds."""
    modes = td.get("modes", {}) if td else {}
    usable = bool(td) and td.get("refresh") == refresh

    def _parse(k, prefix):
        """Mode key -> point dict or None. Grammar after the prefix:
        "<h>[t<t>][_k<pct>][_kt<pct>][_u<pct>][_b<pct>][_d<k>][_hp]" —
        plain rungs ("32"), per-field torso counts ("16t32"), delta_keep
        studies ("32_k60"; per-field torso keep "32_k60_kt40"),
        depth-placement studies (uniform fraction "_u50", keyframe CDF
        blend "_b50"), thinned band dilation ("_d2" = dilate every 2nd
        delta frame), parse-silhouette priors ("_hp"); all from
        temporal_delta.py flags."""
        if not k.startswith(prefix):
            return None
        rest = k[len(prefix):].split("_")
        pt = dict(keep=1.0, keep_t=None, uni=0.25, blend=0.0, fz=False,
                  dil=1, hp=False, rt=0, roll=0)
        tags = dict(roll=("roll", 1), rt=("rt", 1), kt=("keep_t", 100.0),
                    k=("keep", 100.0), u=("uni", 100.0),
                    b=("blend", 100.0), d=("dil", 1))
        for seg in rest[1:]:
            if seg == "fz":  # boolean tag: torso frozen-z delta frames
                pt["fz"] = True
                continue
            if seg == "hp":  # boolean tag: parse-silhouette priors
                pt["hp"] = True
                continue
            tag = next((t for t in ("roll", "rt", "kt", "k", "u", "b",
                                    "d")
                        if seg.startswith(t) and seg[len(t):].isdigit()),
                       None)
            if tag is None:
                return None
            name, div = tags[tag]
            v = int(seg[len(tag):])
            pt[name] = v if div == 1 else v / div
        seg = rest[0].split("t")
        if len(seg) == 1 and seg[0].isdigit():
            pt.update(s=int(seg[0]), st=None)
        elif len(seg) == 2 and seg[0].isdigit() and seg[1].isdigit():
            pt.update(s=int(seg[0]), st=int(seg[1]))
        else:
            return None
        return pt

    rung = td.get("keyframe_rung") if td else None
    kf_width = (sum(map(int, rung.split("+"))) if rung else 48)

    # Per-field FIXED delta-frame work in sample-units: the measured
    # composite cost model is 11.7 ms fixed + 1.042 ms/sample at 450²
    # (runs/temporal_profile.json, slope fit over s_delta 32/16), i.e.
    # ~11.2 sample-equivalents of fixed work split over the two live
    # fields — temporal inverse-CDF + sort, band maintenance incl. the
    # 450² dilation, cache scatters. A frozen-z field skips ALL of it
    # (its delta pass re-evaluates the carried keyframe grid and passes
    # the cache through), so fz points are ranked without it.
    FIXED = 5.6

    # the spatial band dilation's share of a live field's FIXED work
    # (grid scatter + separable min/max windows + gather); dilate_every
    # amortizes exactly this part. Measured directly: 2.04 ms/frame
    # with two live fields (temporal_profile.py dilate-on/off split,
    # runs/temporal_profile.json dilation_ms) -> ~1.0 sample-equivalents
    # per field.
    DIL = 1.0

    def _cost(pt):
        # delta-frame cost ~ mean over fields of (fixed work + sample
        # count * kept fraction); the torso defaults to the head's
        # values. Frozen-z torso deltas evaluate the keyframe grid
        # width instead of s_delta and pay no fixed work. dilate_every
        # amortizes the dilation share of each live field's fixed work.
        s, st = pt["s"], pt["st"]
        kt = pt["keep_t"] if pt["keep_t"] is not None else pt["keep"]
        fixed = FIXED - DIL * (1.0 - 1.0 / pt["dil"])
        head_cost = fixed + s * pt["keep"]
        if pt["roll"]:
            # both-field rolling refresh: every frame additionally pays
            # 1/roll of the keyframe schedule per field
            head_cost += kf_width / pt["roll"]
        if pt["rt"]:
            # torso refresh-only roll: every frame re-renders 1/rt of
            # the torso rays at the keyframe schedule — no delta pass,
            # no fixed work, delta_keep_torso irrelevant
            torso_cost = kf_width / pt["rt"]
        elif pt["fz"]:
            torso_cost = kf_width * kt
        else:
            torso_cost = fixed + (st if st is not None else s) * kt
            if pt["roll"]:
                torso_cost += kf_width / pt["roll"]
        return (head_cost + torso_cost) / 2.0

    def _fps_ratio(v, prefix):
        # session-normalized speed: evidence files come from different
        # tunnel sessions whose absolute fps differ 2-3x (one outage
        # session measured 0.03 fps for the SAME render others measure
        # 0.7), so raw fps is only comparable within a file. Each file
        # records its own full-render fps in the same session — the
        # ratio delta_fps / full_fps is the session-invariant speedup.
        if not fps_trust:
            # the caller flagged this file's timings as untrustworthy
            # (outage-contaminated session: its own full-render base is
            # an outlier vs sibling files)
            return None
        fps = v.get("fps_delta_frames")
        base = (td or {}).get("fps_head_full_warm"
                              if prefix.startswith("head") else
                              "fps_full_warm")
        if fps and base:
            return fps / base
        return None

    def _rank(pv, prefix):
        # MEASURED steady-state delta-frame speedup ranks points when
        # the evidence carries fps (temporal_delta.py) — the synthetic
        # sample-count cost model mis-ranks configs whose fixed work
        # differs from its constants (round-4: it picked s12+fz+d2 over
        # the 1.5×-faster-measured s16+kt1). The ratio is BANDED to
        # quarter steps: per-frame-loop fps is noisy (±5-10% between
        # sessions), so near-ties fall through to the cost model rather
        # than letting noise pick the slower config. Cost model alone =
        # fallback for evidence predating the fps rows.
        p, v = pv
        r = _fps_ratio(v, prefix)
        if r:
            return (0, -round(r * 4) / 4, _cost(p), p["s"])
        return (1, 0.0, _cost(p), p["s"])

    def _pts(prefix):
        pts = [(p, v) for k, v in modes.items()
               if (p := _parse(k, prefix)) is not None]
        return sorted(pts, key=lambda pv: _rank(pv, prefix))

    comp = _pts("s_delta_")
    head = _pts("head_only_s_delta_")
    comp_ok = [(p, v) for p, v in comp
               if usable and v.get("delta_psnr_vs_gt", 99.0) <= 0.05]
    # head gate (round 4): ≥40 dB agreement with the per-frame full
    # render AND, when the evidence carries it, ≤0.05 dB PSNR-vs-GT
    # delta against head_imgs ground truth (the agreement gate alone is
    # self-referential; older evidence without the GT row still gates
    # on agreement only)
    head_ok = [(p, v) for p, v in head
               if usable
               and v.get("psnr_temporal_vs_full", 0.0) >= 40.0
               and v.get("delta_psnr_vs_gt", 0.0) <= 0.05]
    comp_ok_pts = [p for p, _ in comp_ok]
    head_ok_pts = [p for p, _ in head_ok]

    def _key(pt):
        return (f"s_delta_{pt['s']}"
                + ("" if pt["st"] is None else f"t{pt['st']}")
                + ("" if pt["keep"] >= 1.0 else f"_k{round(pt['keep']*100)}")
                + ("" if pt["keep_t"] is None
                   else f"_kt{round(pt['keep_t']*100)}")
                + ("" if pt["uni"] == 0.25 else f"_u{round(pt['uni']*100)}")
                + ("" if pt["blend"] <= 0 else f"_b{round(pt['blend']*100)}")
                + ("" if pt["dil"] <= 1 else f"_d{pt['dil']}")
                + ("" if pt["roll"] <= 0 else f"_roll{pt['roll']}")
                + ("" if pt["rt"] <= 0 else f"_rt{pt['rt']}")
                + ("_fz" if pt["fz"] else "")
                + ("_hp" if pt["hp"] else ""))

    return {
        "refresh_measured": td.get("refresh") if td else None,
        # keyframe schedule the evidence was measured at — bench times
        # the temporal renderers at exactly this rung so the fps row and
        # the quality claim describe the same configuration
        "keyframe_rung": td.get("keyframe_rung") if usable else None,
        # tightened per-field depth bounds change quality, not cost
        # (same sample counts), so the fps rows time the same work; the
        # quality claim applies to the configuration measured here
        "evidence_tightened_bounds": (
            bool(td.get("tightened_bounds")) if td else None),
        "evidence_at_this_refresh": usable,
        "composite_delta_db_vs_gt": {
            _key(p): v.get("delta_psnr_vs_gt") for p, v in comp},
        "head_agreement_db_vs_full": {
            _key(p): v.get("psnr_temporal_vs_full") for p, v in head},
        "s_delta_comp": (comp_ok_pts[0]["s"] if comp_ok_pts
                         else default_s_delta),
        "s_delta_torso_comp": comp_ok_pts[0]["st"] if comp_ok_pts else None,
        "delta_keep_comp": comp_ok_pts[0]["keep"] if comp_ok_pts else 1.0,
        "delta_keep_torso_comp": (comp_ok_pts[0]["keep_t"] if comp_ok_pts
                                  else None),
        "freeze_z_torso_comp": (comp_ok_pts[0]["fz"] if comp_ok_pts
                                else False),
        "roll_k_torso_comp": comp_ok_pts[0]["rt"] if comp_ok_pts else 0,
        "roll_k_comp": comp_ok_pts[0]["roll"] if comp_ok_pts else 0,
        "roll_k_head": head_ok_pts[0]["roll"] if head_ok_pts else 0,
        "uni_frac_comp": comp_ok_pts[0]["uni"] if comp_ok_pts else 0.25,
        "kf_blend_comp": comp_ok_pts[0]["blend"] if comp_ok_pts else 0.0,
        "dilate_every_comp": comp_ok_pts[0]["dil"] if comp_ok_pts else 1,
        "head_parse_comp": comp_ok_pts[0]["hp"] if comp_ok_pts else False,
        "cost_comp": _cost(comp_ok_pts[0]) if comp_ok_pts else None,
        "fps_delta_comp": (comp_ok[0][1].get("fps_delta_frames")
                           if comp_ok else None),
        "fps_ratio_comp": (_fps_ratio(comp_ok[0][1], "s_delta_")
                           if comp_ok else None),
        "composite_video_quality_ok": bool(comp_ok_pts),
        "s_delta_head": (head_ok_pts[0]["s"] if head_ok_pts
                         else default_s_delta),
        "delta_keep_head": head_ok_pts[0]["keep"] if head_ok_pts else 1.0,
        "uni_frac_head": head_ok_pts[0]["uni"] if head_ok_pts else 0.25,
        "kf_blend_head": head_ok_pts[0]["blend"] if head_ok_pts else 0.0,
        "dilate_every_head": head_ok_pts[0]["dil"] if head_ok_pts else 1,
        "head_parse_head": head_ok_pts[0]["hp"] if head_ok_pts else False,
        "cost_head": _cost(head_ok_pts[0]) if head_ok_pts else None,
        "fps_delta_head": (head_ok[0][1].get("fps_delta_frames")
                           if head_ok else None),
        "fps_ratio_head": (_fps_ratio(head_ok[0][1], "head_only_")
                           if head_ok else None),
        "head_video_quality_ok": bool(head_ok_pts),
    }


def _filter_roll(cands, roll_k):
    """Evidence filtered to one rolling cadence: roll_k=0 keeps only
    keyframed (non-roll) mode keys — the video/bench selection; roll_k=K
    keeps only the _roll<K> keys — cli/serve's spike-free cadence must
    gate on evidence measured AT that cadence (a keyframed gate says
    nothing about unbounded-horizon rolling drift)."""
    tag = f"_roll{roll_k}" if roll_k else None

    def keep(k):
        return (tag in k) if tag else ("_roll" not in k)

    return [dict(td, modes={k: v for k, v in (td.get("modes") or
                                              {}).items() if keep(k)})
            for td in cands]


def pick_temporal_mode_configs(cands, default_s_delta, default_refresh,
                               roll_k: int = 0):
    """Per-mode temporal configuration across MULTIPLE evidence files
    (scripts/temporal_delta.py runs at different keyframe intervals).

    For composite and head-only independently: among the files whose
    quality gate holds (pick_temporal_points), prefer the LARGEST
    keyframe interval — keyframe cost amortizes over more frames — with
    that file's cheapest quality-holding s_delta and its keyframe rung.
    Falls back to the env defaults with the gate CLOSED.

    ``roll_k``: 0 (default) selects among keyframed points only; K>1
    selects among points measured at the _roll<K> rolling cadence."""
    cands = _filter_roll(cands, roll_k)
    # session-speed sanity: a file whose own full-render fps is an
    # outlier vs its siblings (≤ half the median — an outage-slowed
    # session) gets its measured fps ignored; its QUALITY rows are
    # still valid (PSNR is speed-independent)
    bases = [td.get("fps_full_warm") for td in cands
             if td.get("fps_full_warm")]
    med = sorted(bases)[len(bases) // 2] if bases else None

    out = {}
    for mode, ok_key, sd_key in (
            ("comp", "composite_video_quality_ok", "s_delta_comp"),
            ("head", "head_video_quality_ok", "s_delta_head")):
        best = None
        for td in cands:
            trust = bool(med and td.get("fps_full_warm")
                         and td["fps_full_warm"] >= 0.5 * med)
            tq = pick_temporal_points(td, td.get("refresh"),
                                      default_s_delta, fps_trust=trust)
            if not tq[ok_key]:
                continue
            st = (tq.get("s_delta_torso_comp") if mode == "comp"
                  else None)
            # rank: session-normalized measured speedup when the
            # evidence has it (negated: smaller rank wins), else the
            # synthetic cost model — mirrors pick_temporal_points'
            # _rank; raw fps is NOT cross-file comparable (sessions
            # differ 2-3x in tunnel speed). CROSS-FILE ratios use a
            # FULL-unit band (not the within-file quarter band):
            # round-5 measured the same delta workload at 0.41 vs 0.58
            # normalized fps in two sessions minutes apart — per-frame
            # reenact-loop fps through the relay is only order-of-
            # magnitude trustworthy across sessions, so near-ties fall
            # through to the physical cost model (which prices the
            # keyframe rung and the torso roll width).
            ratio = tq.get(f"fps_ratio_{mode}")
            cost = ((-round(ratio), tq[f"cost_{mode}"]) if ratio
                    else (0.0, tq[f"cost_{mode}"]))
            # largest keyframe interval first; at equal refresh the
            # faster-measured / cheaper-modeled gated point wins
            if (best is None or td["refresh"] > best["refresh"]
                    or (td["refresh"] == best["refresh"]
                        and cost < best["_cost"])):
                best = {"refresh": td["refresh"], "s_delta": tq[sd_key],
                        "s_delta_torso": st,
                        "delta_keep": tq[f"delta_keep_{mode}"],
                        "delta_keep_torso": (
                            tq.get("delta_keep_torso_comp")
                            if mode == "comp" else None),
                        "freeze_z_torso": (
                            tq.get("freeze_z_torso_comp", False)
                            if mode == "comp" else False),
                        "roll_k_torso": (
                            tq.get("roll_k_torso_comp", 0)
                            if mode == "comp" else 0),
                        "roll_k": tq.get(f"roll_k_{mode}", 0),
                        "uni_frac": tq[f"uni_frac_{mode}"],
                        "kf_blend": tq[f"kf_blend_{mode}"],
                        "dilate_every": tq[f"dilate_every_{mode}"],
                        "head_parse": tq[f"head_parse_{mode}"],
                        "keyframe_rung": tq["keyframe_rung"],
                        "_cost": cost}
        out[mode] = {
            "quality_ok": best is not None,
            "refresh": best["refresh"] if best else default_refresh,
            "s_delta": best["s_delta"] if best else default_s_delta,
            "s_delta_torso": best["s_delta_torso"] if best else None,
            "delta_keep": best["delta_keep"] if best else 1.0,
            "delta_keep_torso": best["delta_keep_torso"] if best else None,
            "freeze_z_torso": best["freeze_z_torso"] if best else False,
            "roll_k_torso": best["roll_k_torso"] if best else 0,
            "roll_k": best["roll_k"] if best else 0,
            "uni_frac": best["uni_frac"] if best else 0.25,
            "kf_blend": best["kf_blend"] if best else 0.0,
            "dilate_every": best["dilate_every"] if best else 1,
            "head_parse": best["head_parse"] if best else False,
            "keyframe_rung": best["keyframe_rung"] if best else None,
        }
    out["evidence"] = [
        {"refresh": td.get("refresh"),
         "keyframe_rung": td.get("keyframe_rung"),
         "tightened": bool(td.get("tightened_bounds")),
         "modes": {k: (v.get("delta_psnr_vs_gt")
                       if not k.startswith("head") else
                       v.get("psnr_temporal_vs_full"))
                   for k, v in td.get("modes", {}).items()}}
        for td in cands]
    return out


def gated_video_config(evidence_dir: str, mode: str,
                       default_s_delta: int = 32,
                       default_refresh: int = 25,
                       roll_k: int = 0) -> Optional[dict]:
    """The quality-gated temporal video configuration for ``mode``
    ("head" or "comp"), or None when no measured point holds the gate.

    Returns {refresh, s_delta, s_delta_torso, delta_keep,
    keyframe_rung} ready to hand to eval.reenact / the temporal
    renderer constructors. ``roll_k``: require a point measured at that
    rolling cadence (cli/serve --roll_k refuses cadences without their
    own gate)."""
    cands = load_temporal_evidence(evidence_dir)
    conf = pick_temporal_mode_configs(
        cands, default_s_delta, default_refresh, roll_k=roll_k)[mode]
    return conf if conf["quality_ok"] else None
