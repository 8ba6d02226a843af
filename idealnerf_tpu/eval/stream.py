"""Real-time streaming serving over the temporal depth-cache renderer.

The reference's eval entry points are offline batch renderers — they
consume a whole driving track and write a video
(``eval_aud_exp_nerf.py:479-496``, ``test_torso.py:513-534``). This
module serves the same converged models frame-by-frame for live use:
DeepSpeech audio windows (and optionally expressions / poses) are
PUSHED as they arrive and frames come back at a quality-gated temporal
operating point (docs/TEMPORAL.md), in arrival order.

Semantics match the offline renderer — ``TemporalStream`` reproduces
``eval.reenact.reenact(temporal=...)`` on the same inputs to within the
per-frame-vs-batched audio-program numerical noise (~5e-4 in the
conditioning features; >99% of pixels bit-match, the rest bounded by
the odd flipped resampling bin — tests/test_stream.py) — including the
reference's
CENTERED AudioAttNet smoothing (test_torso.py:478-498): a frame's
feature window needs ``smo_size - smo_size//2 - 1`` FUTURE audio
features, so the stream carries that much algorithmic lookahead
(3 frames = 120 ms at 25 fps with the reference smo_size=8).
``smooth_audio=False`` serves with zero lookahead.

Typical serving loop::

    stream = TemporalStream(cfg, head_params, identity,
                            torso_params=torso_params,
                            latent_codes=latent_codes,
                            operating_point=gated_video_config(ev_dir,
                                                               "comp"))
    for aud_win, expr in live_inputs:          # 25 Hz
        frame = stream.push(aud_win, expr=expr)
        if frame is not None:
            emit(frame)
    for frame in stream.flush():               # drain the lookahead
        emit(frame)

Latency harness: scripts/stream_latency.py (p50/p95/p99 per-push wall
time vs the 40 ms frame budget on the real chip).
"""

import time
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.models.audio_net import (
    apply_audio_att_net,
    apply_audio_net,
)
from idealnerf_tpu.models.variants import (
    variant_conditioning,
    variant_nerf_config,
)
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.stream")


class TemporalStream:
    """Stateful frame server: ``push(aud_window) -> frame | None``.

    Frame ``i`` renders as a keyframe when ``i % refresh == 0`` and as a
    band-confined delta frame otherwise — the same cadence as the
    offline temporal video path (eval/reenact.py), but strictly
    per-frame (a live server cannot batch future frames into a scanned
    cycle). Identity poses cycle through the subject's frames unless
    ``push(pose=...)`` supplies one.

    ``operating_point``: a dict in ``gated_video_config`` shape
    (refresh / s_delta / s_delta_torso / delta_keep / delta_keep_torso /
    freeze_z_torso / uni_frac / kf_blend / dilate_every). The keyframe
    sample rung is cfg.N_samples/N_importance — apply the gated
    ``keyframe_rung`` to ``cfg`` before constructing, exactly as
    cli/eval_reenact.py --auto_temporal does.
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        head_params: Dict[str, Any],
        identity,
        torso_params: Optional[Dict[str, Any]] = None,
        latent_codes: Optional[jnp.ndarray] = None,
        operating_point: Optional[Dict[str, Any]] = None,
        refresh: int = 25,
        s_delta: int = 16,
        s_delta_torso: Optional[int] = None,
        delta_keep: float = 1.0,
        delta_keep_torso: Optional[float] = None,
        freeze_z_torso: bool = False,
        uni_frac: float = 0.25,
        kf_blend: float = 0.0,
        dilate_every: int = 1,
        roll_k: int = 0,
        roll_k_torso: int = 0,
        use_prior: bool = False,
        head_parse: bool = False,
        bounds=None,
        smooth_audio: bool = True,
        compute_dtype=None,
    ):
        op = operating_point or {}
        if op and not op.get("quality_ok", True):
            raise ValueError(
                "operating_point's quality gate is closed — measure the "
                "subject with scripts/temporal_delta.py first")
        self.refresh = int(op.get("refresh", refresh))
        if self.refresh < 1:
            raise ValueError("refresh must be >= 1")
        s_delta = int(op.get("s_delta", s_delta))
        s_delta_torso = op.get("s_delta_torso", s_delta_torso)
        delta_keep = float(op.get("delta_keep", delta_keep))
        dkt = op.get("delta_keep_torso", delta_keep_torso)
        freeze_z_torso = bool(op.get("freeze_z_torso", freeze_z_torso))
        uni_frac = float(op.get("uni_frac", uni_frac))
        kf_blend = float(op.get("kf_blend", kf_blend))
        dilate_every = int(op.get("dilate_every", dilate_every))
        # rolling keyframe refresh: no keyframe after frame 0 — every
        # frame pays delta + 1/roll_k of a keyframe, bounding per-push
        # latency (the 1-in-refresh keyframe spike disappears); per-ray
        # refresh age is bounded by roll_k frames
        self.roll_k = int(op.get("roll_k", roll_k) or 0)
        # torso refresh-only rolling (the gated rt<K> points): head
        # keeps the keyframe cadence, the torso re-renders 1/K of its
        # rays at keyframe quality every frame
        self.roll_k_torso = int(op.get("roll_k_torso", roll_k_torso) or 0)
        head_parse = bool(op.get("head_parse", head_parse))
        if self.roll_k == 1 or self.roll_k < 0:
            raise ValueError("roll_k must be 0 (off) or >= 2")

        if compute_dtype is None and jax.default_backend() == "tpu":
            compute_dtype = jnp.bfloat16
        self.cfg = cfg
        self.identity = identity
        self.head_params = head_params
        self.torso_params = torso_params
        self.latent = (latent_codes[0] if latent_codes is not None
                       else None)
        self.smooth = bool(smooth_audio)
        # centered window [i - smo//2, i - smo//2 + smo): future frames
        # needed before frame i's feature window is complete
        self.lookahead = (cfg.smo_size - cfg.smo_size // 2 - 1
                          if self.smooth else 0)
        self.frame_times: List[float] = []

        H, W = identity.hw
        head_cfg = variant_nerf_config(cfg)
        render_cfg = cfg.render_config()
        self._bc = jnp.asarray(identity.bc_img, jnp.float32) / 255.0
        self._pose0 = jnp.asarray(identity.poses[0])

        prior_mask = None
        pf = {}
        if use_prior:
            if torso_params is None:
                from idealnerf_tpu.eval.renderer import foreground_prior

                mask_np, _ = foreground_prior(identity,
                                              head_parse=head_parse)
                prior_mask = jnp.asarray(mask_np)
            else:
                from idealnerf_tpu.eval.renderer import (
                    foreground_prior_fields,
                )

                mh, mt = foreground_prior_fields(identity,
                                                 head_parse=head_parse)
                pf = dict(prior_mask_head=mh, prior_mask_torso=mt)
        if isinstance(bounds, dict):
            if torso_params is None:
                raise ValueError("per-field bounds dict is for the "
                                 "composite stream")
            pf.update(bounds_head=bounds.get("head"),
                      bounds_torso=bounds.get("torso"))
            near, far = identity.near, identity.far
        else:
            near = bounds[0] if bounds is not None else identity.near
            far = bounds[1] if bounds is not None else identity.far

        if torso_params is None:
            from idealnerf_tpu.eval.temporal import (
                make_temporal_frame_renderer,
            )

            self._render = make_temporal_frame_renderer(
                head_cfg, H, W, identity.focal, near, far, render_cfg,
                cx=identity.cx, cy=identity.cy,
                compute_dtype=compute_dtype, s_delta=s_delta,
                prior_mask=prior_mask, delta_keep=delta_keep,
                uni_frac=uni_frac, kf_blend=kf_blend,
                dilate_every=dilate_every, roll_k=self.roll_k,
            )
        else:
            from idealnerf_tpu.eval.temporal import (
                make_temporal_composite_renderer,
            )
            from idealnerf_tpu.train.torso import torso_nerf_config

            self._render = make_temporal_composite_renderer(
                head_cfg, torso_nerf_config(cfg), H, W, identity.focal,
                identity.near, identity.far, render_cfg,
                cx=identity.cx, cy=identity.cy,
                compute_dtype=compute_dtype, s_delta=s_delta,
                delta_keep_head=delta_keep,
                delta_keep_torso=(delta_keep if dkt is None else dkt),
                s_delta_torso=s_delta_torso, uni_frac=uni_frac,
                kf_blend=kf_blend, freeze_z_torso=freeze_z_torso,
                dilate_every=dilate_every, roll_k=self.roll_k,
                roll_k_torso=self.roll_k_torso, **pf,
            )

        @jax.jit
        def _feat(params, aud_win):
            return apply_audio_net(params["aud_net"], aud_win[None],
                                   win_size=cfg.win_size)[0]

        @jax.jit
        def _att(params, win, valid):
            # zero outside the track, exactly like the offline
            # smoothed_audio_features (reenact.py) / test_torso.py:478-498
            return apply_audio_att_net(params["aud_att"],
                                       jnp.where(valid[:, None], win, 0.0))

        self._feat = _feat
        self._att = _att
        # rolling raw-feature history: feats for pushed frames
        # [n_pushed - len(buf), n_pushed); smo//2 past features suffice
        self._hist = deque(maxlen=cfg.smo_size)
        self._hist_start = 0          # pushed-frame index of _hist[0]
        self._pending = deque()       # (expr, pose) per pushed frame
        self._n_pushed = 0
        self._out_i = 0               # next frame index to emit
        self._cache = None
        self._closed = False

    @property
    def algorithmic_latency_frames(self) -> int:
        """Lookahead frames before the first emission (0 unsmoothed)."""
        return self.lookahead

    def warmup(self) -> float:
        """Compile every program the serving loop will hit — keyframe,
        first-delta (keyframe-shaped cache) and steady-delta — plus the
        audio feature/smoothing programs, on dummy inputs, without
        touching stream state. Call before going live: the first pushes
        otherwise stall on compiles. Returns the wall seconds spent."""
        t0 = time.time()
        zero_win = jnp.zeros((self.cfg.win_size, 29), jnp.float32)
        feat = self._feat(self.head_params, zero_win)
        smo = self.cfg.smo_size
        feat = self._att(self.head_params,
                         jnp.tile(feat[None], (smo, 1)),
                         jnp.ones((smo,), bool))
        expr = (jnp.zeros((self.cfg.dim_expr,), jnp.float32)
                if self.cfg.dim_expr > 0 else None)
        aud_arg, expr_arg = variant_conditioning(
            self.head_params, self.cfg, feat, expr)
        pose = jnp.asarray(self.identity.poses[0])
        cache = None
        for _ in range(3):  # keyframe -> first delta -> steady delta
            if self.torso_params is None:
                frame, cache = self._render(
                    self.head_params, pose, self._bc, aud=aud_arg,
                    expr=expr_arg, latent=self.latent, cache=cache)
            else:
                from idealnerf_tpu.train.torso import torso_signal

                signal = torso_signal(feat, pose, self.cfg.dim_aud_body)
                frame, cache = self._render(
                    self.head_params, self.torso_params, pose,
                    self._pose0, self._bc, aud=aud_arg, signal=signal,
                    expr=expr_arg, latent=self.latent, cache=cache)
        np.asarray(frame)  # force execution through the async runtime
        return time.time() - t0

    def push(self, aud_window, expr=None, pose=None):
        """Feed one frame's (16, 29) DeepSpeech window; returns the next
        ready frame (H, W, 3) float32 in [0, 1], or None while the
        smoothing lookahead warms up."""
        if self._closed:
            raise RuntimeError("stream is flushed/closed")
        feat = self._feat(self.head_params,
                          jnp.asarray(aud_window, jnp.float32))
        self._hist.append(feat)
        self._pending.append((expr, pose))
        self._n_pushed += 1
        self._hist_start = self._n_pushed - len(self._hist)
        if self._out_i + self.lookahead < self._n_pushed:
            return self._emit()
        return None

    def push_device(self, aud_window, expr=None, pose=None):
        """push() variant that returns the frame as a DEVICE array
        without the host fetch (no np.asarray, no implicit sync) — the
        measurement hook for isolating device compute from transport
        RTT: dispatch K pushes back-to-back, force execution once with
        a single scalar fetch, and the wall is RTT + K·compute
        (scripts/stream_latency.py's queue-depth sweep)."""
        if self._closed:
            raise RuntimeError("stream is flushed/closed")
        feat = self._feat(self.head_params,
                          jnp.asarray(aud_window, jnp.float32))
        self._hist.append(feat)
        self._pending.append((expr, pose))
        self._n_pushed += 1
        self._hist_start = self._n_pushed - len(self._hist)
        if self._out_i + self.lookahead < self._n_pushed:
            return self._emit(device=True)
        return None

    def flush(self) -> List[np.ndarray]:
        """End of stream: render the frames still inside the lookahead
        window (their future features are zero, like the offline track
        end) and close the stream."""
        self._closed = True
        out = []
        while self._out_i < self._n_pushed:
            out.append(self._emit())
        return out

    # -- internals ----------------------------------------------------

    def _smoothed_feat(self, i: int) -> jnp.ndarray:
        """AudioAttNet-smoothed feature for frame i (centered window,
        zeros outside [0, n_pushed) — and beyond the end only once the
        stream is closed, which is the only time _emit needs it)."""
        if not self.smooth:
            return self._hist[i - self._hist_start]
        smo = self.cfg.smo_size
        half = smo // 2
        rows, valid = [], []
        zero = jnp.zeros_like(self._hist[0])
        for j in range(i - half, i - half + smo):
            ok = 0 <= j < self._n_pushed
            rows.append(self._hist[j - self._hist_start] if ok else zero)
            valid.append(ok)
        return self._att(self.head_params, jnp.stack(rows),
                         jnp.asarray(valid))

    def _emit(self, device: bool = False):
        t0 = time.time()
        i = self._out_i
        expr, pose = self._pending.popleft()
        if pose is None:
            pose = self.identity.poses[i % self.identity.size]
        pose = jnp.asarray(pose)
        if expr is None and self.cfg.dim_expr > 0:
            expr = self.identity.exprs[i % self.identity.size]
        expr = (jnp.asarray(expr, jnp.float32)
                if expr is not None and self.cfg.dim_expr > 0 else None)

        aud_feat = self._smoothed_feat(i)
        aud_arg, expr_arg = variant_conditioning(
            self.head_params, self.cfg, aud_feat, expr)
        # rolling mode: only frame 0 is a keyframe, the cache then lives
        # forever (each ray refreshes via its slice every roll_k frames)
        cache = (self._cache if (self.roll_k and i > 0)
                 else None if i % self.refresh == 0 else self._cache)
        if self.torso_params is None:
            frame, self._cache = self._render(
                self.head_params, pose, self._bc, aud=aud_arg,
                expr=expr_arg, latent=self.latent, cache=cache)
        else:
            from idealnerf_tpu.train.torso import torso_signal

            signal = torso_signal(aud_feat, pose, self.cfg.dim_aud_body)
            frame, self._cache = self._render(
                self.head_params, self.torso_params, pose, self._pose0,
                self._bc, aud=aud_arg, signal=signal, expr=expr_arg,
                latent=self.latent, cache=cache)
        frame = jnp.clip(frame, 0.0, 1.0)
        if not device:
            frame = np.asarray(frame)
        self._out_i += 1
        self.frame_times.append(time.time() - t0)
        return frame
