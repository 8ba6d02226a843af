"""3DMM landmark tracker (reference: data_util/face_tracking/
face_tracker.py:29-347).

Stage parity:
1. focal grid search 600..1400 in steps of 100 — short landmark fit per
   candidate, keep the focal with the lowest loss (:55-114);
2. global fit — shared identity coefficients, per-frame expression /
   euler / translation, Adam on landmark MSE (+ small coefficient
   regularization) (:116-177);
3. temporal refinement — continued fit with Laplacian smoothing over the
   euler/trans/exp trajectories (cal_lap_loss, weight 1e5 per the
   reference's sliding-window stage :248-343; here the smoothing spans
   the whole sequence in one jitted program instead of python-sliding
   batches).

The photometric stage (:179-235) requires a differentiable rasterizer
(pytorch3d in the reference) and is exposed as ``photometric_hook`` —
wire a rasterizer-based loss callable to enable it.

Every stage is one ``lax.scan`` of Adam steps under jit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idealnerf_tpu.pipeline.tracking.facemodel import Face3DMM
from idealnerf_tpu.pipeline.tracking.geometry import (
    euler2rot, lap_loss, landmark_loss, proj_pts, rot_trans_pts,
)
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.tracker")


class TrackResult(NamedTuple):
    focal: float
    id_coef: np.ndarray    # (n_id,)
    exp: np.ndarray        # (N, n_exp)
    euler: np.ndarray      # (N, 3)
    trans: np.ndarray      # (N, 3)
    loss: float


class FaceTracker:
    def __init__(self, model: Face3DMM, img_h: int, img_w: int,
                 focal_candidates: Sequence[float] = tuple(range(600, 1500, 100)),
                 init_z: float = -7.0,
                 photometric_hook: Optional[Callable] = None):
        self.model = model
        self.h, self.w = img_h, img_w
        self.cxy = (img_w / 2.0, img_h / 2.0)
        self.focal_candidates = list(focal_candidates)
        self.init_z = init_z
        self.photometric_hook = photometric_hook

    # ------------------------------------------------------------ internals

    def _project_landmarks(self, params, focal):
        lan3d = self.model.landmarks(params["id"][None], params["exp"])
        # broadcast shared id over frames: landmarks() consumed id (1, n_id)
        rot = euler2rot(params["euler"])
        geo = rot_trans_pts(lan3d, rot, params["trans"])
        return proj_pts(geo, focal, self.cxy)[..., :2]

    def _loss(self, params, gt_lan, focal, reg: float, lap_w: float):
        proj = self._project_landmarks(params, focal)
        loss = landmark_loss(proj, gt_lan)
        loss = loss + reg * (jnp.mean(params["id"] ** 2) + jnp.mean(params["exp"] ** 2))
        if lap_w > 0:
            loss = loss + (
                lap_loss(params["euler"], lap_w)
                + lap_loss(params["trans"], lap_w)
                + lap_loss(params["exp"], lap_w)
            )
        return loss

    def _fit_stage(self, params, gt_lan, focal, steps, lr, reg, lap_w):
        opt = optax.adam(lr)

        @jax.jit
        def run(params, gt_lan):
            state = opt.init(params)

            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(
                    lambda q: self._loss(q, gt_lan, focal, reg, lap_w)
                )(p)
                updates, s = opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, _), losses = jax.lax.scan(body, (params, state),
                                               None, length=steps)
            return params, losses[-1]

        return run(params, gt_lan)

    def _init_params(self, n_frames):
        n_id, n_exp = self.model.dims
        return {
            "id": jnp.zeros((n_id,)),
            "exp": jnp.zeros((n_frames, n_exp)),
            "euler": jnp.zeros((n_frames, 3)),
            "trans": jnp.tile(
                jnp.array([0.0, 0.0, self.init_z]), (n_frames, 1)
            ),
        }

    # ---------------------------------------------------------------- fit

    def fit(self, landmarks: np.ndarray,
            steps_focal: int = 100, steps_global: int = 600,
            steps_refine: int = 200, lr: float = 0.03,
            reg: float = 1e-3, lap_weight: float = 1e-2) -> TrackResult:
        """landmarks (N, 68, 2) detected pixel coords -> TrackResult."""
        gt = jnp.asarray(landmarks, jnp.float32)
        n = gt.shape[0]
        sel = gt[:: max(n // 16, 1)]  # focal search on a frame subset (:55)

        best = (None, np.inf)
        for focal in self.focal_candidates:
            p0 = self._init_params(sel.shape[0])
            _, loss = self._fit_stage(p0, sel, float(focal), steps_focal,
                                      lr, reg, 0.0)
            loss = float(loss)
            logger.info("focal %d -> loss %.4f", focal, loss)
            if loss < best[1]:
                best = (float(focal), loss)
        focal = best[0]

        params = self._init_params(n)
        params, loss = self._fit_stage(params, gt, focal, steps_global,
                                       lr, reg, 0.0)
        params, loss = self._fit_stage(params, gt, focal, steps_refine,
                                       lr * 0.3, reg, lap_weight)

        if self.photometric_hook is not None:
            params = self.photometric_hook(self.model, params, focal)

        return TrackResult(
            focal=focal,
            id_coef=np.asarray(params["id"]),
            exp=np.asarray(params["exp"]),
            euler=np.asarray(params["euler"]),
            trans=np.asarray(params["trans"]),
            loss=float(loss),
        )
