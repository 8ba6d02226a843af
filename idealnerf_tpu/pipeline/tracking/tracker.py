"""3DMM tracker (reference: data_util/face_tracking/face_tracker.py:29-347).

Stage parity:
1. focal grid search 600..1400 in steps of 100 — short landmark fit per
   candidate, keep the focal with the lowest loss (:55-114);
2. global fit — shared identity coefficients, per-frame expression /
   euler / translation, Adam on landmark MSE (+ small coefficient
   regularization) (:116-177);
3. temporal refinement — continued fit with Laplacian smoothing over the
   euler/trans/exp trajectories;
4. photometric fit (:179-235): texture + SH lighting + pose/exp/id on a
   10-frame batch through the differentiable soft rasterizer
   (rasterizer.Render3DMM), masked color loss (util.py cal_col_loss);
5. sliding per-batch refinement (:248-343): per 10-frame window, 50 Adam
   steps on 0.5·col + 8·lan + 1e5·lap(rigid-vertex trajectories over the
   previous-5+window frames) + regexp, landmark weight dropping to 1.5
   after iter 30.

Landmarks are contour-aware when the model carries silhouette candidate
rows (facemodel.get_3dlandmarks). Stages 1-3 are single ``lax.scan``
Adam programs under jit; stages 4-5 jit one window step and loop windows
on the host (each window consumes the previous windows' refined values,
exactly the reference's data dependence).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idealnerf_tpu.pipeline.tracking.facemodel import Face3DMM
from idealnerf_tpu.pipeline.tracking.geometry import (
    euler2rot, forward_transform, lap_loss, landmark_loss, rot_trans_pts,
)
from idealnerf_tpu.pipeline.tracking.rasterizer import RasterConfig, Render3DMM
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.tracker")


class TrackResult(NamedTuple):
    focal: float
    id_coef: np.ndarray    # (n_id,)
    exp: np.ndarray        # (N, n_exp)
    euler: np.ndarray      # (N, 3)
    trans: np.ndarray      # (N, 3)
    loss: float
    tex: Optional[np.ndarray] = None    # (n_tex,) when photometric ran
    light: Optional[np.ndarray] = None  # (N, 27)


def masked_color_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                      mask: jnp.ndarray) -> jnp.ndarray:
    """util.py cal_col_loss: mean over frames of sum(|pred-gt|_2 · mask)
    / sum(mask), colors in 0..255 (the /255 scales the norm)."""
    err = jnp.sqrt(jnp.sum((pred - gt) ** 2, -1) + 1e-12) * mask / 255.0
    return jnp.mean(jnp.sum(err, (1, 2)) / (jnp.sum(mask, (1, 2)) + 1e-8))


class FaceTracker:
    def __init__(self, model: Face3DMM, img_h: int, img_w: int,
                 focal_candidates: Sequence[float] = tuple(range(600, 1500, 100)),
                 init_z: float = -7.0,
                 photometric_hook: Optional[Callable] = None,
                 raster_cfg: Optional[RasterConfig] = None):
        self.model = model
        self.h, self.w = img_h, img_w
        self.cxy = (img_w / 2.0, img_h / 2.0)
        self.focal_candidates = list(focal_candidates)
        self.init_z = init_z
        self.photometric_hook = photometric_hook
        self.raster_cfg = raster_cfg

    # ------------------------------------------------------------ internals

    def _project_landmarks(self, params, focal):
        lan3d = self.model.get_3dlandmarks(
            params["id"][None], params["exp"], params["euler"],
            params["trans"], focal, self.cxy)
        return forward_transform(lan3d, params["euler"], params["trans"],
                                 focal, self.cxy)[..., :2]

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

    # ----------------------------------------------------------- photometric

    def _make_renderer(self, focal) -> Render3DMM:
        cfg = self.raster_cfg or RasterConfig(height=self.h, width=self.w)
        return Render3DMM(focal, self.h, self.w, self.model.tris, cfg)

    def _renderer_checked(self, focal, id_c, exp, euler, trans, tex,
                          light) -> Render3DMM:
        """Renderer whose bin capacity is verified on a probe frame.

        Bin overflow silently drops (tile, face) pairs (rasterize_soft),
        which poisons photometric fits with missing geometry; the
        capacity is doubled until the probe renders clean (each retry
        recompiles, so this runs once per photometric stage)."""
        renderer = self._make_renderer(focal)
        for _ in range(4):
            _, ov = self._render_window(
                renderer, id_c, exp[:1], euler[:1], trans[:1], tex,
                light[:1], return_overflow=True)
            if int(ov) == 0:
                return renderer
            # capacity + total dropped pairs upper-bounds the worst
            # single tile's need, so this converges in one retry
            cap = renderer.cfg.max_faces_per_tile
            new_cap = int(-(-max(2 * cap, cap + int(ov)) // 8) * 8)
            cfg = renderer.cfg._replace(max_faces_per_tile=new_cap)
            logger.warning(
                "raster bin overflow %d at capacity %d — raising to %d",
                int(ov), cap, new_cap)
            renderer = Render3DMM(focal, self.h, self.w, self.model.tris,
                                  cfg)
        logger.error("raster bins still overflow at capacity %d; the "
                     "photometric fit will see incomplete geometry",
                     renderer.cfg.max_faces_per_tile)
        return renderer

    def _render_window(self, renderer, id_c, exp, euler, trans, tex, light,
                       return_overflow: bool = False):
        geometry = self.model.geometry(id_c[None], exp)
        rot = euler2rot(euler)
        rott = rot_trans_pts(geometry, rot, trans)
        texture = self.model.texture(tex[None])
        texture = jnp.broadcast_to(texture, geometry.shape)
        return renderer(rott, texture, light,
                        return_overflow=return_overflow)  # (B, H, W, 4)

    def _photometric_initial(self, params, images, landmarks, focal,
                             batch: int, steps: int):
        """face_tracker.py:179-235: joint tex/light/pose/exp/id fit on an
        evenly spaced frame batch. Returns updated params + tex + mean
        light (broadcast to every frame, :240-241)."""
        n = images.shape[0]
        renderer = self._renderer_checked(
            focal, params["id"], params["exp"], params["euler"],
            params["trans"], jnp.zeros((self.model.n_tex,)),
            jnp.zeros((1, 27)))
        sel = np.arange(0, n, max(int(n / batch), 1))[:batch]
        sel_imgs = jnp.asarray(images[sel], jnp.float32)
        sel_lms = jnp.asarray(landmarks[sel], jnp.float32)

        fit = {"id": params["id"], "exp": params["exp"][sel],
               "euler": params["euler"][sel], "trans": params["trans"][sel],
               "tex": jnp.zeros((self.model.n_tex,)),
               "light": jnp.zeros((len(sel), 27))}
        # two Adams, reference lrs (:194-196); reference decays both x0.2
        # at iter 50 — folded into a piecewise schedule
        sched_tl = optax.piecewise_constant_schedule(0.1, {50: 0.2})
        sched_pose = optax.piecewise_constant_schedule(0.01, {50: 0.2})
        label = {"id": "p", "exp": "p", "euler": "p", "trans": "p",
                 "tex": "t", "light": "t"}
        opt = optax.multi_transform(
            {"t": optax.adam(sched_tl), "p": optax.adam(sched_pose)}, label)

        def loss_fn(q, step):
            proj = self._project_landmarks(
                {k: q[k] for k in ("id", "exp", "euler", "trans")}, focal)
            loss_lan = landmark_loss(proj, sel_lms)
            regid = jnp.mean(q["id"] ** 2)
            regexp = jnp.mean(q["exp"] ** 2)
            img = self._render_window(renderer, q["id"], q["exp"], q["euler"],
                                      q["trans"], q["tex"], q["light"])
            mask = jax.lax.stop_gradient(img[..., 3]) > 0.0
            loss_col = masked_color_loss(img[..., :3], sel_imgs, mask)
            # weight switch after iter 50 (:222-224)
            late = step > 50
            w_lan = jnp.where(late, 0.05, 3.0)
            w_id = jnp.where(late, 1.0, 2.0)
            w_exp = jnp.where(late, 0.8, 1.0)
            return loss_col + w_lan * loss_lan + w_id * regid + w_exp * regexp

        @jax.jit
        def run(fit):
            state = opt.init(fit)

            def body(carry, step):
                q, s = carry
                loss, g = jax.value_and_grad(loss_fn)(q, step)
                updates, s = opt.update(g, s, q)
                return (optax.apply_updates(q, updates), s), loss

            (fit, _), losses = jax.lax.scan(body, (fit, state),
                                            jnp.arange(steps))
            return fit, losses[-1]

        fit, loss = run(fit)
        logger.info("photometric initial fit: col-loss %.4f", float(loss))
        params = dict(params)
        params["id"] = fit["id"]
        params["exp"] = params["exp"].at[sel].set(fit["exp"])
        params["euler"] = params["euler"].at[sel].set(fit["euler"])
        params["trans"] = params["trans"].at[sel].set(fit["trans"])
        light = jnp.tile(jnp.mean(fit["light"], 0)[None], (n, 1))
        return params, fit["tex"], light

    def _photometric_refine(self, params, tex, light, images, landmarks,
                            focal, batch: int, steps: int):
        """face_tracker.py:248-343: sliding-window photometric refinement
        with a 1e5-weighted temporal Laplacian over the rigid-vertex
        trajectories (previous 5 refined frames + current window)."""
        n = images.shape[0]
        renderer = self._renderer_checked(
            focal, params["id"], params["exp"], params["euler"],
            params["trans"], tex, light)
        rigid = (self.model.rigid_ids if self.model.rigid_ids is not None
                 else self.model.keypoints[:20])
        pre_num = 5
        id_c = jax.lax.stop_gradient(params["id"])
        tex = jax.lax.stop_gradient(tex)
        opt = optax.adam(0.005)

        def rigid_traj(exp, euler, trans):
            geo = self.model.geometry_sub(id_c[None], exp, rigid)
            rott = rot_trans_pts(geo, euler2rot(euler), trans)
            return rott.reshape(rott.shape[0], -1)   # (T, 3R)

        def window_loss(q, pre, imgs, lms, step, has_pre):
            proj = self._project_landmarks(
                {"id": id_c, "exp": q["exp"], "euler": q["euler"],
                 "trans": q["trans"]}, focal)
            loss_lan = landmark_loss(proj, lms)
            regexp = jnp.mean(q["exp"] ** 2)
            img = self._render_window(renderer, id_c, q["exp"], q["euler"],
                                      q["trans"], tex, q["light"])
            mask = jax.lax.stop_gradient(img[..., 3]) > 0.0
            loss_col = masked_color_loss(img[..., :3], imgs, mask)
            if has_pre:
                exp = jnp.concatenate([pre["exp"], q["exp"]])
                euler = jnp.concatenate([pre["euler"], q["euler"]])
                trans = jnp.concatenate([pre["trans"], q["trans"]])
            else:
                exp, euler, trans = q["exp"], q["euler"], q["trans"]
            loss_lap = lap_loss(rigid_traj(exp, euler, trans))
            w_lan = jnp.where(step > 30, 1.5, 8.0)
            return (0.5 * loss_col + w_lan * loss_lan
                    + 1e5 * loss_lap + 1.0 * regexp)

        def make_step(has_pre):
            @jax.jit
            def run(q, pre, imgs, lms):
                state = opt.init(q)

                def body(carry, step):
                    p, s = carry
                    loss, g = jax.value_and_grad(window_loss)(
                        p, pre, imgs, lms, step, has_pre)
                    updates, s = opt.update(g, s, p)
                    return (optax.apply_updates(p, updates), s), loss

                (q, _), losses = jax.lax.scan(body, (q, state),
                                              jnp.arange(steps))
                return q, losses[-1]
            return run

        run_first = make_step(False)
        run_rest = make_step(True)

        exp, euler, trans = params["exp"], params["euler"], params["trans"]
        n_win = int((n - 1) / batch + 1)
        for i in range(n_win):
            start = min(i * batch, n - batch)
            ids = np.arange(start, start + batch)
            q = {"exp": exp[ids], "euler": euler[ids], "trans": trans[ids],
                 "light": light[ids]}
            imgs = jnp.asarray(images[ids], jnp.float32)
            lms = jnp.asarray(landmarks[ids], jnp.float32)
            if i > 0:
                pre_ids = np.arange(start - pre_num, start)
                pre = {"exp": exp[pre_ids], "euler": euler[pre_ids],
                       "trans": trans[pre_ids]}
                q, loss = run_rest(q, pre, imgs, lms)
            else:
                q, loss = run_first(q, None, imgs, lms)
            exp = exp.at[ids].set(q["exp"])
            euler = euler.at[ids].set(q["euler"])
            trans = trans.at[ids].set(q["trans"])
            light = light.at[ids].set(q["light"])
            logger.info("photometric window %d/%d: loss %.4f",
                        i + 1, n_win, float(loss))
        return {"id": id_c, "exp": exp, "euler": euler, "trans": trans}, light

    # ---------------------------------------------------------------- fit

    def fit(self, landmarks: np.ndarray, images: Optional[np.ndarray] = None,
            steps_focal: int = 100, steps_global: int = 600,
            steps_refine: int = 200, lr: float = 0.03,
            reg: float = 1e-3, lap_weight: float = 1e-2,
            photo_batch: int = 10, photo_steps: int = 71,
            photo_refine_steps: int = 50) -> TrackResult:
        """landmarks (N, 68, 2) detected pixel coords; images (N, H, W, 3)
        uint8/float 0..255 enables the photometric stages -> TrackResult."""
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

        tex = light = None
        can_photo = (self.model.tris is not None
                     and self.model.base_tex is not None)
        if images is not None and can_photo:
            images = np.asarray(images)
            batch = min(photo_batch, n)
            params, tex, light = self._photometric_initial(
                params, images, landmarks, focal, batch, photo_steps)
            params, light = self._photometric_refine(
                params, tex, light, images, landmarks, focal, batch,
                photo_refine_steps)
        elif images is not None:
            logger.warning("photometric stage skipped: model lacks "
                           "texture basis or triangulation")
        if self.photometric_hook is not None:
            params = self.photometric_hook(self.model, params, focal)

        return TrackResult(
            focal=focal,
            id_coef=np.asarray(params["id"]),
            exp=np.asarray(params["exp"]),
            euler=np.asarray(params["euler"]),
            trans=np.asarray(params["trans"]),
            loss=float(loss),
            tex=None if tex is None else np.asarray(tex),
            light=None if light is None else np.asarray(light),
        )
