"""Linear 3DMM face model (reference: data_util/face_tracking/
facemodel.py): geo = (id·sig_id)·B_id + (exp·sig_exp)·B_exp + mu, texture
analogously, 68-keypoint selection with per-frame contour-aware jaw
landmarks (facemodel.py:48-90). The Basel Face Model data (3DMM_info.npy
+ keys_info.npy, produced offline by convert_BFM.py) is loaded when
present; tests use synthetic bases of the same structure."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.pipeline.tracking.geometry import forward_transform


class Face3DMM:
    def __init__(self, mu: np.ndarray, base_id: np.ndarray,
                 base_exp: np.ndarray, keypoints: np.ndarray,
                 mu_tex: Optional[np.ndarray] = None,
                 base_tex: Optional[np.ndarray] = None,
                 tris: Optional[np.ndarray] = None,
                 sig_id: Optional[np.ndarray] = None,
                 sig_exp: Optional[np.ndarray] = None,
                 sig_tex: Optional[np.ndarray] = None,
                 left_contour: Optional[np.ndarray] = None,
                 right_contour: Optional[np.ndarray] = None,
                 rigid_ids: Optional[np.ndarray] = None):
        """mu (3V,), base_id (3V, n_id), base_exp (3V, n_exp),
        keypoints (68,) vertex indices of the landmark set.

        sig_id/sig_exp/sig_tex: coefficient scales applied before the
        basis matmul (facemodel.py:49-50, 93-94, 104-105, 110); identity
        when absent. left_contour/right_contour (8, P): per jaw landmark
        row, candidate silhouette vertex indices (keys_info.npy);
        rigid_ids: vertex subset used for the temporal Laplacian in the
        tracker's sliding refinement (face_tracker.py:310-312)."""
        self.mu = jnp.asarray(mu, jnp.float32)
        self.base_id = jnp.asarray(base_id, jnp.float32)
        self.base_exp = jnp.asarray(base_exp, jnp.float32)
        self.keypoints = np.asarray(keypoints, np.int32)
        self.mu_tex = None if mu_tex is None else jnp.asarray(mu_tex, jnp.float32)
        self.base_tex = None if base_tex is None else jnp.asarray(base_tex, jnp.float32)
        self.tris = None if tris is None else np.asarray(tris, np.int32)
        n_id, n_exp = self.base_id.shape[1], self.base_exp.shape[1]
        self.sig_id = (jnp.ones((n_id,)) if sig_id is None
                       else jnp.asarray(sig_id, jnp.float32).reshape(-1)[:n_id])
        self.sig_exp = (jnp.ones((n_exp,)) if sig_exp is None
                        else jnp.asarray(sig_exp, jnp.float32).reshape(-1)[:n_exp])
        self.sig_tex = None if sig_tex is None else jnp.asarray(
            sig_tex, jnp.float32).reshape(-1)
        self.left_contour = (None if left_contour is None
                             else np.asarray(left_contour, np.int32))
        self.right_contour = (None if right_contour is None
                              else np.asarray(right_contour, np.int32))
        self.rigid_ids = (None if rigid_ids is None
                          else np.asarray(rigid_ids, np.int32))

    @property
    def n_vertices(self) -> int:
        return self.mu.shape[0] // 3

    @property
    def dims(self):
        return self.base_id.shape[1], self.base_exp.shape[1]

    @property
    def has_contours(self) -> bool:
        return self.left_contour is not None and self.right_contour is not None

    def _geo_flat(self, id_coef, exp_coef, sel3: Optional[np.ndarray] = None):
        """Sig-scaled linear combination over (optionally) a flat-index
        subset sel3 of the 3V geometry axis (facemodel.py:55-59)."""
        idc = id_coef * self.sig_id
        expc = exp_coef * self.sig_exp
        if sel3 is None:
            return idc @ self.base_id.T + expc @ self.base_exp.T + self.mu[None]
        return (idc @ self.base_id[sel3].T + expc @ self.base_exp[sel3].T
                + self.mu[sel3][None])

    def geometry(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray) -> jnp.ndarray:
        """(B, n_id), (B, n_exp) -> (B, V, 3) (facemodel.py:102-107)."""
        g = self._geo_flat(id_coef, exp_coef)
        return g.reshape(g.shape[0], -1, 3)

    def geometry_sub(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray,
                     vert_idx: np.ndarray) -> jnp.ndarray:
        """Geometry restricted to a vertex subset (facemodel.py:92-100)."""
        sel3 = (3 * np.asarray(vert_idx, np.int64)[:, None]
                + np.arange(3)[None, :]).reshape(-1)
        g = self._geo_flat(id_coef, exp_coef, sel3)
        return g.reshape(g.shape[0], -1, 3)

    def landmarks(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray) -> jnp.ndarray:
        """(B, 68, 3) keypoint vertices (fixed indices, no contour)."""
        return self.geometry_sub(id_coef, exp_coef, self.keypoints)

    def get_3dlandmarks(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray,
                        euler: jnp.ndarray, trans: jnp.ndarray,
                        focal, cxy) -> jnp.ndarray:
        """Contour-aware 68 3D landmarks (facemodel.py:48-90).

        Jaw rows 0:8 / 9:17 are re-selected per frame from candidate
        silhouette vertices by min / max projected x under the current
        pose; remaining rows come from the fixed keypoint set. Selection
        indices carry no gradient (hard argmin, like the reference's
        integer indexing); positions do."""
        lands = self.landmarks(id_coef, exp_coef)       # (B, 68, 3)
        if not self.has_contours:
            return lands

        def contour_pick(cands: np.ndarray, take_max: bool):
            # cands (8, P) vertex ids -> (B, 8, 3) selected vertices
            flat = cands.reshape(-1)
            geo = self.geometry_sub(id_coef, exp_coef, flat)   # (B, 8P, 3)
            proj_x = forward_transform(geo, euler, trans, focal, cxy)[..., 0]
            b = geo.shape[0]
            px = proj_x.reshape(b, cands.shape[0], cands.shape[1])
            idx = jnp.argmax(px, -1) if take_max else jnp.argmin(px, -1)
            idx = jax.lax.stop_gradient(idx)                   # (B, 8)
            geo = geo.reshape(b, cands.shape[0], cands.shape[1], 3)
            return jnp.take_along_axis(geo, idx[..., None, None], axis=2)[:, :, 0]

        left = contour_pick(self.left_contour, take_max=False)
        right = contour_pick(self.right_contour, take_max=True)
        lands = lands.at[:, 0:8].set(left)
        lands = lands.at[:, 9:17].set(right)
        return lands

    def texture(self, tex_coef: jnp.ndarray) -> jnp.ndarray:
        """(B, n_tex) -> (B, V, 3) (facemodel.py:109-112)."""
        assert self.base_tex is not None and self.mu_tex is not None
        if self.sig_tex is not None:
            tex_coef = tex_coef * self.sig_tex[: tex_coef.shape[-1]]
        t = tex_coef @ self.base_tex.T + self.mu_tex[None]
        return t.reshape(t.shape[0], -1, 3)

    @property
    def n_tex(self) -> int:
        return 0 if self.base_tex is None else self.base_tex.shape[1]

    @classmethod
    def load(cls, path: str) -> "Face3DMM":
        """Load convert_BFM.py-format 3DMM_info.npy (+ keys_info.npy /
        topology_info.npy beside it when present — facemodel.py:15-46,
        render_3dmm.py:90-95)."""
        info = np.load(path, allow_pickle=True).item()
        kw = {}
        base = os.path.dirname(path)
        keys_path = os.path.join(base, "keys_info.npy")
        if os.path.exists(keys_path):
            keys = np.load(keys_path, allow_pickle=True).item()
            kw.update(keypoints=keys["keyinds"],
                      left_contour=keys.get("left_contour"),
                      right_contour=keys.get("right_contour"),
                      rigid_ids=keys.get("rigid_ids"))
        else:
            kw.update(keypoints=info["keypoints"])
        topo_path = os.path.join(base, "topology_info.npy")
        tris = info.get("tris")
        if tris is None and os.path.exists(topo_path):
            tris = np.load(topo_path, allow_pickle=True).item().get("tris")
        if "mu_shape" in info:
            # reference centers mu per-axis and scales bases by 1e-5
            # (facemodel.py:21-28)
            mu = (info["mu_shape"] + info["mu_exp"]).reshape(-1, 3)
            mu = (mu - mu.mean(0, keepdims=True)).reshape(-1) / 100000.0
            base_id = info["b_shape"].T / 100000.0
            base_exp = info["b_exp"].T / 100000.0
        else:
            mu, base_id, base_exp = info["mu"], info["base_id"], info["base_exp"]
        if "b_tex" in info:          # reference layout: (n_tex, 3V)
            base_tex = np.asarray(info["b_tex"]).T
        else:
            base_tex = info.get("base_tex")
        return cls(
            mu=mu, base_id=base_id, base_exp=base_exp,
            mu_tex=info.get("mu_tex"),
            base_tex=base_tex,
            tris=tris,
            sig_id=info.get("sig_shape"),
            sig_exp=info.get("sig_exp"),
            sig_tex=info.get("sig_tex"),
            **kw,
        )

    @classmethod
    def synthetic(cls, n_vertices: int = 300, n_id: int = 20, n_exp: int = 10,
                  n_tex: int = 8, seed: int = 0,
                  with_contours: bool = False,
                  n_lat: int = 15, n_lon: int = 20,
                  shell: bool = False) -> "Face3DMM":
        """A random-basis stand-in with the BFM structure, for tests: a
        face-like ellipsoid mean with smooth random deformation bases,
        optional texture model, triangulation, and silhouette contour
        candidate rows (lat/long grid mesh when with_contours).

        ``shell=True`` builds an OPEN front-facing dome over a regular
        (n_lat, n_lon) grid instead of the closed ellipsoid — the
        topology of the real BFM (a face shell, no back surface, no
        polar density singularities). Reference scale
        (face_tracker.py:37-53, convert_BFM output):
        ``synthetic(n_id=100, n_exp=79, n_lat=150, n_lon=230,
        shell=True, with_contours=True)`` — 34 500 vertices / 68 206
        triangles, matching the BFM's 34 650 / ~69k."""
        rng = np.random.RandomState(seed)
        grid = n_lat * n_lon
        if shell:
            n_vertices = grid
            v, u = np.meshgrid(np.linspace(-1.0, 1.0, n_lat),
                               np.linspace(-1.0, 1.0, n_lon),
                               indexing="ij")
            u, v = u.reshape(-1), v.reshape(-1)
            dome = np.sqrt(np.maximum(1.0 - 0.5 * (u * u + v * v), 0.0))
            mu = np.stack([0.8 * u, 1.0 * v, 0.6 * dome], -1).reshape(-1)

            def smooth_basis(n_modes, scale):
                # SPATIALLY SMOOTH random bases (the real BFM's are):
                # iid-per-vertex noise would make neighboring vertices
                # independent, i.e. a shaggy mesh whose triangle bboxes
                # blow up with vertex count — low-frequency sinusoid
                # fields keep triangle size ~grid spacing at any V
                freq = rng.uniform(0.5, 3.0, (n_modes, 2))
                phase = rng.uniform(0, 2 * np.pi, (n_modes, 3))
                amp = rng.randn(n_modes, 3) * scale
                arg = (freq[:, 0, None] * u[None] +
                       freq[:, 1, None] * v[None])        # (K, V)
                b = (amp[:, None, :] *
                     np.sin(arg[:, :, None] + phase[:, None, :]))  # (K,V,3)
                return b.reshape(n_modes, -1).T.astype(np.float32)

            base_id = smooth_basis(n_id, 0.02)
            base_exp = smooth_basis(n_exp, 0.01)
            # landmarks in the central face region
            rows = (n_lat // 4 + rng.choice(n_lat // 2, 68)) * n_lon
            keypoints = rows + n_lon // 4 + rng.choice(n_lon // 2, 68)
            tris = []
            for i in range(n_lat - 1):
                for j in range(n_lon - 1):
                    a = i * n_lon + j
                    b = a + 1
                    c = a + n_lon
                    d = c + 1
                    tris += [[a, b, c], [b, d, c]]
            kw = {"tris": np.asarray(tris, np.int32)}
            if n_tex:
                kw["mu_tex"] = np.full(3 * n_vertices, 128.0, np.float32)
                kw["base_tex"] = (
                    rng.randn(3 * n_vertices, n_tex).astype(np.float32) * 20.0
                )
            if with_contours:
                rows = np.linspace(n_lat // 2, n_lat - 1, 8).astype(int)
                ring = lambda r: r * n_lon + np.arange(n_lon)
                kw["left_contour"] = np.stack([ring(r) for r in rows])
                kw["right_contour"] = np.stack([ring(r) for r in rows])
                kw["rigid_ids"] = rng.choice(n_vertices, 20, replace=False)
            return cls(mu.astype(np.float32), base_id, base_exp,
                       keypoints, **kw)
        use_grid = with_contours or n_vertices == grid
        if use_grid:
            n_vertices = grid
            phi = np.repeat(np.linspace(0.3, np.pi - 0.3, n_lat), n_lon)
            th = np.tile(np.linspace(0, 2 * np.pi, n_lon, endpoint=False), n_lat)
        else:
            phi = rng.uniform(0, np.pi, n_vertices)
            th = rng.uniform(0, 2 * np.pi, n_vertices)
        mu = np.stack([
            0.8 * np.sin(phi) * np.cos(th),
            1.0 * np.cos(phi),
            0.6 * np.sin(phi) * np.sin(th),
        ], -1).reshape(-1)
        base_id = rng.randn(3 * n_vertices, n_id).astype(np.float32) * 0.02
        base_exp = rng.randn(3 * n_vertices, n_exp).astype(np.float32) * 0.01
        keypoints = rng.choice(n_vertices, 68, replace=False)
        kw = {}
        if n_tex:
            kw["mu_tex"] = np.full(3 * n_vertices, 128.0, np.float32)
            kw["base_tex"] = rng.randn(3 * n_vertices, n_tex).astype(np.float32) * 20.0
        if use_grid:
            # grid triangulation (wrapping in longitude)
            tris = []
            for i in range(n_lat - 1):
                for j in range(n_lon):
                    a = i * n_lon + j
                    b = i * n_lon + (j + 1) % n_lon
                    c = (i + 1) * n_lon + j
                    d = (i + 1) * n_lon + (j + 1) % n_lon
                    tris += [[a, b, c], [b, d, c]]
            kw["tris"] = np.asarray(tris, np.int32)
        if with_contours:
            # 8 left/right jaw rows: candidates = full longitude rings of
            # the lower half; silhouette selection picks the extreme-x
            # vertex per ring under the current pose.
            rows = np.linspace(n_lat // 2, n_lat - 1, 8).astype(int)
            ring = lambda r: r * n_lon + np.arange(n_lon)
            kw["left_contour"] = np.stack([ring(r) for r in rows])
            kw["right_contour"] = np.stack([ring(r) for r in rows])
            kw["rigid_ids"] = rng.choice(n_vertices, 20, replace=False)
        return cls(mu.astype(np.float32), base_id, base_exp, keypoints, **kw)
