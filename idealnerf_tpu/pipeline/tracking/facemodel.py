"""Linear 3DMM face model (reference: data_util/face_tracking/
facemodel.py): geo = id·B_id + exp·B_exp + mu, texture analogously, with
68-keypoint selection. The Basel Face Model data (3DMM_info.npy, produced
offline by convert_BFM.py) is loaded when present; tests use synthetic
bases of the same structure."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class Face3DMM:
    def __init__(self, mu: np.ndarray, base_id: np.ndarray,
                 base_exp: np.ndarray, keypoints: np.ndarray,
                 mu_tex: Optional[np.ndarray] = None,
                 base_tex: Optional[np.ndarray] = None,
                 tris: Optional[np.ndarray] = None,
                 sig_id: Optional[np.ndarray] = None,
                 sig_exp: Optional[np.ndarray] = None):
        """mu (3V,), base_id (3V, n_id), base_exp (3V, n_exp),
        keypoints (68,) vertex indices of the landmark set
        (facemodel.py:8-47)."""
        self.mu = jnp.asarray(mu, jnp.float32)
        self.base_id = jnp.asarray(base_id, jnp.float32)
        self.base_exp = jnp.asarray(base_exp, jnp.float32)
        self.keypoints = np.asarray(keypoints, np.int32)
        self.mu_tex = None if mu_tex is None else jnp.asarray(mu_tex, jnp.float32)
        self.base_tex = None if base_tex is None else jnp.asarray(base_tex, jnp.float32)
        self.tris = None if tris is None else np.asarray(tris, np.int32)
        self.sig_id = None if sig_id is None else jnp.asarray(sig_id, jnp.float32)
        self.sig_exp = None if sig_exp is None else jnp.asarray(sig_exp, jnp.float32)

    @property
    def n_vertices(self) -> int:
        return self.mu.shape[0] // 3

    @property
    def dims(self):
        return self.base_id.shape[1], self.base_exp.shape[1]

    def geometry(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray) -> jnp.ndarray:
        """(B, n_id), (B, n_exp) -> (B, V, 3) (facemodel.py:102-107)."""
        g = (
            id_coef @ self.base_id.T
            + exp_coef @ self.base_exp.T
            + self.mu[None]
        )
        return g.reshape(g.shape[0], -1, 3)

    def landmarks(self, id_coef: jnp.ndarray, exp_coef: jnp.ndarray) -> jnp.ndarray:
        """(B, 68, 3) keypoint vertices."""
        return self.geometry(id_coef, exp_coef)[:, self.keypoints]

    def texture(self, tex_coef: jnp.ndarray) -> jnp.ndarray:
        assert self.base_tex is not None and self.mu_tex is not None
        t = tex_coef @ self.base_tex.T + self.mu_tex[None]
        return t.reshape(t.shape[0], -1, 3)

    @classmethod
    def load(cls, path: str) -> "Face3DMM":
        """Load a convert_BFM.py-format 3DMM_info.npy."""
        info = np.load(path, allow_pickle=True).item()
        return cls(
            mu=info["mu_shape"] + info["mu_exp"]
            if "mu_shape" in info else info["mu"],
            base_id=info["b_shape"] if "b_shape" in info else info["base_id"],
            base_exp=info["b_exp"] if "b_exp" in info else info["base_exp"],
            keypoints=info["keypoints"],
            mu_tex=info.get("mu_tex"),
            base_tex=info.get("b_tex", info.get("base_tex")),
            tris=info.get("tris"),
            sig_id=info.get("sig_shape"),
            sig_exp=info.get("sig_exp"),
        )

    @classmethod
    def synthetic(cls, n_vertices: int = 300, n_id: int = 20, n_exp: int = 10,
                  seed: int = 0) -> "Face3DMM":
        """A random-basis stand-in with the BFM structure, for tests: a
        face-like ellipsoid mean with smooth random deformation bases."""
        rng = np.random.RandomState(seed)
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
        return cls(mu.astype(np.float32), base_id, base_exp, keypoints)
