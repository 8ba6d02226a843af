"""Differentiable soft mesh rasterizer + SH-9 illumination (TPU-native
counterpart of the reference's pytorch3d path, data_util/face_tracking/
render_3dmm.py:32-77 SoftSimpleShader / :80-191 Render_3DMM).

Design (XLA-friendly, all shapes static):

1. **Tile binning** (integer work, no gradients): each face's padded
   screen bbox is expanded into a fixed ``span x span`` block of
   candidate tiles; (tile, face) pairs are sorted by tile id and ranked
   within their tile by a searchsorted trick, then scattered into a
   ``(n_tiles+1, max_faces_per_tile)`` bin table. Faces that overflow a
   tile's capacity are dropped (counted in ``overflow``); pairs outside
   the face's true tile range land in a dump row. This replaces the
   CUDA per-tile face lists of pytorch3d's coarse rasterizer with two
   sorts — the shape-static formulation XLA wants.
2. **Hard face selection** (stop-gradient): per pixel, every candidate
   face in its tile is tested (inside-or-within-blur via signed
   point-triangle distance) and the ``faces_per_pixel`` nearest by
   depth are kept — pytorch3d's fine rasterization, as a masked top-k.
3. **Differentiable re-evaluation**: barycentrics, depth, attribute
   interpolation and the signed distance are recomputed from the
   *selected* faces' vertices with gradients attached (the nvdiffrast
   recipe: discrete visibility is constant, geometry gradients flow
   through barycentrics and the soft edge distance).
4. **Softmax blending**: pytorch3d's ``softmax_rgb_blend`` semantics
   (sigmoid edge alpha, depth-softmax color weights, background delta
   term) — reference shader at render_3dmm.py:62-77.

Distances are measured in NDC units (2/min(H,W) per pixel) so the
reference's sigma/gamma/blur constants (render_3dmm.py:122-128) carry
over unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# pytorch3d BlendParams defaults, as instantiated by the reference
# (render_3dmm.py:122-129): sigma=1e-4, gamma=1e-4, black background.
DEFAULT_SIGMA = 1e-4
DEFAULT_GAMMA = 1e-4
# raster_settings.blur_radius = log(1/1e-4 - 1) * sigma / 18 (:125)
DEFAULT_BLUR = float(np.log(1.0 / 1e-4 - 1.0) * DEFAULT_SIGMA / 18.0)


class RasterConfig(NamedTuple):
    height: int
    width: int
    tile: int = 16                  # pixels per tile side
    max_faces_per_tile: int = 128   # bin capacity (overflow reported)
    span: int = 5                   # max tile-span of a face bbox per axis
    faces_per_pixel: int = 2        # K (reference uses 2, :126)
    sigma: float = DEFAULT_SIGMA
    gamma: float = DEFAULT_GAMMA
    blur_radius: float = DEFAULT_BLUR   # NDC^2 units, like pytorch3d
    znear: float = 0.01
    zfar: float = 20.0

    @classmethod
    def bfm(cls, height: int, width: int) -> "RasterConfig":
        """Tuning for BFM-scale tracking (34.5k vertices / ~69k
        triangles at 450-512² — face_tracker.py:37-53): ~1 face/pixel
        density puts ~220 blur-padded faces in a 16-px-padded 8-px
        tile; cap 256 measures overflow==0 with headroom, span 3 covers
        the ≤8-px padded bboxes (asserted in tests/test_rasterizer.py's
        BFM-scale case).

        Below 450² the same mesh projects into quadratically fewer
        tiles, so per-tile face density grows as (450/min_side)² — the
        fixed 450² capacity overflowed by ~100k (tile, face) pairs at
        128². Capacity scales accordingly (per-pixel gather cost is
        linear in capacity, so low-res renders trade speed for
        correctness)."""
        density = max(1.0, (450.0 / max(min(height, width), 1)) ** 2)
        cap = int(-(-256 * density // 8) * 8)
        return cls(height=height, width=width, tile=8,
                   max_faces_per_tile=cap, span=3)


def _ndc_scale(cfg: RasterConfig) -> float:
    """Pixel -> NDC unit conversion (pytorch3d: short side spans 2)."""
    return 2.0 / min(cfg.height, cfg.width)


# --------------------------------------------------------------- binning


def bin_faces(face_xy: jnp.ndarray, face_z: jnp.ndarray, cfg: RasterConfig,
              pad_px: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(F, 3, 2) pixel-space face vertices -> (n_tiles+1, M) face-id bins.

    Entirely non-differentiable (wrapped in stop_gradient by callers).
    Returns (bins, overflow_count). Bin entries are face indices, F is
    the empty sentinel. Faces behind the camera (any z <= znear) are
    discarded.
    """
    f = face_xy.shape[0]
    ty = -(-cfg.height // cfg.tile)
    tx = -(-cfg.width // cfg.tile)
    n_tiles = ty * tx

    xmin = jnp.min(face_xy[..., 0], axis=1) - pad_px
    xmax = jnp.max(face_xy[..., 0], axis=1) + pad_px
    ymin = jnp.min(face_xy[..., 1], axis=1) - pad_px
    ymax = jnp.max(face_xy[..., 1], axis=1) + pad_px
    valid = jnp.all(face_z > cfg.znear, axis=1)
    valid &= (xmax >= 0) & (ymax >= 0) & (xmin < cfg.width) & (ymin < cfg.height)

    tx0 = jnp.clip(jnp.floor(xmin / cfg.tile), 0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / cfg.tile), 0, tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / cfg.tile), 0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / cfg.tile), 0, ty - 1).astype(jnp.int32)

    # fixed span x span block anchored at (ty0, tx0); offsets beyond the
    # true range -> dump row n_tiles. A face wider than `span` tiles is
    # truncated (huge faces only occur with degenerate geometry).
    dy = jnp.arange(cfg.span, dtype=jnp.int32)
    dx = jnp.arange(cfg.span, dtype=jnp.int32)
    gy = ty0[:, None] + dy[None, :]                      # (F, S)
    gx = tx0[:, None] + dx[None, :]                      # (F, S)
    in_y = gy <= ty1[:, None]
    in_x = gx <= tx1[:, None]
    tile_id = gy[:, :, None] * tx + gx[:, None, :]       # (F, S, S)
    ok = in_y[:, :, None] & in_x[:, None, :] & valid[:, None, None]
    tile_id = jnp.where(ok, tile_id, n_tiles).reshape(-1)
    face_id = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[:, None, None],
        (f, cfg.span, cfg.span)).reshape(-1)

    order = jnp.argsort(tile_id)
    st = tile_id[order]
    sf = face_id[order]
    # rank within tile: position minus index of the tile's first entry
    first = jnp.searchsorted(st, st, side="left")
    rank = jnp.arange(st.shape[0], dtype=jnp.int32) - first.astype(jnp.int32)
    m = cfg.max_faces_per_tile
    keep = (st < n_tiles) & (rank < m)
    overflow = jnp.sum((st < n_tiles) & (rank >= m))
    row = jnp.where(keep, st, n_tiles)
    col = jnp.where(keep, rank, 0)
    bins = jnp.full((n_tiles + 1, m), f, jnp.int32)
    bins = bins.at[row, col].set(jnp.where(keep, sf, f))
    # the dump row may have been written by masked-out entries; reset it
    bins = bins.at[n_tiles].set(f)
    return bins, overflow


# ---------------------------------------------------- per-pixel geometry


def _edge_dist2(p, a, b):
    """Squared distance from points p to segment ab. p (..., 2)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / (jnp.sum(ab * ab, -1) + 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = p - proj
    return jnp.sum(d * d, -1)


def _barycentrics(p, v0, v1, v2):
    """Screen-space barycentrics of p wrt triangle (v0,v1,v2); (..., 3).

    Signed edge functions normalized by the signed area — orientation
    independent (all three flip sign together)."""
    def ef(a, b):
        return (p[..., 0] - a[..., 0]) * (b[..., 1] - a[..., 1]) - (
            p[..., 1] - a[..., 1]) * (b[..., 0] - a[..., 0])
    w0 = ef(v1, v2)
    w1 = ef(v2, v0)
    w2 = ef(v0, v1)
    area = w0 + w1 + w2
    area = jnp.where(jnp.abs(area) < 1e-12,
                     jnp.where(area < 0, -1e-12, 1e-12), area)
    return jnp.stack([w0, w1, w2], -1) / area[..., None]


def _signed_dist2(p, v0, v1, v2, bary):
    """pytorch3d-style signed squared point-triangle distance in the
    units of p (negative inside)."""
    d2 = jnp.minimum(
        _edge_dist2(p, v0, v1),
        jnp.minimum(_edge_dist2(p, v1, v2), _edge_dist2(p, v2, v0)))
    inside = jnp.all(bary >= 0.0, axis=-1)
    return jnp.where(inside, -d2, d2)


# ------------------------------------------------------------- rasterize


@functools.partial(jax.jit, static_argnums=(3, 5))
def rasterize_soft(verts_pix: jnp.ndarray, tris: jnp.ndarray,
                   attrs: jnp.ndarray, cfg: RasterConfig,
                   background: Optional[jnp.ndarray] = None,
                   return_overflow: bool = False) -> jnp.ndarray:
    """Soft-rasterize one mesh.

    verts_pix (V, 3): x_pixel, y_pixel, depth (positive in front; the
      tracker projection proj_pts gives z<0 in front — pass -z).
    tris (F, 3) int32, attrs (V, C) per-vertex attributes (e.g. RGB).
    Returns (H, W, C+1): softmax-blended attributes + alpha; with
    ``return_overflow`` also the scalar count of (tile, face) pairs
    dropped because a bin exceeded ``cfg.max_faces_per_tile``. A nonzero
    count means silently missing geometry in dense regions — callers at
    a new mesh/image scale should check it and bump the capacity (tests
    assert 0 at BFM scale).
    """
    v_xy = verts_pix[:, :2]
    v_z = verts_pix[:, 2]
    face_xy = v_xy[tris]                 # (F, 3, 2)
    face_z = v_z[tris]                   # (F, 3)
    s_ndc = _ndc_scale(cfg)
    blur_pix2 = cfg.blur_radius / (s_ndc * s_ndc)
    pad_px = float(np.sqrt(max(blur_pix2, 0.0))) + 1.0

    bins, overflow = bin_faces(jax.lax.stop_gradient(face_xy),
                               jax.lax.stop_gradient(face_z), cfg, pad_px)

    f = tris.shape[0]
    ty = -(-cfg.height // cfg.tile)
    tx = -(-cfg.width // cfg.tile)
    ts = cfg.tile
    k = cfg.faces_per_pixel

    # pad geometry with a sentinel face (id f) that never wins
    face_xy_p = jnp.concatenate([face_xy, jnp.full((1, 3, 2), 1e9)], 0)
    face_z_p = jnp.concatenate([face_z, jnp.full((1, 3), 1e9)], 0)

    # pixel centers per tile: (ts, ts, 2)
    py, px = jnp.meshgrid(jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          indexing="ij")

    def tile_select(tile_idx):
        """Hard K-selection for one tile -> (ts, ts, K) face ids."""
        cand = bins[tile_idx]                       # (M,)
        cy = (tile_idx // tx) * ts
        cx = (tile_idx % tx) * ts
        p = jnp.stack([px + cx, py + cy], -1)       # (ts, ts, 2)
        fv = face_xy_p[cand]                        # (M, 3, 2)
        fz = face_z_p[cand]                         # (M, 3)
        pb = p[:, :, None, :]                       # (ts, ts, 1, 2)
        bary = _barycentrics(pb, fv[None, None, :, 0], fv[None, None, :, 1],
                             fv[None, None, :, 2])  # (ts, ts, M, 3)
        d2 = _signed_dist2(pb, fv[None, None, :, 0], fv[None, None, :, 1],
                           fv[None, None, :, 2], bary)
        zpix = jnp.sum(bary * fz[None, None], -1)   # (ts, ts, M)
        hit = (d2 <= blur_pix2) & (cand[None, None, :] < f)
        hit &= (zpix > cfg.znear) & (zpix < cfg.zfar)
        key = jnp.where(hit, zpix, jnp.inf)
        _, top = jax.lax.top_k(-key, k)             # nearest K
        sel = cand[top]                             # (ts, ts, K)
        sel_ok = jnp.take_along_axis(hit, top, axis=-1)
        return jnp.where(sel_ok, sel, f)

    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    sel = jax.lax.map(jax.vmap(tile_select), tile_ids.reshape(ty, tx))
    sel = jax.lax.stop_gradient(sel)                # (ty, tx, ts, ts, K)
    pix_face = sel.transpose(0, 2, 1, 3, 4).reshape(ty * ts, tx * ts, k)
    pix_face = pix_face[: cfg.height, : cfg.width]  # (H, W, K)

    # ---- differentiable re-evaluation on the selected faces
    c = attrs.shape[-1]
    attrs_p = jnp.concatenate([attrs, jnp.zeros((1, c), attrs.dtype)], 0)
    tris_p = jnp.concatenate([tris, jnp.zeros((1, 3), tris.dtype)], 0)
    gy, gx = jnp.meshgrid(jnp.arange(cfg.height, dtype=jnp.float32) + 0.5,
                          jnp.arange(cfg.width, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    p = jnp.stack([gx, gy], -1)[:, :, None, :]      # (H, W, 1, 2)
    tvi = tris_p[jnp.minimum(pix_face, f)]          # (H, W, K, 3)
    fv = v_xy[tvi]                                  # (H, W, K, 3, 2)
    fz = v_z[tvi]                                   # (H, W, K, 3)
    pad_row = attrs.shape[0]        # attrs_p's zero row
    fa = attrs_p[jnp.where(pix_face[..., None] < f, tvi, pad_row)]
    bary = _barycentrics(p, fv[..., 0, :], fv[..., 1, :], fv[..., 2, :])
    d2_pix = _signed_dist2(p, fv[..., 0, :], fv[..., 1, :], fv[..., 2, :], bary)
    # clip barycentrics for interpolation (pytorch3d clip_barycentric)
    bc = jnp.clip(bary, 0.0, 1.0)
    bc = bc / jnp.sum(bc, -1, keepdims=True).clip(1e-8)
    zbuf = jnp.sum(bc * fz, -1)                     # (H, W, K)
    feat = jnp.sum(bc[..., None] * fa, -2)          # (H, W, K, C)

    mask = pix_face < f                              # (H, W, K)
    d2_ndc = d2_pix * (s_ndc * s_ndc)

    # ---- softmax_rgb_blend (pytorch3d blending.py semantics)
    eps = 1e-10
    prob = jax.nn.sigmoid(-d2_ndc / cfg.sigma) * mask
    alpha = 1.0 - jnp.prod(1.0 - prob, axis=-1)
    z_inv = jnp.where(mask, (cfg.zfar - zbuf) / (cfg.zfar - cfg.znear), 0.0)
    z_inv_max = jnp.maximum(jnp.max(z_inv, -1, keepdims=True), eps)
    weights_num = prob * jnp.exp((z_inv - z_inv_max) / cfg.gamma)
    delta = jnp.exp((eps - z_inv_max[..., 0]) / cfg.gamma)
    denom = jnp.sum(weights_num, -1) + delta
    if background is None:
        background = jnp.zeros((c,), attrs.dtype)
    pix = (jnp.sum(weights_num[..., None] * feat, -2)
           + delta[..., None] * background) / denom[..., None]
    img = jnp.concatenate([pix, alpha[..., None]], -1)
    if return_overflow:
        return img, overflow
    return img


# ------------------------------------------------- normals / illumination


def compute_vertex_normals(geometry: jnp.ndarray,
                           tris: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3), (F, 3) -> (B, V, 3) unit vertex normals.

    Reference (render_3dmm.py:97-105) sums *unit* triangle normals over
    each vertex's incident-triangle table; here the same quantity via
    three segment-sums (TPU scatter-add), no per-vertex ragged table.
    """
    v = geometry.shape[1]
    v1 = geometry[:, tris[:, 0]]
    v2 = geometry[:, tris[:, 1]]
    v3 = geometry[:, tris[:, 2]]
    n = jnp.cross(v2 - v1, v3 - v1)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)

    def accum(nb):
        out = jnp.zeros((v, 3), nb.dtype)
        for i in range(3):
            out = out.at[tris[:, i]].add(nb)
        return out

    vn = jax.vmap(accum)(n)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-12)


# SH-9 constants (render_3dmm.py:153-159)
_A0, _A1, _A2 = np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)
_C0 = 1.0 / np.sqrt(4 * np.pi)
_C1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
_C2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
_D0 = 0.5 / np.sqrt(3.0)


def sh9_illumination(texture: jnp.ndarray, normals: jnp.ndarray,
                     gamma: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3) texture x SH-9 lighting -> lit per-vertex color.

    Exact port of Illumination_layer (render_3dmm.py:143-181): gamma
    (B, 27) -> (B, 3, 9) with +0.8 on the DC term; basis H(n) (9,) per
    vertex; color = texture * (H @ gamma^T)."""
    g = gamma.reshape(-1, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    g = g.transpose(0, 2, 1)                        # (B, 9, 3)
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    h = jnp.stack([
        jnp.ones_like(nx) * _A0 * _C0,
        -_A1 * _C1 * ny,
        _A1 * _C1 * nz,
        -_A1 * _C1 * nx,
        _A2 * _C2 * nx * ny,
        -_A2 * _C2 * ny * nz,
        _A2 * _C2 * _D0 * (3 * nz**2 - 1),
        -_A2 * _C2 * nx * nz,
        _A2 * _C2 * 0.5 * (nx**2 - ny**2),
    ], -1)                                          # (B, V, 9)
    lighting = jnp.einsum("bvn,bnc->bvc", h, g)
    return texture * lighting


# --------------------------------------------------------------- Render3DMM


class Render3DMM:
    """Batch renderer matching Render_3DMM.forward (render_3dmm.py:183-191):
    vertex normals -> SH-9 lit vertex colors -> soft rasterization.

    Geometry arrives in the tracker's camera frame (z negative in
    front); projection uses proj_pts' convention (geometry.py:51-57)."""

    def __init__(self, focal: float, img_h: int, img_w: int,
                 tris: np.ndarray, cfg: Optional[RasterConfig] = None):
        self.focal = float(focal)
        self.h, self.w = img_h, img_w
        self.tris = jnp.asarray(tris, jnp.int32)
        self.cfg = cfg or RasterConfig(height=img_h, width=img_w)

    def __call__(self, rott_geo: jnp.ndarray, texture: jnp.ndarray,
                 gamma: jnp.ndarray,
                 return_overflow: bool = False) -> jnp.ndarray:
        """(B, V, 3), (B, V, 3) tex in [0,255], (B, 27) -> (B, H, W, 4).

        ``return_overflow``: also return the max bin-overflow count over
        the batch (must be 0 for a trustworthy render — see
        rasterize_soft)."""
        normals = compute_vertex_normals(rott_geo, self.tris)
        color = sh9_illumination(texture, normals, gamma)
        x, y, z = rott_geo[..., 0], rott_geo[..., 1], rott_geo[..., 2]
        px = -self.focal * x / z + self.w / 2.0
        py = self.focal * y / z + self.h / 2.0
        verts = jnp.stack([px, py, -z], -1)          # depth = -z > 0 in front

        def one(args):
            v, c = args
            return rasterize_soft(v, self.tris, c, self.cfg,
                                  return_overflow=True)

        img, overflow = jax.lax.map(one, (verts, color))
        img = jnp.clip(img, 0.0, 255.0)    # alpha <= 1, unaffected (:190)
        if return_overflow:
            return img, jnp.max(overflow)
        return img
