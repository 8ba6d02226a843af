"""Differentiable soft rasterizer + photometric tracker tests
(reference semantics: data_util/face_tracking/render_3dmm.py:32-191,
face_tracker.py:179-343, facemodel.py:48-90)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idealnerf_tpu.pipeline.tracking import (
    Face3DMM, FaceTracker, RasterConfig, Render3DMM, compute_vertex_normals,
    euler2rot, forward_transform, rasterize_soft, rot_trans_pts,
    sh9_illumination,
)


def _sphere_mesh(n_lat=12, n_lon=16, radius=1.0):
    phi = np.repeat(np.linspace(0.15, np.pi - 0.15, n_lat), n_lon)
    th = np.tile(np.linspace(0, 2 * np.pi, n_lon, endpoint=False), n_lat)
    verts = radius * np.stack([
        np.sin(phi) * np.cos(th), np.cos(phi), np.sin(phi) * np.sin(th)], -1)
    tris = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            tris += [[a, b, c], [b, d, c]]
    return verts.astype(np.float32), np.asarray(tris, np.int32)


def _project(verts, focal, h, w):
    """Tracker projection convention (geometry.proj_pts) + depth=-z."""
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    px = -focal * x / z + w / 2.0
    py = focal * y / z + h / 2.0
    return jnp.stack([px, py, -z], -1)


# ---------------------------------------------------------------- raster


def test_sphere_coverage_and_occlusion():
    """Center of a z=-7 sphere renders opaque with the NEAR hemisphere's
    color; corners stay background."""
    verts, tris = _sphere_mesh()
    verts = verts + np.array([0.0, 0.0, -7.0])
    # near hemisphere (z < -7 in world = closer to camera at origin
    # looking down -z? proj uses z<0 in front; depth=-z, so vertices with
    # larger -z... camera at origin, sphere at z=-7: near side has z>-7.
    colors = np.where(verts[:, 2:3] > -7.0,
                      np.array([[200.0, 30.0, 30.0]]),
                      np.array([[30.0, 30.0, 200.0]])).astype(np.float32)
    colors = np.broadcast_to(colors, (verts.shape[0], 3)).copy()
    cfg = RasterConfig(height=64, width=64)
    img = rasterize_soft(_project(jnp.asarray(verts), 100.0, 64, 64),
                         jnp.asarray(tris), jnp.asarray(colors), cfg)
    img = np.asarray(img)
    assert img.shape == (64, 64, 4)
    center = img[32, 32]
    assert center[3] > 0.95, f"center alpha {center[3]}"
    assert center[0] > 120 and center[2] < 100, (
        f"near (red) hemisphere should win the z-test: {center}")
    assert img[1, 1, 3] < 0.05 and np.all(img[1, 1, :3] < 5.0)


def test_raster_depth_ordering_two_triangles():
    """Two stacked triangles: the nearer one's color dominates."""
    # triangle A at depth 5 (red), B at depth 6 (blue), same screen spot
    verts = jnp.asarray([
        [10.0, 10.0, 5.0], [50.0, 10.0, 5.0], [30.0, 50.0, 5.0],
        [10.0, 10.0, 6.0], [50.0, 10.0, 6.0], [30.0, 50.0, 6.0],
    ])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.asarray([[255, 0, 0]] * 3 + [[0, 0, 255]] * 3, jnp.float32)
    cfg = RasterConfig(height=64, width=64)
    img = np.asarray(rasterize_soft(verts, tris, colors, cfg))
    c = img[25, 30]
    assert c[0] > 200 and c[2] < 50, f"near triangle must occlude: {c}"


def test_raster_gradient_matches_finite_difference():
    """Geometry gradients flow the nvdiffrast way: interior color moves
    with the barycentrics of a TEXTURED mesh (a uniform-color interior
    correctly has zero rgb gradient — pytorch3d behaves identically:
    the softmax blend's background delta is e^(-z_inv/gamma) ~ 0, and
    silhouette softness lives in the alpha channel).

    Checked in the smooth regime (faces_per_pixel covers every candidate,
    interior sigmoid saturated): a textured two-triangle quad."""
    verts = jnp.asarray([
        [-1.0, -1.0, -7.0], [1.0, -1.0, -7.0],
        [1.0, 1.0, -7.0], [-1.0, 1.0, -7.0]])
    tris = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    rng = np.random.RandomState(0)
    colors = jnp.asarray(rng.uniform(0, 255, (4, 3)), jnp.float32)
    cfg = RasterConfig(height=48, width=48, sigma=1e-3, gamma=5e-3,
                       blur_radius=4e-3)

    # interior window (Gaussian at the quad center, sigma 3px): silhouette
    # pixels contribute ~0. RGB at the silhouette is winner-take-all by
    # construction (gamma-softmax suppresses background entirely inside
    # the blur fringe — pytorch3d renders the identical hard edge), so the
    # differentiable RGB signal is the interior barycentric texture flow.
    yy, xx = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
    win = jnp.asarray(np.exp(-((yy - 24.0) ** 2 + (xx - 24.0) ** 2) / 18.0))

    def f(dx, channel):
        shifted = verts + jnp.array([dx, 0.0, 0.0])
        img = rasterize_soft(_project(shifted, 70.0, 48, 48), tris,
                             colors, cfg)
        ramp = jnp.linspace(0.0, 1.0, 48)[None, :]
        if channel == "rgb":
            return jnp.mean(img[..., :3] * win[..., None])
        return jnp.mean(img[..., 3] * ramp)

    for channel in ("rgb", "alpha"):
        g = float(jax.grad(f)(0.0, channel))
        eps = 2e-2
        fd = float((f(eps, channel) - f(-eps, channel)) / (2 * eps))
        assert np.isfinite(g) and abs(fd) > 1e-7, f"{channel}: fd {fd}"
        assert abs(g - fd) < 0.2 * abs(fd) + 1e-4, (
            f"{channel}: grad {g} vs fd {fd}")


def test_vertex_normals_sphere_point_outward():
    verts, tris = _sphere_mesh()
    vn = np.asarray(compute_vertex_normals(jnp.asarray(verts)[None],
                                           jnp.asarray(tris))[0])
    outward = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    # poles are open in this mesh; interior vertices align well
    cos = np.sum(vn * outward, -1)
    assert np.mean(cos) > 0.9 or np.mean(cos) < -0.9  # orientation-consistent


def test_sh9_dc_term():
    """gamma = 0 -> uniform lighting a0*c0*0.8 (render_3dmm.py:149,161)."""
    tex = jnp.full((1, 5, 3), 100.0)
    normals = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 5, 1))
    out = np.asarray(sh9_illumination(tex, normals, jnp.zeros((1, 27))))
    expected = 100.0 * (np.pi / np.sqrt(4 * np.pi)) * 0.8
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_render3dmm_batch_shapes():
    verts, tris = _sphere_mesh(8, 10)
    b = 2
    geo = jnp.asarray(verts)[None] + jnp.asarray([0.0, 0.0, -7.0])
    geo = jnp.tile(geo, (b, 1, 1))
    tex = jnp.full((b, verts.shape[0], 3), 180.0)
    light = jnp.zeros((b, 27))
    r = Render3DMM(100.0, 48, 48, tris,
                   RasterConfig(height=48, width=48))
    img = np.asarray(r(geo, tex, light))
    assert img.shape == (b, 48, 48, 4)
    assert img[..., 3].max() <= 1.0 and img[..., :3].max() <= 255.0
    # a pixel can land near a mesh edge where sigmoid alpha dips (same in
    # pytorch3d at sigma=1e-4) — check the central neighborhood's peak
    assert img[0, 20:28, 20:28, 3].max() > 0.9
    assert img[0, 24, 24, 3] > 0.3


# ------------------------------------------------------ contour landmarks


def test_contour_landmarks_track_silhouette():
    """Rotating the head moves the selected jaw vertices: contour-aware
    landmarks differ from fixed-keypoint landmarks and the selected x is
    extremal among the candidate ring (facemodel.py:48-90)."""
    model = Face3DMM.synthetic(with_contours=True, seed=3)
    n_id, n_exp = model.dims
    idc = jnp.zeros((1, n_id))
    expc = jnp.zeros((2, n_exp))
    euler = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.6, 0.0]])
    trans = jnp.tile(jnp.asarray([0.0, 0.0, -7.0]), (2, 1))
    lands = model.get_3dlandmarks(idc, expc, euler, trans, 300.0,
                                  (32.0, 32.0))
    fixed = model.landmarks(idc, expc)
    assert lands.shape == (2, 68, 3)
    # jaw rows replaced, other rows untouched
    np.testing.assert_allclose(np.asarray(lands[:, 20:]),
                               np.asarray(jnp.broadcast_to(fixed[:, 20:], lands[:, 20:].shape)),
                               atol=1e-6)
    # selection responds to pose: rotated frame picks different vertices
    assert not np.allclose(np.asarray(lands[0, :8]), np.asarray(lands[1, :8]))
    # selected left-jaw x-projection is the row minimum
    flat = model.left_contour.reshape(-1)
    geo = model.geometry_sub(idc, expc, flat)
    proj_x = forward_transform(geo, euler, trans, 300.0, (32.0, 32.0))[..., 0]
    proj_sel = forward_transform(lands[:, :8], euler, trans, 300.0,
                                 (32.0, 32.0))[..., 0]
    px = np.asarray(proj_x).reshape(2, 8, -1)
    np.testing.assert_allclose(np.asarray(proj_sel), px.min(-1), atol=1e-4)


def test_sig_scaling_applied():
    """Coefficients are scaled by sig before the basis matmul
    (facemodel.py:49-50): doubling sig doubles the deformation."""
    model = Face3DMM.synthetic(seed=1)
    n_id, n_exp = model.dims
    idc = jnp.ones((1, n_id)) * 0.1
    expc = jnp.zeros((1, n_exp))
    g1 = model.geometry(idc, expc)
    model2 = Face3DMM(
        np.asarray(model.mu), np.asarray(model.base_id),
        np.asarray(model.base_exp), model.keypoints,
        sig_id=2.0 * np.ones(n_id), sig_exp=np.ones(n_exp))
    g2 = model2.geometry(idc, expc)
    mu = np.asarray(model.mu).reshape(1, -1, 3)
    np.testing.assert_allclose(np.asarray(g2 - mu),
                               2 * np.asarray(g1 - mu), rtol=1e-4, atol=1e-6)


# --------------------------------------------------- photometric tracking


@pytest.mark.slow
def test_photometric_refinement_improves_recovery():
    """End-to-end: GT = synthetic 3DMM rendered with texture+lighting;
    the photometric stages reduce render error vs the landmark-only fit
    (face_tracker.py:179-343 done-criterion from the round-1 review)."""
    rng = np.random.RandomState(0)
    model = Face3DMM.synthetic(with_contours=True, seed=5)
    n_id, n_exp = model.dims
    n = 4
    h = w = 64
    focal = 100.0

    def smooth(a, b):
        # temporally smooth trajectory (video-like — the refinement's
        # 1e5 Laplacian term assumes smoothness, face_tracker.py:316)
        t = np.linspace(0.0, 1.0, n)[:, None]
        return jnp.asarray((1 - t) * a + t * b, jnp.float32)

    gt = {
        "id": jnp.asarray(rng.randn(n_id) * 0.3, jnp.float32),
        "exp": smooth(rng.randn(n_exp) * 0.3, rng.randn(n_exp) * 0.3),
        "euler": smooth(rng.uniform(-0.12, 0.12, 3), rng.uniform(-0.12, 0.12, 3)),
        "trans": np.array([0.0, 0.0, -7.0])
        + smooth(rng.uniform(-0.08, 0.08, 3), rng.uniform(-0.08, 0.08, 3)),
    }
    tex_gt = jnp.asarray(rng.randn(model.n_tex) * 0.5, jnp.float32)
    light_gt = jnp.zeros((n, 27)).at[:, ::9].add(0.3)

    cfg = RasterConfig(height=h, width=w)
    renderer = Render3DMM(focal, h, w, model.tris, cfg)
    geo = model.geometry(gt["id"][None], gt["exp"])
    rott = rot_trans_pts(geo, euler2rot(gt["euler"]), gt["trans"])
    texture = jnp.broadcast_to(model.texture(tex_gt[None]), geo.shape)
    gt_imgs = np.asarray(renderer(rott, texture, light_gt)[..., :3])

    lan3d = model.get_3dlandmarks(gt["id"][None], gt["exp"], gt["euler"],
                                  gt["trans"], focal, (w / 2, h / 2))
    lms = np.asarray(forward_transform(lan3d, gt["euler"], gt["trans"],
                                       focal, (w / 2, h / 2))[..., :2])
    lms_noisy = lms + rng.randn(*lms.shape).astype(np.float32) * 2.0

    def render_err(res):
        # geometry-only comparison: both fits rendered with the GT
        # texture/lighting, so the metric isolates pose/exp recovery
        geo = model.geometry(jnp.asarray(res.id_coef)[None],
                             jnp.asarray(res.exp))
        rott = rot_trans_pts(geo, euler2rot(jnp.asarray(res.euler)),
                             jnp.asarray(res.trans))
        texture = jnp.broadcast_to(model.texture(tex_gt[None]), geo.shape)
        img = renderer(rott, texture, light_gt)[..., :3]
        return float(jnp.mean((img - gt_imgs) ** 2))

    tracker = FaceTracker(model, h, w, focal_candidates=[focal])
    base = tracker.fit(lms_noisy, steps_focal=1, steps_global=300,
                       steps_refine=100)
    refined = tracker.fit(lms_noisy, images=gt_imgs, steps_focal=1,
                          steps_global=300, steps_refine=100,
                          photo_batch=4, photo_steps=40,
                          photo_refine_steps=25)
    e_base, e_ref = render_err(base), render_err(refined)
    assert refined.tex is not None and refined.light is not None
    assert refined.light.shape == (n, 27)
    assert e_ref < e_base * 0.95, (
        f"photometric should cut render error: {e_base} -> {e_ref}")


def test_bfm_config_capacity_scales_with_resolution():
    """RasterConfig.bfm below 450² must scale bin capacity with the
    (450/side)² per-tile density growth — the fixed 450² capacity
    silently dropped ~100k (tile, face) pairs at 128²."""
    assert RasterConfig.bfm(450, 450).max_faces_per_tile == 256
    c128 = RasterConfig.bfm(128, 128).max_faces_per_tile
    assert c128 >= 256 * (450 / 128) ** 2 * 0.99
    assert c128 % 8 == 0


def test_tracker_renderer_auto_bumps_on_overflow():
    """_renderer_checked doubles bin capacity until a probe frame
    renders with zero overflow (overflow = silently missing geometry in
    the photometric fit)."""
    from idealnerf_tpu.pipeline.tracking.tracker import FaceTracker

    model = Face3DMM.synthetic(n_id=4, n_exp=3, n_lat=24, n_lon=32,
                               shell=True, with_contours=True, seed=1)
    h = w = 48
    # deliberately undersized bins for this mesh density
    tiny = RasterConfig(height=h, width=w, tile=8, max_faces_per_tile=8,
                        span=3)
    tracker = FaceTracker(model, h, w, focal_candidates=[120.0],
                          raster_cfg=tiny)
    n_id, n_exp = model.dims
    params = {
        "id": jnp.zeros((n_id,)),
        "exp": jnp.zeros((2, n_exp)),
        "euler": jnp.zeros((2, 3)),
        "trans": jnp.asarray([[0.0, 0.0, -7.0]] * 2, jnp.float32),
    }
    renderer = tracker._renderer_checked(
        120.0, params["id"], params["exp"], params["euler"],
        params["trans"], jnp.zeros((model.n_tex,)), jnp.zeros((1, 27)))
    assert renderer.cfg.max_faces_per_tile > tiny.max_faces_per_tile
    _, ov = tracker._render_window(
        renderer, params["id"], params["exp"][:1], params["euler"][:1],
        params["trans"][:1], jnp.zeros((model.n_tex,)),
        jnp.zeros((1, 27)), return_overflow=True)
    assert int(ov) == 0


@pytest.mark.slow
def test_bfm_scale_raster_and_tracking():
    """Reference-scale validation (face_tracker.py:37-53 workload): a
    34.5k-vertex / 68k-triangle open face shell with id 100 / exp 79
    smooth bases at 450². Asserts (a) RasterConfig.bfm bins with ZERO
    overflow through the surfaced API, (b) the landmark stages recover
    the pose, and (c) the photometric sliding-window refinement (the
    tracker's real _photometric_refine) cuts render error against a
    fixed texture — the geometry-polish role it plays in the reference
    (face_tracker.py:248-343).

    The full fit() improvement-over-noise semantics are asserted at
    small scale in test_photometric_refinement_improves_recovery; at
    450² each photometric step renders the whole batch, so this test
    drives the window stage directly from a perturbed landmark-fit
    state to keep CPU time bounded.
    """
    from idealnerf_tpu.pipeline.tracking.tracker import FaceTracker

    rng = np.random.RandomState(0)
    model = Face3DMM.synthetic(n_id=100, n_exp=79, n_lat=150, n_lon=230,
                               shell=True, with_contours=True, seed=5)
    n_id, n_exp = model.dims
    assert (n_id, n_exp) == (100, 79)
    assert model.mu.shape[0] // 3 == 34500
    assert model.tris.shape[0] > 65000
    n = 4
    h = w = 450
    focal = 1200.0

    def smooth(a, b):
        t = np.linspace(0.0, 1.0, n)[:, None]
        return jnp.asarray((1 - t) * a + t * b, jnp.float32)

    gt = {
        "id": jnp.asarray(rng.randn(n_id) * 0.3, jnp.float32),
        "exp": smooth(rng.randn(n_exp) * 0.3, rng.randn(n_exp) * 0.3),
        "euler": smooth(rng.uniform(-0.1, 0.1, 3), rng.uniform(-0.1, 0.1, 3)),
        "trans": np.array([0.0, 0.0, -7.0])
        + smooth(rng.uniform(-0.05, 0.05, 3), rng.uniform(-0.05, 0.05, 3)),
    }
    tex_gt = jnp.asarray(rng.randn(model.n_tex) * 0.5, jnp.float32)
    light_gt = jnp.zeros((n, 27)).at[:, ::9].add(0.3)

    cfg = RasterConfig.bfm(h, w)
    renderer = Render3DMM(focal, h, w, model.tris, cfg)
    geo = model.geometry(gt["id"][None], gt["exp"])
    rott = rot_trans_pts(geo, euler2rot(gt["euler"]), gt["trans"])
    texture = jnp.broadcast_to(model.texture(tex_gt[None]), geo.shape)
    gt_out, overflow = renderer(rott, texture, light_gt,
                                return_overflow=True)
    # the load-bearing assertion: NO silently dropped faces at BFM scale
    assert int(overflow) == 0
    gt_imgs = np.asarray(gt_out[..., :3])
    # the mesh actually covers a face-sized frame region
    assert 0.2 < float(gt_out[0, ..., 3].mean()) < 0.6

    lan3d = model.get_3dlandmarks(gt["id"][None], gt["exp"], gt["euler"],
                                  gt["trans"], focal, (w / 2, h / 2))
    lms = np.asarray(forward_transform(lan3d, gt["euler"], gt["trans"],
                                       focal, (w / 2, h / 2))[..., :2])
    lms_noisy = lms + rng.randn(*lms.shape).astype(np.float32) * 4.0

    tracker = FaceTracker(model, h, w, focal_candidates=[focal],
                          raster_cfg=cfg)
    base = tracker.fit(lms_noisy, steps_focal=1, steps_global=150,
                       steps_refine=40)
    # (b) landmark stages recover the pose at this scale: projected
    # landmarks land within the injected noise of the TRUE ones
    lan3d_fit = model.get_3dlandmarks(
        jnp.asarray(base.id_coef)[None], jnp.asarray(base.exp),
        jnp.asarray(base.euler), jnp.asarray(base.trans),
        focal, (w / 2, h / 2))
    proj_fit = np.asarray(forward_transform(
        jnp.asarray(lan3d_fit), jnp.asarray(base.euler),
        jnp.asarray(base.trans), focal, (w / 2, h / 2))[..., :2])
    err_px = np.linalg.norm(proj_fit - lms, axis=-1).mean()
    assert err_px < 4.0, err_px

    # (c) the sliding-window photometric stage polishes geometry: start
    # from a perturbed state (a coarse landmark fit) with the texture
    # held fixed (its role in fit(): tex comes stop_gradiented from the
    # initial photometric stage)
    def render_err(exp, euler, trans):
        g = model.geometry(gt["id"][None], exp)
        rt = rot_trans_pts(g, euler2rot(euler), trans)
        img = renderer(rt, texture, light_gt)[..., :3]
        return float(jnp.mean((img - jnp.asarray(gt_imgs)) ** 2))

    params = {
        "id": gt["id"],
        "exp": gt["exp"] + 0.08,
        "euler": gt["euler"] + jnp.asarray([[0.006, -0.004, 0.003]] * n),
        "trans": gt["trans"] + jnp.asarray([[0.015, -0.01, 0.03]] * n),
    }
    e0 = render_err(params["exp"], params["euler"], params["trans"])
    refined, _ = tracker._photometric_refine(
        params, tex_gt, light_gt, gt_imgs, lms_noisy, focal,
        batch=n, steps=40)
    e1 = render_err(refined["exp"], refined["euler"], refined["trans"])
    assert e1 < e0 * 0.93, (
        f"window refine should cut render error at BFM scale: {e0} -> {e1}")
