"""3DMM head-pose tracking (reference: data_util/face_tracking/) —
JAX-native optimization over Basel-Face-Model-style linear blendshapes.

The reference runs multi-stage Adam in torch with a pytorch3d
differentiable rasterizer for the photometric stage (SURVEY.md §2.6).
Here the landmark-driven stages (focal grid search, global identity/pose
fit, sliding-window refinement with temporal Laplacian smoothing) are
jitted JAX programs; the photometric refinement stage is exposed as a
hook awaiting a differentiable rasterizer (planned Pallas soft-raster —
the reference's own alternative rasterizer, render_land.py, imports an
unvendored CUDA extension and is dead code).
"""

from idealnerf_tpu.pipeline.tracking.geometry import (
    euler2rot, euler2rot_np, rot_trans_pts, proj_pts, forward_transform,
    lap_loss, landmark_loss, compute_tri_normal,
)
from idealnerf_tpu.pipeline.tracking.facemodel import Face3DMM
from idealnerf_tpu.pipeline.tracking.tracker import FaceTracker, TrackResult
