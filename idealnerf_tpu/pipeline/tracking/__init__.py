"""3DMM head-pose tracking (reference: data_util/face_tracking/) —
JAX-native optimization over Basel-Face-Model-style linear blendshapes.

The reference runs multi-stage Adam in torch with a pytorch3d
differentiable rasterizer for the photometric stage (SURVEY.md §2.6).
Here every stage is native: the landmark-driven stages (focal grid
search, global identity/pose fit, refinement with temporal Laplacian
smoothing) are jitted JAX programs, and the photometric stages (initial
texture/lighting fit + sliding-window refinement) run through the
tile-binned differentiable soft rasterizer in ``rasterizer.py``
(pytorch3d-equivalent softmax blending + SH-9 illumination). The
reference's alternative rasterizer, render_land.py, imports an
unvendored CUDA extension and is dead code — documented, not ported.
"""

from idealnerf_tpu.pipeline.tracking.geometry import (
    euler2rot, euler2rot_np, rot_trans_pts, proj_pts, forward_transform,
    lap_loss, landmark_loss, compute_tri_normal,
)
from idealnerf_tpu.pipeline.tracking.facemodel import Face3DMM
from idealnerf_tpu.pipeline.tracking.rasterizer import (
    RasterConfig, Render3DMM, compute_vertex_normals, rasterize_soft,
    sh9_illumination,
)
from idealnerf_tpu.pipeline.tracking.tracker import (
    FaceTracker, TrackResult, masked_color_loss,
)
