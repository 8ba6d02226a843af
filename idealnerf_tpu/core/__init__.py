"""Volume-rendering core: positional encoding, ray generation, stratified &
hierarchical sampling, alpha compositing, and the single shared renderer.

The reference copy-pastes this core into 8+ trainer/eval scripts
(SURVEY.md §2.3); here it exists exactly once.
"""

from idealnerf_tpu.core.embedding import positional_encoding, pe_dim
from idealnerf_tpu.core.rays import get_rays, ndc_rays, pose_to_euler_trans
from idealnerf_tpu.core.sampling import stratified_sample, sample_pdf
from idealnerf_tpu.core.composite import raw2outputs, RenderOutputs
from idealnerf_tpu.core.render import render_rays, RenderConfig
