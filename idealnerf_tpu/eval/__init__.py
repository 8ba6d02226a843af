from idealnerf_tpu.eval.renderer import (
    render_frame, render_frame_outputs,
    make_frame_renderer, make_composite_frame_renderer,
)
from idealnerf_tpu.eval.metrics import psnr, ssim, lpips
from idealnerf_tpu.eval.video import VideoWriter
from idealnerf_tpu.eval.reenact import reenact, load_driving_exprs, smoothed_audio_features
from idealnerf_tpu.eval.stream import TemporalStream
