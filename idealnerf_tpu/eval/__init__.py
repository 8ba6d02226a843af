from idealnerf_tpu.eval.renderer import render_frame, make_frame_renderer
