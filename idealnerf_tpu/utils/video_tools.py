"""Frame/video conversion utilities (reference: utils/video_utils/
image2video.py, video2image.py — paper-figure tooling)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def images_to_video(image_paths: List[str], out_path: str, fps: int = 25) -> int:
    """Mux ordered frames into a video (image2video.py:1-35)."""
    from idealnerf_tpu.eval.video import VideoWriter

    import imageio.v2 as imageio

    with VideoWriter(out_path, fps=fps, frame_jpg_every=0) as w:
        for p in image_paths:
            w.add(np.asarray(imageio.imread(p)))
    return len(image_paths)


def video_to_images(video_path: str, out_dir: str,
                    max_frames: Optional[int] = None) -> int:
    """Extract frames as {i}.jpg (video2image.py; process_data step 1).
    Uses cv2.VideoCapture (the reference's reader) with an imageio-ffmpeg
    fallback."""
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    count = 0
    try:
        import cv2

        cap = cv2.VideoCapture(video_path)
        while cap.isOpened():
            if max_frames is not None and count >= max_frames:
                break
            ok, frame = cap.read()
            if not ok:
                break
            imageio.imwrite(os.path.join(out_dir, f"{count}.jpg"),
                            frame[..., ::-1])  # BGR -> RGB
            count += 1
        cap.release()
        return count
    except ImportError:
        pass
    reader = imageio.get_reader(video_path)
    for i, frame in enumerate(reader):
        if max_frames is not None and i >= max_frames:
            break
        imageio.imwrite(os.path.join(out_dir, f"{i}.jpg"), frame)
        count += 1
    reader.close()
    return count
