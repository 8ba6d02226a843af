"""Video writing: 25 fps MJPG .avi + periodic frame JPGs, matching the
reference eval outputs (eval_aud_exp_nerf.py:479-496, test_torso.py:
513-534)."""

from __future__ import annotations

import os
import numpy as np

from idealnerf_tpu.utils.metrics import to8b


class VideoWriter:
    """cv2 MJPG writer with imageio fallback; writes every-Nth frame as
    .jpg alongside (the reference writes every 10th)."""

    def __init__(self, path: str, fps: int = 25, frame_jpg_every: int = 10):
        self.path = path
        self.fps = fps
        self.frame_jpg_every = frame_jpg_every
        self._writer = None
        self._count = 0
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _open(self, h: int, w: int):
        try:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            self._writer = ("cv2", cv2.VideoWriter(self.path, fourcc, self.fps, (w, h)))
        except Exception:
            import imageio.v2 as imageio

            self._writer = ("imageio", imageio.get_writer(self.path, fps=self.fps))

    def add(self, frame) -> None:
        """frame: (H, W, 3) float [0,1] or uint8, RGB."""
        img = to8b(frame) if np.asarray(frame).dtype != np.uint8 else np.asarray(frame)
        if self._writer is None:
            self._open(img.shape[0], img.shape[1])
        kind, w = self._writer
        if kind == "cv2":
            w.write(img[..., ::-1])  # cv2 wants BGR
        else:
            w.append_data(img)
        if self.frame_jpg_every and self._count % self.frame_jpg_every == 0:
            import imageio.v2 as imageio

            stem, _ = os.path.splitext(self.path)
            imageio.imwrite(f"{stem}_{self._count:05d}.jpg", img)
        self._count += 1

    def close(self) -> None:
        if self._writer is not None:
            kind, w = self._writer
            if kind == "cv2":
                w.release()
            else:
                w.close()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
