"""Dataset container + transforms_exp_*.json loader.

Layout parity with the reference's per-trainer GetData classes
(audio_exp_nerf.py:45-111): ``transforms_exp_{train,val}.json`` holds
focal_len/cx/cy and per-frame img_id/aud_id/transform_matrix/face_rect/exp;
``aud.npy`` holds (M, 16, 29) DeepSpeech windows; ``bc.jpg`` is the static
background plate; images live in ``gt_dirs`` (head_imgs/ori_imgs/com_imgs);
mouth boxes come from the 48+ landmarks in ``ori_imgs/*.lms``; torso masks
from the red channel of ``parsing/*.png``.

TPU-native difference: the whole dataset is a pytree of arrays designed to
live *in device HBM* (a 5k-frame 450² uint8 set is ~3 GB — fits a v5e
chip), so the train step needs zero host transfer: ``to_device()`` once,
then every step gathers its frame by index inside jit.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class FrameDataset:
    """Host-side arrays; ``to_device()`` yields the jit-visible pytree."""

    images: np.ndarray       # (N, H, W, 3) uint8 (BGR-as-loaded or RGB; see loader)
    poses: np.ndarray        # (N, 3, 4) float32 camera-to-world
    auds: np.ndarray         # (M, 16, 29) float32 DeepSpeech windows
    aud_ids: np.ndarray      # (N,) int32 index into auds
    exprs: np.ndarray        # (N, dim_expr) float32
    face_rects: np.ndarray   # (N, 4) int32 [x, y, w, h]
    mouth_boxes: np.ndarray  # (N, 4) float32 [min_x, max_x, min_y, max_y]
    landmarks: np.ndarray    # (N, 68, 2) float32 (x, y) as stored in .lms
    torso_masks: np.ndarray  # (N, H, W) uint8 {0,1}
    bc_img: np.ndarray       # (H, W, 3) uint8 background plate
    focal: float
    cx: float
    cy: float
    near: float = 0.3
    far: float = 0.9

    @property
    def size(self) -> int:
        return self.images.shape[0]

    @property
    def hw(self):
        return self.images.shape[1], self.images.shape[2]

    def to_device(self):
        """Arrays the jitted train step indexes by frame id (HBM-resident)."""
        import jax.numpy as jnp

        return {
            "images": jnp.asarray(self.images),
            "poses": jnp.asarray(self.poses),
            "auds": jnp.asarray(self.auds),
            "aud_ids": jnp.asarray(self.aud_ids),
            "exprs": jnp.asarray(self.exprs),
            "face_rects": jnp.asarray(self.face_rects),
            "mouth_boxes": jnp.asarray(self.mouth_boxes),
            "landmarks": jnp.asarray(self.landmarks),
            "torso_masks": jnp.asarray(self.torso_masks),
            "bc_img": jnp.asarray(self.bc_img),
        }


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def load_transforms_dataset(
    datadir: str,
    mode: str = "train",
    aud_file: str = "aud.npy",
    gt_dirs: str = "head_imgs",
    skip: int = 1,
    near: Optional[float] = None,
    far: Optional[float] = None,
    max_frames: Optional[int] = None,
) -> FrameDataset:
    """Load a reference-format subject directory (see module docstring).

    ``skip`` mirrors the testskip subsampling of val sets
    (audio_exp_nerf.py:68-70).
    """
    with open(os.path.join(datadir, f"transforms_exp_{mode}.json")) as fh:
        meta = json.load(fh)

    if near is None or far is None:
        # the transforms json carries no near/far (reference format —
        # they live in the config/README, e.g. May 0.577/1.177); read
        # the subject's own config file before falling back, so a
        # loader call without explicit bounds doesn't silently sample
        # the wrong interval
        cfg_path = os.path.join(datadir, "HeadNeRF_config.txt")
        if os.path.exists(cfg_path):
            for line in open(cfg_path):
                k, _, v = line.partition("=")
                k = k.strip()
                if k == "near" and near is None:
                    near = float(v)
                elif k == "far" and far is None:
                    far = float(v)

    focal = float(meta["focal_len"])
    cx, cy = float(meta["cx"]), float(meta["cy"])
    auds = np.load(os.path.join(datadir, aud_file)).astype(np.float32)
    bc_img = _load_image(os.path.join(datadir, "bc.jpg"))

    frames = meta["frames"][::skip]
    if max_frames is not None:
        frames = frames[:max_frames]

    # frame images: native threaded JPEG decode into one contiguous
    # buffer (data/native_loader.py; imageio fallback)
    from idealnerf_tpu.data.native_loader import decode_jpeg_batch

    img_paths = [
        os.path.join(datadir, gt_dirs, f"{f['img_id']}.jpg") for f in frames
    ]
    probe = _load_image(img_paths[0])
    images_arr = decode_jpeg_batch(img_paths, probe.shape[0], probe.shape[1])

    poses, aud_ids, exprs, rects, mouth_boxes, torso_masks = (
        [], [], [], [], [], []
    )
    landmarks = []
    for frame in frames:
        img_id = frame["img_id"]
        poses.append(np.array(frame["transform_matrix"], np.float32)[:3, :4])
        aud_ids.append(min(int(frame["aud_id"]), auds.shape[0] - 1))
        exprs.append(np.array(frame["exp"], np.float32))
        rects.append(np.array(frame["face_rect"], np.int32))

        lms = np.loadtxt(os.path.join(datadir, "ori_imgs", f"{img_id}.lms"))
        landmarks.append(lms[:68].astype(np.float32))
        mouth = lms[48:]
        mouth_boxes.append(
            np.array(
                [mouth[:, 0].min() - 20, mouth[:, 0].max() + 20,
                 mouth[:, 1].min() - 20, mouth[:, 1].max() + 20],
                np.float32,
            )
        )
        parse = _load_image(os.path.join(datadir, "parsing", f"{img_id}.png"))
        torso = (
            (parse[:, :, 0] == 255) & (parse[:, :, 1] == 0) & (parse[:, :, 2] == 0)
        )
        torso_masks.append(torso.astype(np.uint8))

    return FrameDataset(
        images=images_arr,
        poses=np.stack(poses),
        auds=auds,
        aud_ids=np.array(aud_ids, np.int32),
        exprs=np.stack(exprs),
        face_rects=np.stack(rects),
        mouth_boxes=np.stack(mouth_boxes),
        landmarks=np.stack(landmarks),
        torso_masks=np.stack(torso_masks),
        bc_img=bc_img,
        focal=focal,
        cx=cx,
        cy=cy,
        near=0.3 if near is None else near,
        far=0.9 if far is None else far,
    )
