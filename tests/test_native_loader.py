"""Native C++ threaded JPEG loader: builds, decodes correctly vs imageio,
handles corrupt/mismatched inputs without crashing the process."""

import os

import numpy as np
import pytest

from idealnerf_tpu.data.native_loader import decode_jpeg_batch, get_lib


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    import imageio.v2 as imageio

    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.RandomState(0)
    paths, originals = [], []
    for i in range(6):
        # smooth images compress/decompress almost losslessly
        img = np.zeros((32, 48, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, 48, dtype=np.uint8)[None, :]
        img[:, :, 1] = 40 * i
        img[:, :, 2] = np.linspace(0, 255, 32, dtype=np.uint8)[:, None]
        p = str(d / f"{i}.jpg")
        imageio.imwrite(p, img, quality=95)
        paths.append(p)
        originals.append(np.asarray(imageio.imread(p)))
    return paths, np.stack(originals)


def test_native_lib_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain/libjpeg unavailable")
    assert lib.fl_version() >= 2


def test_decode_batch_matches_imageio(jpgs):
    paths, reference = jpgs
    if get_lib() is None:
        pytest.skip("native loader unavailable")
    out = decode_jpeg_batch(paths, 32, 48, n_threads=4)
    assert out.shape == (6, 32, 48, 3) and out.dtype == np.uint8
    # independent decoders may differ by ±1-2 in IDCT rounding
    diff = np.abs(out.astype(int) - reference.astype(int))
    assert diff.max() <= 2, diff.max()


def test_decode_corrupt_and_mismatch(jpgs, tmp_path):
    paths, _ = jpgs
    if get_lib() is None:
        pytest.skip("native loader unavailable")
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"\xff\xd8 not a real jpeg \xff\xd9")
    missing = str(tmp_path / "missing.jpg")
    mixed = [paths[0], bad, missing, paths[1]]
    out = decode_jpeg_batch(mixed, 32, 48, n_threads=2)
    assert out.shape == (4, 32, 48, 3)
    assert out[0].sum() > 0 and out[3].sum() > 0
    assert out[1].sum() == 0 and out[2].sum() == 0  # zero-filled, no crash
    # size mismatch also zero-fills
    out2 = decode_jpeg_batch([paths[0]], 16, 16, n_threads=1)
    assert out2.sum() == 0


def test_dataset_loader_uses_native_path(tmp_path):
    """load_transforms_dataset round-trips through the native decoder."""
    import json

    import imageio.v2 as imageio

    h = w = 24
    n = 3
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "head_imgs")
    os.makedirs(tmp_path / "ori_imgs")
    os.makedirs(tmp_path / "parsing")
    frames = []
    for i in range(n):
        img = np.full((h, w, 3), 50 * (i + 1), np.uint8)
        imageio.imwrite(str(tmp_path / "head_imgs" / f"{i}.jpg"), img)
        imageio.imwrite(str(tmp_path / "parsing" / f"{i}.png"),
                        np.zeros((h, w, 3), np.uint8))
        np.savetxt(str(tmp_path / "ori_imgs" / f"{i}.lms"),
                   rng.uniform(4, 20, (68, 2)))
        frames.append({
            "img_id": i, "aud_id": i,
            "transform_matrix": np.eye(4).tolist(),
            "face_rect": [2, 2, 10, 10],
            "exp": [0.0] * 4,
        })
    json.dump(
        {"focal_len": 30.0, "cx": w / 2, "cy": h / 2, "frames": frames},
        open(tmp_path / "transforms_exp_train.json", "w"),
    )
    np.save(str(tmp_path / "aud.npy"), rng.randn(n, 16, 29).astype(np.float32))
    imageio.imwrite(str(tmp_path / "bc.jpg"), np.zeros((h, w, 3), np.uint8))

    from idealnerf_tpu.data.dataset import load_transforms_dataset

    ds = load_transforms_dataset(str(tmp_path), mode="train")
    assert ds.images.shape == (n, h, w, 3)
    # frame i is a flat gray ~50*(i+1)
    for i in range(n):
        assert abs(int(ds.images[i].mean()) - 50 * (i + 1)) <= 2


def test_stream_decode_chunks_matches_batch(tmp_path):
    """Streaming double-buffered decode yields the same frames as the
    one-shot batch decode, across uneven chunk boundaries."""
    import imageio.v2 as imageio

    from idealnerf_tpu.data.native_loader import (
        decode_jpeg_batch, stream_decode_chunks,
    )

    rng = np.random.RandomState(0)
    h = w = 32
    paths = []
    for i in range(11):          # 11 frames, chunk 4 -> 3 chunks (4,4,3)
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        imageio.imwrite(p, img, quality=92)
        paths.append(p)

    want = decode_jpeg_batch(paths, h, w)
    got = np.zeros_like(want)
    seen = []
    for idx, frames in stream_decode_chunks(paths, h, w, chunk=4):
        seen.append(idx)
        got[idx * 4 : idx * 4 + frames.shape[0]] = frames  # copy out
    assert seen == [0, 1, 2]
    np.testing.assert_array_equal(got, want)
