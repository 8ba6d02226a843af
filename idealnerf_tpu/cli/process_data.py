"""Offline dataset production driver (reference: data_util/
process_data.py's 8 steps).

Given a subject directory containing ``ori_imgs/*.jpg`` + ``*.lms``
landmarks, ``parsing/*.png`` parse maps, and an audio ``.wav``, this runs
the native steps: audio feature extraction (step 0), background plate
(step 4), head/com image decoupling (step 5), 3DMM head-pose tracking
(step 6, landmark stages), and the transforms/config writer (step 7).
Frame extraction (step 1, ffmpeg), FAN landmarks (step 2) and BiSeNet
parsing (step 3) require external weights/binaries — when their outputs
are absent this driver says exactly what is missing instead of failing
midway.
"""

from __future__ import annotations

import argparse
import os
import wave

import numpy as np

from idealnerf_tpu.pipeline.audio import extract_deepspeech_features
from idealnerf_tpu.pipeline.process import (
    decouple_images, extract_background_plate, head_mask_from_parse,
    write_transforms,
)
from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.process")


def _read_wav(path):
    with wave.open(path, "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        data = np.frombuffer(wf.readframes(n), dtype=np.int16)
        if wf.getnchannels() > 1:
            data = data.reshape(-1, wf.getnchannels()).mean(1)
    return data.astype(np.float64), sr


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--id_dir", required=True, help="subject directory")
    parser.add_argument("--wav", default=None, help="audio wav (default aud.wav)")
    parser.add_argument("--subject", default=None)
    parser.add_argument("--step", default="all",
                        help="all | audio | parse | bg | decouple | track | "
                             "transforms")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--bfm", default=None, help="3DMM_info.npy path")
    parser.add_argument("--parse_weights", default=None,
                        help="BiSeNet weights (torch 79999_iter.pth or a "
                             "converted .npz) — enables the parse step")
    parser.add_argument("--fan_weights", default=None,
                        help="FAN 2DFAN-4 weights (torch .pth state dict or "
                             "a converted .npz) — enables the landmarks step")
    parser.add_argument("--deepspeech_pb", default=None,
                        help="DeepSpeech 0.1.0 frozen graph (output_graph.pb)"
                             " — real acoustic-model logits for the audio "
                             "step (parsed natively, no TensorFlow needed)")
    args = parser.parse_args(argv)

    import imageio.v2 as imageio

    d = args.id_dir
    ori = os.path.join(d, "ori_imgs")
    parsing = os.path.join(d, "parsing")
    ids = sorted(
        int(f[:-4]) for f in os.listdir(ori) if f.endswith(".jpg")
    ) if os.path.isdir(ori) else []
    if args.max_frames:
        ids = ids[: args.max_frames]
    if not ids:
        logger.error("no frames in %s — run frame extraction (ffmpeg) first", ori)
        return
    steps = (
        ["audio", "landmarks", "parse", "bg", "decouple", "track",
         "transforms"]
        if args.step == "all" else [args.step]
    )
    h, w = imageio.imread(os.path.join(ori, f"{ids[0]}.jpg")).shape[:2]

    if "audio" in steps:
        wav = args.wav or os.path.join(d, "aud.wav")
        if os.path.exists(wav):
            audio, sr = _read_wav(wav)
            logits_fn = None
            if args.deepspeech_pb:
                from idealnerf_tpu.pipeline.deepspeech import (
                    make_logits_fn_from_graph,
                )

                logits_fn = make_logits_fn_from_graph(args.deepspeech_pb)
            aud = extract_deepspeech_features(audio, sr, num_frames=len(ids),
                                              logits_fn=logits_fn)
            np.save(os.path.join(d, "aud.npy"), aud)
            logger.info("audio features %s -> aud.npy", aud.shape)
        else:
            logger.warning("no wav at %s — skipping audio step", wav)

    if "landmarks" in steps and args.fan_weights:
        # step 2 (reference process_data.py:104-123): FAN landmark
        # detection -> .lms files. The face box comes from the parse map
        # when available (we control the pipeline order), else the full
        # frame — replacing the reference's s3fd detector (see fan.py).
        from idealnerf_tpu.pipeline.fan import detect_landmarks
        from idealnerf_tpu.pipeline.process import head_mask_from_parse

        if args.fan_weights.endswith(".npz"):
            fparams = dict(np.load(args.fan_weights))
        else:
            import torch

            sd = torch.load(args.fan_weights, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            from idealnerf_tpu.pipeline.fan import convert_torch_state_dict

            fparams = convert_torch_state_dict(sd)
        for i in ids:
            img = imageio.imread(os.path.join(ori, f"{i}.jpg"))
            box = np.array([0, 0, img.shape[1], img.shape[0]], np.float32)
            ppath = os.path.join(parsing, f"{i}.png")
            if os.path.exists(ppath):
                mask = head_mask_from_parse(imageio.imread(ppath))
                ys, xs = np.nonzero(mask)
                if len(xs):
                    m = 0.25 * max(xs.max() - xs.min(), ys.max() - ys.min())
                    box = np.array([xs.min() - m, ys.min() - m,
                                    xs.max() + m, ys.max() + m], np.float32)
            lms = detect_landmarks(fparams, img, box)
            np.savetxt(os.path.join(ori, f"{i}.lms"), lms, "%f")
        logger.info("FAN landmarks -> ori_imgs/*.lms (%d frames)", len(ids))
    elif "landmarks" in steps and args.step == "landmarks":
        logger.error("landmarks step needs --fan_weights")

    if "parse" in steps and args.parse_weights:
        # step 3 (reference process_data.py:138-139 + face_parsing/test.py):
        # BiSeNet 19-class parse -> reference color coding
        from idealnerf_tpu.pipeline.parsing_net import (
            convert_torch_state_dict, parse_image,
        )
        from idealnerf_tpu.pipeline.process import parse_color_map

        if args.parse_weights.endswith(".npz"):
            bparams = dict(np.load(args.parse_weights))
        else:
            import torch

            bparams = convert_torch_state_dict(
                torch.load(args.parse_weights, map_location="cpu")
            )
        os.makedirs(parsing, exist_ok=True)
        for i in ids:
            img = imageio.imread(os.path.join(ori, f"{i}.jpg"))
            classes = parse_image(bparams, img)
            imageio.imwrite(os.path.join(parsing, f"{i}.png"),
                            parse_color_map(classes))
        logger.info("BiSeNet parsing -> parsing/ (%d frames)", len(ids))
    elif "parse" in steps and args.step == "parse":
        logger.error("parse step needs --parse_weights (79999_iter.pth)")

    has_parsing = os.path.isdir(parsing) and os.listdir(parsing)
    if "bg" in steps:
        if not has_parsing:
            logger.error("parsing/ missing — run a face parser (BiSeNet "
                         "weights required) before the background step")
        else:
            sel = ids[:: max(len(ids) // 25, 1)][:25]
            imgs = np.stack([
                imageio.imread(os.path.join(ori, f"{i}.jpg")) for i in sel
            ])
            masks = np.stack([
                head_mask_from_parse(
                    imageio.imread(os.path.join(parsing, f"{i}.png"))
                ) for i in sel
            ])
            plate = extract_background_plate(imgs, masks)
            imageio.imwrite(os.path.join(d, "bc.jpg"), plate)
            logger.info("background plate -> bc.jpg")

    if "decouple" in steps and has_parsing and os.path.exists(
        os.path.join(d, "bc.jpg")
    ):
        plate = imageio.imread(os.path.join(d, "bc.jpg"))
        for sub in ("com_imgs", "head_imgs"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        for i in ids:
            img = imageio.imread(os.path.join(ori, f"{i}.jpg"))
            parse = imageio.imread(os.path.join(parsing, f"{i}.png"))
            com, head = decouple_images(img, parse, plate)
            imageio.imwrite(os.path.join(d, "com_imgs", f"{i}.jpg"), com)
            imageio.imwrite(os.path.join(d, "head_imgs", f"{i}.jpg"), head)
        logger.info("decoupled %d frames -> com_imgs/ head_imgs/", len(ids))

    track_path = os.path.join(d, "track_params.npz")
    if "track" in steps:
        from idealnerf_tpu.pipeline.tracking import Face3DMM, FaceTracker

        lms = np.stack([
            np.loadtxt(os.path.join(ori, f"{i}.lms")) for i in ids
        ])[..., :2]
        model = (Face3DMM.load(args.bfm) if args.bfm
                 else Face3DMM.synthetic())
        if not args.bfm:
            logger.warning("no --bfm given: tracking with the synthetic "
                           "stand-in model (poses indicative only)")
        tracker = FaceTracker(model, h, w)
        result = tracker.fit(lms)
        np.savez(track_path, focal=result.focal, euler=result.euler,
                 trans=result.trans, exp=result.exp, id=result.id_coef)
        logger.info("tracking -> %s (focal %.0f, loss %.3f)",
                    track_path, result.focal, result.loss)

    if "transforms" in steps:
        if not os.path.exists(track_path):
            logger.error("no %s — run the track step first", track_path)
            return
        tp = np.load(track_path)
        lms = {i: np.loadtxt(os.path.join(ori, f"{i}.lms"))[:, :2]
               for i in ids}
        write_transforms(
            d, ids, tp["euler"], tp["trans"] / 10.0, tp["exp"], lms,
            focal=float(tp["focal"]), h=h, w=w,
            subject=args.subject or os.path.basename(d.rstrip("/")),
        )
        logger.info("transforms_exp_{train,val}.json + config files written")


if __name__ == "__main__":
    main()
