"""Offline data-production pipeline (reference: data_util/ — SURVEY.md
§2.6): DeepSpeech-style audio features, BiSeNet parse-map semantics,
background-plate extraction, head/composite image decoupling, 3DMM head
tracking (JAX), and the transforms_exp_*.json writer.

External model weights (TF DeepSpeech graph, BiSeNet, FAN, Basel Face
Model) cannot be downloaded in this environment; every stage that needs
them takes a pluggable callable and the surrounding math is native and
tested.
"""

from idealnerf_tpu.pipeline.audio import (
    mfcc, deepspeech_input_vector, interpolate_features,
    make_audio_windows, extract_deepspeech_features,
)
from idealnerf_tpu.pipeline.deepspeech import (
    deepspeech_logits, load_params as load_deepspeech_params,
    make_logits_fn, make_logits_fn_from_graph, random_params
    as random_deepspeech_params,
)
from idealnerf_tpu.pipeline.process import (
    extract_background_plate, decouple_images, write_transforms,
    parse_color_map,
)
