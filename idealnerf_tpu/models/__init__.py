"""Field models and conditioning encoders (functional: init/apply pairs
over plain pytrees — pjit-friendly, no module framework)."""

from idealnerf_tpu.models.face_nerf import FaceNeRFConfig, init_face_nerf, apply_face_nerf, make_field_fn
from idealnerf_tpu.models.audio_net import (
    init_audio_net, apply_audio_net,
    init_audio_att_net, apply_audio_att_net,
    init_ds_aud_net, apply_ds_aud_net,
)
