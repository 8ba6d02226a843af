"""idealnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
audio- and expression-driven talking-head NeRF synthesis.

Re-designed from scratch with the capabilities of the IDEAL-NeRF reference
(see SURVEY.md): conditioned NeRF field models, hierarchical volume
rendering with background-plate compositing, DeepSpeech audio conditioning,
head+torso layered rendering, cross-subject reenactment evaluation — all
expressed as pure functions over pytrees, compiled by XLA, sharded with
jax.sharding over device meshes, with Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
