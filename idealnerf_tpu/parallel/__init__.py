"""Parallelism: device meshes + sharded training.

The reference scales with single-process ``nn.DataParallel`` plus manual
ray-axis reshapes (SURVEY.md §2.9). TPU-native equivalent: a
``jax.sharding.Mesh`` with ('data', 'ray') axes — frames batch over
'data', each frame's ray budget shards over 'ray' — and XLA GSPMD inserts
the gradient all-reduces over ICI. No manual collectives.
"""

from idealnerf_tpu.parallel.mesh import make_mesh
from idealnerf_tpu.parallel.sharded import (
    make_sharded_composite_renderer, make_sharded_composite_video_renderer,
    make_sharded_frame_renderer, make_sharded_torso_train_step,
    make_sharded_train_step, make_sharded_video_renderer,
)
from idealnerf_tpu.parallel.trainers import (
    ShardedHeadTrainer, ShardedTorsoTrainer,
)
