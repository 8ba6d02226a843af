"""Trainers: functional train states + jitted whole-step programs.

One XLA program per step: frame gather from HBM-resident data, on-device
ray sampling, audio encoding, hierarchical render, loss, grads, adam —
there is no host work in the hot loop (contrast SURVEY.md §3.1: the
reference does disk reads and CUDA-in-DataLoader-worker sampling per
step).
"""

from idealnerf_tpu.train.state import TrainState, init_train_state
from idealnerf_tpu.train.schedule import exponential_lr
from idealnerf_tpu.train.head import HeadTrainer, make_head_train_step
