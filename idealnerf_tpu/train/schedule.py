"""Learning-rate schedule: lrate * 0.1^(step / (lrate_decay * 1500)),
matching audio_exp_nerf.py:554-558 / baseline.py's manual decay."""

from __future__ import annotations

import optax


def exponential_lr(lrate: float, lrate_decay: int) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=lrate,
        transition_steps=lrate_decay * 1500,
        decay_rate=0.1,
        staircase=False,
    )
