"""Train state: model params + per-frame latent codes + adam state.

Matches the reference's optimization setup: a single Adam over network
parameters *and* the learned (data_size, 32) latent-code table
(audio_exp_nerf.py:482-493, latent codes initialized to ones), exponential
LR decay applied per step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.models.audio_net import (
    init_audio_att_net, init_audio_net, init_ds_aud_net,
)
from idealnerf_tpu.models.face_nerf import init_face_nerf
from idealnerf_tpu.models.variants import init_variant_extras, variant_nerf_config
from idealnerf_tpu.train.schedule import exponential_lr


class TrainState(NamedTuple):
    step: jnp.ndarray            # int32 global step
    params: Dict[str, Any]       # coarse/fine/aud_net/aud_att/ds_aud
    latent_codes: jnp.ndarray    # (data_size, dim_latent)
    opt_state: Any


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    base = optax.adam(exponential_lr(cfg.lrate, cfg.lrate_decay),
                      b1=0.9, b2=0.999)
    if getattr(cfg, "flat_optimizer", True):
        # one fused Adam kernel over a single flat vector instead of a
        # per-leaf kernel chain — saves ~9 ms/step at paper scale
        # (runs/train_profile.json) with a per-element-identical update
        # (tests/test_data_and_train.py). Changes the opt_state
        # checkpoint layout; resume of either layout works through
        # migrate_opt_state_layout (HeadTrainer falls back to it).
        return optax.flatten(base)
    return base


def migrate_opt_state_layout(old, template):
    """Convert an optax.adam(+flatten) state between the per-leaf-tree
    and flat-vector layouts.

    ``old`` is a restored optimizer state whose ScaleByAdamState mu/nu
    layout differs from ``template``'s (the freshly-initialized state for
    the current ``cfg.flat_optimizer``); all other chain members (step
    counts, schedule states) are layout-independent and pass through.
    Flattening follows jax.flatten_util.ravel_pytree — the same order
    optax.flatten uses — so momenta are preserved exactly in either
    direction and resume continues bit-identically."""
    from jax.flatten_util import ravel_pytree

    def cvt(x_old, x_new):
        if (jax.tree.structure(x_old) == jax.tree.structure(x_new)
                and all(np.shape(a) == np.shape(b) for a, b in zip(
                    jax.tree.leaves(x_old), jax.tree.leaves(x_new)))):
            return x_old
        if hasattr(x_new, "ndim") and x_new.ndim == 1:   # tree -> flat
            return ravel_pytree(x_old)[0]
        _, unravel = ravel_pytree(x_new)                 # flat -> tree
        return unravel(jnp.asarray(x_old))

    def walk(o, n):
        if hasattr(n, "_fields"):                        # NamedTuple
            if set(n._fields) >= {"mu", "nu"}:
                return n._replace(
                    **{f: (cvt(getattr(o, f), getattr(n, f))
                           if f in ("mu", "nu") else getattr(o, f))
                       for f in n._fields})
            return type(n)(*[walk(a, b) for a, b in zip(o, n)])
        if isinstance(n, (tuple, list)):
            return type(n)(walk(a, b) for a, b in zip(o, n))
        return o

    return walk(old, template)


def restore_train_state(ckpt, state: TrainState, cfg) -> TrainState:
    """CheckpointManager.restore of a TrainState with opt_state layout
    migration: a checkpoint written under the other ``cfg.flat_optimizer``
    setting restores against its own layout and converts momenta exactly
    (migrate_opt_state_layout) instead of failing the structure check."""
    try:
        return ckpt.restore(state)
    except ValueError as e:
        import dataclasses as _dc

        other = _dc.replace(
            cfg, flat_optimizer=not getattr(cfg, "flat_optimizer", True))
        like = state._replace(opt_state=make_optimizer(other).init(
            (state.params, state.latent_codes)))
        try:
            restored = ckpt.restore(like)
        except ValueError:
            raise e from None
        return restored._replace(opt_state=migrate_opt_state_layout(
            restored.opt_state, state.opt_state))


def init_train_state(key, cfg: ExperimentConfig, data_size: int) -> TrainState:
    ks = jax.random.split(key, 6)
    nerf_cfg = variant_nerf_config(cfg)
    params = {
        "coarse": init_face_nerf(ks[0], nerf_cfg),
        "fine": init_face_nerf(ks[1], nerf_cfg),
        "aud_net": init_audio_net(ks[2], dim_aud=cfg.dim_aud),
        "aud_att": init_audio_att_net(ks[3], dim_aud=cfg.dim_aud, seq_len=cfg.smo_size),
        "ds_aud": init_ds_aud_net(ks[4], win_size=cfg.win_size),
    }
    params.update(init_variant_extras(ks[5], cfg))
    # dim_latent=0 (baseline) keeps a 1-wide dummy table: zero-size arrays
    # are unoptimizable noise and orbax refuses to checkpoint them
    latent = jnp.ones((data_size, max(cfg.dim_latent, 1)), jnp.float32)
    opt_state = make_optimizer(cfg).init((params, latent))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        latent_codes=latent,
        opt_state=opt_state,
    )
