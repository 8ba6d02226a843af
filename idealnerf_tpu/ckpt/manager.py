"""Checkpointing (orbax-backed) with the reference's resume semantics.

Reference schemas (SURVEY.md §5): monolithic
``{global_step, model_state_dict, optimizer, latent_codes}`` saved every
``i_weights`` steps to ``head.tar``/``body.tar``/``{n}_torso.tar`` with
resume from the newest match (audio_exp_nerf.py:516-526,
run_nerf.py:211-237), plus **fine-tune surgery**: when a checkpoint was
trained with different conditioning dims, the first trunk layer, the
post-skip layer, and the first view layer are dropped and everything else
is loaded non-strictly (audio_exp_nerf.py:498-514).

Here: steps are directories under the experiment dir; ``partial_restore``
generalizes the surgery — any leaf whose shape/dtype mismatches the
freshly-initialized model keeps its fresh value, the rest restore from the
checkpoint. That subsumes the reference's hand-listed key deletions and
works for every model variant.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _tree_flatten_with_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            yield from _tree_flatten_with_paths(tree[k], prefix + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_flatten_with_paths(v, prefix + (str(i),))
    elif tree is None:
        return
    else:
        yield prefix, tree


def partial_restore(restored: Any, like: Any, log=None):
    """Merge ``restored`` into ``like``: leaves with matching path+shape
    come from the checkpoint, everything else keeps ``like``'s value.

    Returns (merged, dropped_paths). This is the generalized fine-tune
    surgery: changing dim_aud/dim_expr/dim_latent changes exactly the
    shapes of the conditioned layers, which then keep their fresh init —
    the same effect as the reference deleting pts_linears.0/.5 and
    views_linears.0 weights and loading strict=False."""
    restored_map = {p: v for p, v in _tree_flatten_with_paths(restored)}
    dropped = []

    def merge(path, leaf):
        r = restored_map.get(path)
        if r is None:
            dropped.append("/".join(path) + " (missing in ckpt)")
            return leaf
        if tuple(np.shape(r)) != tuple(np.shape(leaf)):
            dropped.append(
                "/".join(path) + f" (shape {np.shape(r)} != {np.shape(leaf)})"
            )
            return leaf
        return jax.numpy.asarray(r, dtype=leaf.dtype) if hasattr(leaf, "dtype") else r

    paths_and_leaves = list(_tree_flatten_with_paths(like))
    merged_leaves = {p: merge(p, l) for p, l in paths_and_leaves}

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (str(k),)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, prefix + (str(i),)) for i, v in enumerate(tree)]
        if isinstance(tree, tuple):
            return tuple(rebuild(v, prefix + (str(i),)) for i, v in enumerate(tree))
        if tree is None:
            return None
        return merged_leaves[prefix]

    merged = rebuild(like)
    if log is not None and dropped:
        log("partial_restore dropped: %s", ", ".join(dropped))
    return merged, dropped


def finetune_surgery(restored_params: Any, fresh_params: Any):
    """Reference-style fine-tune load (audio_exp_nerf.py:498-514) via the
    generalized shape-based merge."""
    merged, dropped = partial_restore(restored_params, fresh_params)
    return merged


class CheckpointManager:
    """Step-numbered checkpoints under ``directory`` (orbax PyTree
    storage), newest-first resume like the reference's natsorted .tar
    scan."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, pytree: Any) -> str:
        path = self._step_dir(step)
        self._ckptr.save(path, pytree, force=True)
        self._ckptr.wait_until_finished()
        self._gc()
        return path

    def restore(self, like: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        try:
            return self._ckptr.restore(self._step_dir(step), like)
        except Exception as e:
            # structure mismatch (e.g. checkpoint from another
            # model_variant or conditioning dims): name the differing
            # subtrees instead of surfacing orbax's tree error
            try:
                raw = self._restore_any(self._step_dir(step))
            except Exception:
                raise e
            ck = {"/".join(p): tuple(np.shape(v))
                  for p, v in _tree_flatten_with_paths(raw)}
            want = {"/".join(p): tuple(np.shape(v))
                    for p, v in _tree_flatten_with_paths(like)}
            only_ck = sorted(set(ck) - set(want))[:8]
            only_want = sorted(set(want) - set(ck))[:8]
            shapes = sorted(k for k in set(ck) & set(want)
                            if ck[k] != want[k])[:8]
            detail = []
            if only_ck:
                detail.append(f"only in checkpoint: {only_ck}")
            if only_want:
                detail.append(f"missing from checkpoint: {only_want}")
            if shapes:
                detail.append(
                    "shape mismatches: "
                    + ", ".join(f"{k} {ck[k]} vs {want[k]}" for k in shapes))
            raise ValueError(
                f"checkpoint at {self._step_dir(step)} does not match the "
                f"target structure ({'; '.join(detail) or 'unknown diff'}). "
                "If this checkpoint came from a different model_variant or "
                "conditioning dims, use restore_partial() (shape-mismatch "
                "surgery) or restore_raw()."
            ) from e

    def _restore_any(self, path: str) -> Any:
        """Target-less restore that survives platform changes.

        Orbax records the saving devices' shardings; a checkpoint
        written on TPU then raises ``Device ... was not found in
        jax.local_devices()`` when restored on CPU (and vice versa).
        On that error, rebuild an abstract target from the checkpoint's
        own metadata with local single-device shardings and retry —
        train-on-slice / eval-on-host is a supported flow."""
        try:
            return self._ckptr.restore(path)
        except ValueError as e:
            if "not found in jax.local_devices" not in str(e):
                raise
            import jax

            meta = self._ckptr.metadata(path).item_metadata
            sharding = jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0])
            target = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=sharding),
                meta)
            return self._ckptr.restore(path, target)

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a structure target — whatever was saved.
        Needed when array sizes are data-dependent (e.g. the per-frame
        latent table is train-set-sized but eval loads a differently
        sized split)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._restore_any(self._step_dir(step))

    def restore_partial(self, like: Any, step: Optional[int] = None):
        """Restore with shape-mismatch surgery (see partial_restore)."""
        import orbax.checkpoint as ocp

        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        raw = self._restore_any(self._step_dir(step))
        return partial_restore(raw, like)

    def _gc(self):
        steps = self.all_steps()
        while len(steps) > self.max_to_keep:
            victim = steps.pop(0)
            import shutil

            shutil.rmtree(self._step_dir(victim), ignore_errors=True)
