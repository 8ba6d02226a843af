"""Numerical diagnostics & profiling (reference parity + beyond:
SURVEY.md §5 — the reference NaN/Inf-scans every render output dict
(audio_exp_nerf.py:367-369) and wall-clock-times frames
(test_torso.py:46-49); it has no real profiler).

- ``finite_check``: jit-compatible aggregate NaN/Inf scan over a pytree —
  one scalar per tree, logged by trainers when debug mode is on.
- ``profile``: context manager around jax.profiler trace collection
  (view with TensorBoard or xprof).
- ``StepTimer``: per-step wall-clock with warmup skip, honest through the
  axon tunnel (forces a host fetch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax
import jax.numpy as jnp


def finite_check(tree) -> jnp.ndarray:
    """1.0 iff every leaf of ``tree`` is finite (usable inside jit)."""
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.ones(())
    oks = [jnp.all(jnp.isfinite(l)) for l in leaves]
    return jnp.prod(jnp.stack([o.astype(jnp.float32) for o in oks]))


@contextlib.contextmanager
def profile(logdir: str) -> Iterator[None]:
    """Collect a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        self._t0 = None
        self._steps = 0

    def tick(self, fetch=None) -> Dict[str, float]:
        """Call once per step; pass a device value to force completion
        (block_until_ready is unreliable through remote tunnels)."""
        if fetch is not None:
            jnp.asarray(fetch).block_until_ready()
            float(jnp.asarray(fetch).ravel()[0])
        self._n += 1
        if self._n == self.warmup:
            self._t0 = time.perf_counter()
            self._steps = 0
        elif self._n > self.warmup:
            self._steps += 1
        if self._t0 is None or self._steps == 0:
            return {}
        dt = time.perf_counter() - self._t0
        return {"steps_per_sec": self._steps / dt,
                "ms_per_step": 1000.0 * dt / self._steps}
