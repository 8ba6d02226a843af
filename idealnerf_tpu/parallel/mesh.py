"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: Optional[int] = None,
    n_ray: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'ray') mesh over the available devices.

    Defaults: all rays on one axis (n_data=1) — the natural single-host
    scaling axis for NeRF training is rays/frame (SURVEY.md §2.9). For
    multi-frame batches set n_data > 1; data-parallel gradient psum rides
    ICI within a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_ray is None:
        n_data, n_ray = 1, n
    elif n_data is None:
        n_data = n // n_ray
    elif n_ray is None:
        n_ray = n // n_data
    assert n_data * n_ray == n, (n_data, n_ray, n)
    mesh_devices = np.asarray(devices).reshape(n_data, n_ray)
    return Mesh(mesh_devices, axis_names=("data", "ray"))
