"""Pixel metrics (reference: helper.py:148-157)."""

import jax.numpy as jnp
import numpy as np


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)
