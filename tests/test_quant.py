"""Int8 trunk quantization (kernels/quant.py).

The fake-quant path is documented as bit-exact to the int8 MXU; these
tests pin (a) the zero-point/bias algebra, (b) closeness of the
quantized trunk to the exact forward on a real random model, (c) that
quantize_trunk's folded constants reproduce the naive dequantize-then-
matmul formulation exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from idealnerf_tpu.kernels.quant import (
    QuantSpec, calibrate, make_quant_field_fn, quant_apply_folded,
    quantize_trunk, quantize_weight,
)
from idealnerf_tpu.models.face_nerf import (
    FaceNeRFConfig, apply_folded, fold_conditioning, init_face_nerf,
    make_field_fn, positional_encoding,
)


def _cfg():
    return FaceNeRFConfig(depth=4, width=64, skips=(1,), dim_aud=8,
                          dim_expr=0, dim_latent=4)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (37, 16)) * \
        jnp.linspace(0.1, 3.0, 16)[None, :]
    w_q, s_w = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    back = w_q.astype(jnp.float32) * s_w
    # per-channel symmetric int8: error bounded by s_w/2 per entry
    assert float(jnp.max(jnp.abs(back - w) / s_w)) <= 0.5 + 1e-5


def test_zero_point_algebra_exact():
    """x @ w computed via the -128 zero-point grid + folded bias
    correction must equal the plain dequantized product exactly."""
    key = jax.random.PRNGKey(1)
    h = jax.nn.relu(jax.random.normal(key, (128, 64)))      # >= 0
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    w_q, s_w = quantize_weight(w)
    s_h = float(jnp.max(h)) / 255.0

    # naive: dequantize h then matmul
    h_q_levels = jnp.clip(jnp.round(h / s_h), 0, 255)       # unsigned grid
    naive = (h_q_levels * s_h) @ (w_q.astype(jnp.float32) * s_w)

    # production algebra: signed grid (levels - 128) + bias correction
    h_q = h_q_levels - 128.0
    zb = 128.0 * s_h * s_w * jnp.sum(w_q.astype(jnp.float32), axis=0)
    prod = (h_q @ w_q.astype(jnp.float32)) * (s_h * s_w) + zb

    np.testing.assert_allclose(np.asarray(prod), np.asarray(naive),
                               rtol=0, atol=1e-4)


def test_quant_trunk_close_and_heads_exact():
    cfg = _cfg()
    params = init_face_nerf(jax.random.PRNGKey(3), cfg)
    aud = jnp.zeros((cfg.dim_aud,))
    latent = 0.1 * jnp.ones((cfg.dim_latent,))
    folded = fold_conditioning(params, cfg, aud=aud, latent=latent)

    pts = jax.random.uniform(jax.random.PRNGKey(4), (512, 3), minval=-1,
                             maxval=1)
    pe = positional_encoding(pts, cfg.multires)
    dirs = jax.random.normal(jax.random.PRNGKey(5), (512, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ped = positional_encoding(dirs, cfg.multires_views)

    spec = calibrate(params, cfg, folded, pe)
    assert len(spec.s_h) == cfg.depth - 1
    qp = quantize_trunk(params, cfg, spec)
    raw_q = quant_apply_folded(params, qp, spec, folded, cfg, pe, ped)
    raw = apply_folded(params, folded, cfg, pe, ped)

    # random init is near-worst-case (no training smoothness); the trunk
    # still must track the exact forward closely relative to its scale
    err = float(jnp.sqrt(jnp.mean((raw_q - raw) ** 2)))
    sig = float(jnp.sqrt(jnp.mean(raw ** 2)))
    assert np.isfinite(err)
    assert err < 0.05 * sig + 1e-3, (err, sig)


def test_quant_field_fn_shapes_and_agreement():
    cfg = _cfg()
    params = init_face_nerf(jax.random.PRNGKey(6), cfg)
    aud = jnp.zeros((cfg.dim_aud,))
    latent = jnp.zeros((cfg.dim_latent,))

    pts = jax.random.uniform(jax.random.PRNGKey(7), (32, 8, 3), minval=-1,
                             maxval=1)
    vd = jax.random.normal(jax.random.PRNGKey(8), (32, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    pe_cal = positional_encoding(pts.reshape(-1, 3), cfg.multires)
    folded = fold_conditioning(params, cfg, aud=aud, latent=latent)
    spec = calibrate(params, cfg, folded, pe_cal)

    f_exact = make_field_fn(params, cfg, aud=aud, latent=latent)
    f_quant = make_quant_field_fn(params, cfg, spec, aud=aud, latent=latent)
    raw_e = f_exact(pts, vd)
    raw_q = f_quant(pts, vd)
    assert raw_q.shape == raw_e.shape == (32, 8, 4)
    err = float(jnp.sqrt(jnp.mean((raw_q - raw_e) ** 2)))
    sig = float(jnp.sqrt(jnp.mean(raw_e ** 2))) + 1e-6
    assert err < 0.05 * sig + 1e-3
