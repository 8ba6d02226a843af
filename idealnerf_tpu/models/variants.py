"""Model-variant machinery: one trainer, pluggable conditioning paths.

The reference implements each variant as a separate ~550-line trainer
script copying the same loop (SURVEY.md §2.4). Here a variant is just a
different mapping from (audio feature, expr, latent) to the conditioned
field — all of them reduce to the folded-bias FaceNeRF point MLP:

- "face_nerf" (audio_exp_nerf.py): cond = aud ‖ expr/3 ‖ latent.
- "face_nerf_agg" (agg_aud_exp_nerf.py + models/face_nerf_agg.py): a
  2-layer *linear* MLP (no activations — face_nerf_agg.py:62-64 applies
  none) fuses aud ‖ expr/3 into dim_agg, which conditions both the trunk
  and the view branch. Expressed here as FaceNeRF(dim_aud=0,
  dim_expr=dim_agg) driven with expr = 3·agg (pre-cancelling the /3), so
  the folded/Pallas fast path is reused unchanged.
- "attention_nerf" (attention_nerf.py + models/self_attention.py +
  models/attention_nerf.py): SelfAttention over the fused aud ‖ expr/3
  vector; its output conditions an AttentionNeRF decoder. The reference
  recomputes the attention per netchunk over *identical broadcast rows*
  (attention_nerf.py:356-362) — softmax over identical rows is uniform,
  so the result is a per-frame constant vector; we compute it once per
  frame and fold it. AttentionNeRF's topology (attention_nerf.py models
  file) is FaceNeRF with the attention vector in place of aud and no expr
  on the view branch — realized as FaceNeRF(dim_aud=attn_dim, dim_expr=0).
  (Reference quirk not replicated: AttentionNeRF's default input_ch=256
  disagrees with the actual attention width dim_aud+dim_expr; the shipped
  configs leave both dims 0.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from idealnerf_tpu.models.attention import (
    apply_self_attention, init_self_attention,
)
from idealnerf_tpu.models.face_nerf import FaceNeRFConfig, make_field_fn
from idealnerf_tpu.models.nn import dense, init_dense

VARIANTS = ("face_nerf", "face_nerf_agg", "attention_nerf")


def variant_nerf_config(cfg) -> FaceNeRFConfig:
    """The FaceNeRF topology used by cfg.model_variant."""
    v = cfg.model_variant
    if v == "face_nerf":
        return cfg.face_nerf_config()
    if v == "face_nerf_agg":
        return cfg.face_nerf_config(dim_aud=0, dim_expr=cfg.dim_agg)
    if v == "attention_nerf":
        return cfg.face_nerf_config(
            dim_aud=cfg.dim_aud + cfg.dim_expr, dim_expr=0
        )
    raise ValueError(f"unknown model_variant {v!r}; expected one of {VARIANTS}")


def init_variant_extras(key, cfg) -> Dict[str, Any]:
    """Extra (non-NeRF) parameters the variant needs."""
    v = cfg.model_variant
    if v == "face_nerf_agg":
        ks = jax.random.split(key, 2)
        return {"agg": [
            init_dense(ks[0], cfg.dim_aud + cfg.dim_expr, cfg.dim_agg),
            init_dense(ks[1], cfg.dim_agg, cfg.dim_agg),
        ]}
    if v == "attention_nerf":
        return {"self_att": init_self_attention(
            key, cfg.dim_aud + cfg.dim_expr, cfg.attn_output_ch
        )}
    return {}


def variant_conditioning(
    params: Dict[str, Any],
    cfg,
    aud_feature: Optional[jnp.ndarray],
    expr: Optional[jnp.ndarray],
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """-> (aud_arg, expr_arg) to feed the variant's FaceNeRF config."""
    v = cfg.model_variant
    if v == "face_nerf":
        return aud_feature, expr
    fused = jnp.concatenate([aud_feature, expr / 3.0], axis=-1)
    if v == "face_nerf_agg":
        h = fused
        for layer in params["agg"]:
            h = dense(layer, h)  # linear, no activations (reference parity)
        return None, 3.0 * h  # expr path re-applies the /3
    if v == "attention_nerf":
        attn = apply_self_attention(params["self_att"], fused[None])[0]
        return attn, None
    raise ValueError(f"unknown model_variant {v!r}")


def build_field_fns(
    params: Dict[str, Any],
    cfg,
    aud_feature: Optional[jnp.ndarray],
    expr: Optional[jnp.ndarray],
    latent: Optional[jnp.ndarray],
    compute_dtype=None,
    use_pallas: bool = False,
):
    """(coarse_fn, fine_fn) for the configured variant."""
    ncfg = variant_nerf_config(cfg)
    aud_arg, expr_arg = variant_conditioning(params, cfg, aud_feature, expr)
    mk = lambda p: make_field_fn(
        p, ncfg, aud_arg, expr_arg, latent,
        compute_dtype=compute_dtype, use_pallas=use_pallas,
    )
    return mk(params["coarse"]), mk(params["fine"]) if "fine" in params else None
