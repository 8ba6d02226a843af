"""Train-step cost bisection (ROADMAP perf item 3: where do the ~42 ms
go beyond the fused MLP fwd+bwd?).

Times four ablations of the paper-config head train step on one chip,
each as a steady-state ≥reps-iteration loop with a single host fetch at
the end (axon timing discipline — BASELINE.md):

  A. full step        (sampling + loss fwd/bwd + Adam, the real thing)
  B. fixed-coords     (skips on-device masked-top-k ray sampling)
  C. sgd              (Adam update/state replaced by plain sgd)
  D. grad-only        (no optimizer update at all; grads fetched)

B−A isolates the sampler, C/D−A the optimizer; the remainder vs the
kernel microbench (scripts/kbench_train.py) is compositing/loss glue.
Writes runs/train_profile.json.

Usage: python scripts/train_profile.py [--steps 100] [--smoke]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax

    from idealnerf_tpu.config import ExperimentConfig
    from idealnerf_tpu.data import make_synthetic_dataset
    from idealnerf_tpu.data.sampler import RayBudget, sample_ray_coords
    from idealnerf_tpu.train.head import make_frame_loss
    from idealnerf_tpu.train.state import (
        TrainState, init_train_state, make_optimizer,
    )

    paper = dict(N_rand=3072, N_samples=64, N_importance=128, dim_aud=64,
                 dim_expr=79, dim_latent=32, mouth_rays=512, torso_rays=512)
    hw, frames, steps = 450, 8, args.steps
    if args.smoke:
        paper.update(N_rand=128, N_samples=8, N_importance=8, dim_expr=8,
                     mouth_rays=16, torso_rays=16)
        hw, frames, steps = 48, 3, 4
    cfg = ExperimentConfig(**paper)
    ds = make_synthetic_dataset(n_frames=frames, H=hw, W=hw,
                                dim_expr=cfg.dim_expr)
    data = ds.to_device()
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    H, W = ds.hw
    budget = RayBudget.from_config(
        cfg.N_rand, cfg.mouth_rays, cfg.torso_rays, cfg.sample_rate)
    loss_fn = make_frame_loss(cfg, ds, smooth_audio=False)

    def make_step(sample: bool, opt: str):
        import dataclasses

        optimizer = (make_optimizer(cfg) if opt == "adam"
                     else make_optimizer(
                         dataclasses.replace(cfg, flat_optimizer=True))
                     if opt == "flat_adam"
                     else optax.sgd(1e-4) if opt == "sgd" else None)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, data, index, key, coords0):
            k_sample, k_render = jax.random.split(key)
            coords = (sample_ray_coords(
                k_sample, H, W, data["face_rects"][index],
                data["mouth_boxes"][index], data["torso_masks"][index],
                budget, approx=(sample == "approx"))
                if sample else coords0)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                (state.params, state.latent_codes), data, index, coords,
                k_render)
            if optimizer is None:
                leaves = jax.tree.leaves(grads)
                return state, loss + sum(jnp.sum(g * 0) for g in leaves)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, (state.params, state.latent_codes))
            params, latents = optax.apply_updates(
                (state.params, state.latent_codes), updates)
            return TrainState(state.step + 1, params, latents,
                              opt_state), loss

        return step

    coords0 = jnp.stack(
        [jnp.arange(cfg.N_rand, dtype=jnp.int32) // W % H,
         jnp.arange(cfg.N_rand, dtype=jnp.int32) % W], -1)

    results = {}
    variants = [("full", True, "adam"), ("fixed_coords", False, "adam"),
                ("sgd", True, "sgd"), ("grad_only", True, "none"),
                ("flat_adam", True, "flat_adam"),
                ("approx_sampler", "approx", "adam"),
                ("flat_adam_approx", "approx", "flat_adam")]
    for name, sample, opt in variants:
        st = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
        if opt == "sgd":
            st = st._replace(opt_state=optax.sgd(1e-4).init(
                (st.params, st.latent_codes)))
        elif opt == "flat_adam":
            import dataclasses

            st = st._replace(opt_state=make_optimizer(
                dataclasses.replace(cfg, flat_optimizer=True)).init(
                (st.params, st.latent_codes)))
        step = make_step(sample, opt)
        key = jax.random.PRNGKey(1)
        # warm
        st, loss = step(st, data, 0, key, coords0)
        _ = float(loss)
        t0 = time.time()
        for i in range(steps):
            key, k = jax.random.split(key)
            st, loss = step(st, data, i % ds.size, k, coords0)
        _ = float(loss)  # one host fetch closes the timing region
        dt = (time.time() - t0) / steps
        results[name] = {"ms_per_step": round(dt * 1e3, 2),
                         "steps_per_sec": round(1.0 / dt, 1)}
        print(name, results[name], flush=True)

    full = results["full"]["ms_per_step"]
    results["sampler_ms"] = round(
        full - results["fixed_coords"]["ms_per_step"], 2)
    results["adam_vs_sgd_ms"] = round(
        full - results["sgd"]["ms_per_step"], 2)
    results["optimizer_ms"] = round(
        full - results["grad_only"]["ms_per_step"], 2)
    results["flat_adam_saves_ms"] = round(
        full - results["flat_adam"]["ms_per_step"], 2)
    results["approx_sampler_saves_ms"] = round(
        full - results["approx_sampler"]["ms_per_step"], 2)
    results["combined_saves_ms"] = round(
        full - results["flat_adam_approx"]["ms_per_step"], 2)
    results["backend"] = jax.default_backend()
    with open(os.path.join(ROOT, "runs", "train_profile.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
