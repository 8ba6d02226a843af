"""Train-step benchmark on the TPU chip: XLA autodiff vs the custom-VJP
fused-MLP kernel (kernels/fused_mlp_grad.py) at paper scale
(N_rand 3072, 64+128 samples, 450²)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from idealnerf_tpu.config import ExperimentConfig
from idealnerf_tpu.data.synthetic import make_synthetic_dataset
from idealnerf_tpu.train.head import make_head_train_step
from idealnerf_tpu.train.state import init_train_state


def bench(cfg, ds, label, steps=40):
    step_fn = make_head_train_step(cfg, ds, smooth_audio=False)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.size)
    data = ds.to_device()
    key = jax.random.PRNGKey(1)
    # warm 3 rounds (relay ramp)
    for i in range(3):
        key, k = jax.random.split(key)
        state, m = step_fn(state, data, i % ds.size, k)
        float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, m = step_fn(state, data, i % ds.size, k)
    float(m["loss"])  # force completion
    dt = time.perf_counter() - t0
    print(f"{label}: {steps / dt:.2f} steps/s ({1e3 * dt / steps:.1f} ms)"
          f"  loss={float(m['loss']):.4f}")
    return steps / dt


def main():
    hw = int(os.environ.get("KB_HW", "450"))
    ds = make_synthetic_dataset(n_frames=8, H=hw, W=hw, dim_expr=79, seed=3)
    base = dict(dim_aud=64, dim_expr=79, dim_latent=32, N_rand=3072,
                N_samples=64, N_importance=128, mouth_rays=512,
                torso_rays=512, lrate=3e-4)
    r_xla = bench(ExperimentConfig(train_fused=0, **base), ds,
                  "xla-autodiff")
    r_fused = bench(ExperimentConfig(train_fused=1, **base), ds,
                    "fused-vjp(f32-bwd)")
    r_f16 = bench(ExperimentConfig(train_fused=2, **base), ds,
                  "fused-vjp(bf16-bwd)")
    print(f"speedup f32: {r_fused / r_xla:.2f}x  bf16: {r_f16 / r_xla:.2f}x")


if __name__ == "__main__":
    main()
