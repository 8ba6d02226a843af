"""BiSeNet port: shape parity, converter round-trip, and (when the
reference + torch are available) activation match on random weights."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idealnerf_tpu.pipeline.parsing_net import (
    apply_bisenet, convert_torch_state_dict, init_bisenet, parse_image,
)

REF = "/root/reference/data_util/face_parsing"


def test_shapes_512():
    params = init_bisenet(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 512, 512), jnp.float32)
    out, out16, out32 = jax.jit(apply_bisenet)(params, x)
    assert out.shape == (1, 19, 512, 512)
    assert out16.shape == (1, 19, 512, 512)
    assert out32.shape == (1, 19, 512, 512)
    assert bool(jnp.isfinite(out).all())


def test_parse_image_protocol():
    params = init_bisenet(jax.random.PRNGKey(1))
    img = (np.random.RandomState(1).rand(96, 80, 3) * 255).astype(np.uint8)
    classes = parse_image(params, img, infer_size=128)
    assert classes.shape == (96, 80)
    assert classes.min() >= 0 and classes.max() < 19


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_activation_match_vs_torch():
    torch = pytest.importorskip("torch")
    import types
    if "torchvision" not in sys.modules:  # unused by the model; stub it
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    sys.path.insert(0, "/root/reference")
    try:
        from data_util.face_parsing.model import BiSeNet
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    net = BiSeNet(n_classes=19)
    net.eval()
    # randomize BN stats too (fresh BNs have mean 0 / var 1 — too easy)
    sd = net.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in sd:
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = torch.rand(sd[k].shape, generator=g) + 0.5
    net.load_state_dict(sd)

    params = convert_torch_state_dict(net.state_dict())
    x = np.random.RandomState(2).randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        t_out = [o.numpy() for o in net(torch.from_numpy(x))]
    j_out = apply_bisenet(params, jnp.asarray(x))
    for t, j in zip(t_out, j_out):
        np.testing.assert_allclose(np.asarray(j), t, atol=2e-3, rtol=1e-3)
