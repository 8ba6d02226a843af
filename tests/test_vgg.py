"""Native JAX VGG16/VGGFace feature nets + torch weight converters
(reference: loss/vgg_loss.py, loss/vgg_face_loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from idealnerf_tpu.losses.vgg import (
    init_vgg16, init_vggface, make_vgg16_loss, make_vggface_loss,
    vgg16_features, vgg16_params_from_torch, vggface_features,
    vggface_params_from_torch,
)


def _torch_vgg16_features():
    """The torchvision vgg16().features layout (indices = state dict
    keys), built directly so the test runs without torchvision."""
    import torch.nn as nn

    chans = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
             (10, 128, 256), (12, 256, 256), (14, 256, 256),
             (17, 256, 512), (19, 512, 512), (21, 512, 512)]
    layers = []
    conv_at = {i: (cin, cout) for i, cin, cout in chans}
    for i in range(23):
        if i in conv_at:
            cin, cout = conv_at[i]
            layers.append(nn.Conv2d(cin, cout, 3, padding=1))
        elif i in (4, 9, 16):
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.ReLU(inplace=False))
    return nn.Sequential(*layers)


def test_vgg16_activation_match_torch():
    """Converter on a randomly initialized torch VGG16 feature stack:
    all four relu taps match (vgg_loss.py:30-46 incl. the 0.5(x+1)
    mapping)."""
    torch.manual_seed(0)
    net = _torch_vgg16_features().eval()
    params = vgg16_params_from_torch(
        {k: v.numpy() for k, v in net.state_dict().items()})

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    taps = vgg16_features(params, jnp.asarray(x))

    xt = torch.from_numpy(0.5 * (x.transpose(0, 3, 1, 2) + 1.0))
    with torch.no_grad():
        h = xt
        want = []
        for i, layer in enumerate(net):
            h = layer(h)
            if i in (3, 8, 15, 22):   # relu1_2, relu2_2, relu3_3, relu4_3
                want.append(h.numpy())
    assert len(taps) == len(want) == 4
    for got, ref in zip(taps, want):
        np.testing.assert_allclose(
            np.asarray(got), ref.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5)


def _torch_vggface_forward(sd, x):
    """Manual torch forward of the VGGFace stack (architecture per
    vgg_face_loss.py:24-82: pad-1 convs, -inf right/bottom-padded 2x2
    pools, taps after each block's first conv)."""
    import torch.nn.functional as F

    cfg = ["conv1_1", "conv1_2", "P", "conv2_1", "conv2_2", "P",
           "conv3_1", "conv3_2", "conv3_3", "P",
           "conv4_1", "conv4_2", "conv4_3", "P", "conv5_1"]
    taps = []
    h = x
    for item in cfg:
        if item == "P":
            h = F.max_pool2d(F.pad(h, (0, 1, 0, 1), value=float("-inf")),
                             2, 2)
        else:
            h = F.relu(F.conv2d(h, sd[f"{item}.weight"],
                                sd[f"{item}.bias"], padding=1))
            if item.endswith("_1"):
                taps.append(h)
    return taps


def test_vggface_activation_match_torch_odd_size():
    """Random-weight converter round trip at an ODD input size (the
    ceil-mode pool path differs from plain pooling there)."""
    torch.manual_seed(2)
    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512)]
    names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
             "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
             "conv5_1"]
    for name, (cin, cout) in zip(names, chans):
        sd[f"{name}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"{name}.bias"] = torch.randn(cout) * 0.01
    sd["fc6.weight"] = torch.randn(2, 2)       # extra keys are ignored
    params = vggface_params_from_torch(
        {k: v.numpy() for k, v in sd.items()})

    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, (1, 25, 25, 3)).astype(np.float32)
    taps = vggface_features(params, jnp.asarray(x))
    want = _torch_vggface_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert len(taps) == len(want) == 5
    for got, ref in zip(taps, want):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=2e-4, atol=2e-5)


def test_vgg_losses_differentiable_and_jittable():
    k = jax.random.PRNGKey(0)
    p16 = init_vgg16(k)
    pface = init_vggface(k)
    fake = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3),
                              minval=-1.0)
    target = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3),
                                minval=-1.0)
    for loss_fn in (make_vgg16_loss(p16), make_vggface_loss(pface)):
        val, grad = jax.jit(jax.value_and_grad(
            lambda f: loss_fn(f, target)))(fake)
        assert np.isfinite(float(val)) and float(val) > 0
        assert float(jnp.abs(grad).max()) > 0
