"""FAN 2DFAN-4 port: shapes, landmark decode, and activation match vs a
torch construction of the same (public) stacked-hourglass architecture
(Bulat & Tzimiropoulos, ICCV'17 — the network inside the reference's
TorchScript 2DFAN4 archive, loss/landmark_loss.py:76-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import idealnerf_tpu.pipeline.fan as fan_mod
from idealnerf_tpu.pipeline.fan import (
    apply_fan, convert_torch_state_dict, heatmaps_to_landmarks, init_fan,
)


def test_shapes_and_decode():
    params = init_fan(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 256, 256), jnp.float32)
    outs = apply_fan(params, x)
    assert len(outs) == 4
    assert all(o.shape == (1, 68, 64, 64) for o in outs)
    lms = heatmaps_to_landmarks(outs[-1])
    assert lms.shape == (1, 68, 2)
    assert float(lms.min()) >= -0.5 and float(lms.max()) <= 63.5


def test_heatmap_loss_differentiable():
    """Gradient of the heatmap L1 w.r.t. the input image is nonzero —
    the property second-stage training relies on (distribute_nerf
    487-491)."""
    params = init_fan(jax.random.PRNGKey(1), num_modules=1)
    old = fan_mod.NUM_MODULES
    fan_mod.NUM_MODULES = 1
    try:
        x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 64, 64),
                        jnp.float32)
        target = jnp.zeros((1, 68, 16, 16))

        def loss(img):
            hm = apply_fan(params, img)[-1]
            return jnp.mean(jnp.abs(hm - target))

        g = jax.grad(loss)(x)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0
    finally:
        fan_mod.NUM_MODULES = old


def _torch_fan(torch, nn, F, num_modules):
    """The public FAN architecture, built in torch for converter parity."""

    def conv3x3(i, o):
        return nn.Conv2d(i, o, 3, 1, 1, bias=False)

    class ConvBlock(nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(i)
            self.conv1 = conv3x3(i, o // 2)
            self.bn2 = nn.BatchNorm2d(o // 2)
            self.conv2 = conv3x3(o // 2, o // 4)
            self.bn3 = nn.BatchNorm2d(o // 4)
            self.conv3 = conv3x3(o // 4, o // 4)
            self.downsample = None
            if i != o:
                self.downsample = nn.Sequential(
                    nn.BatchNorm2d(i), nn.ReLU(True),
                    nn.Conv2d(i, o, 1, 1, bias=False))

        def forward(self, x):
            o1 = self.conv1(F.relu(self.bn1(x)))
            o2 = self.conv2(F.relu(self.bn2(o1)))
            o3 = self.conv3(F.relu(self.bn3(o2)))
            out = torch.cat([o1, o2, o3], 1)
            res = x if self.downsample is None else self.downsample(x)
            return out + res

    class HourGlass(nn.Module):
        def __init__(self, depth):
            super().__init__()
            self.depth = depth
            for lv in range(depth, 0, -1):
                self.add_module(f"b1_{lv}", ConvBlock(256, 256))
                self.add_module(f"b2_{lv}", ConvBlock(256, 256))
                if lv == 1:
                    self.add_module(f"b2_plus_{lv}", ConvBlock(256, 256))
                self.add_module(f"b3_{lv}", ConvBlock(256, 256))

        def _fwd(self, lv, x):
            up1 = self._modules[f"b1_{lv}"](x)
            low1 = self._modules[f"b2_{lv}"](F.avg_pool2d(x, 2, 2))
            low2 = (self._fwd(lv - 1, low1) if lv > 1
                    else self._modules[f"b2_plus_{lv}"](low1))
            low3 = self._modules[f"b3_{lv}"](low2)
            return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

        def forward(self, x):
            return self._fwd(self.depth, x)

    class FAN(nn.Module):
        def __init__(self, nm):
            super().__init__()
            self.nm = nm
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
            self.bn1 = nn.BatchNorm2d(64)
            self.conv2 = ConvBlock(64, 128)
            self.conv3 = ConvBlock(128, 128)
            self.conv4 = ConvBlock(128, 256)
            for i in range(nm):
                self.add_module(f"m{i}", HourGlass(4))
                self.add_module(f"top_m_{i}", ConvBlock(256, 256))
                self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"bn_end{i}", nn.BatchNorm2d(256))
                self.add_module(f"l{i}", nn.Conv2d(256, 68, 1))
                if i < nm - 1:
                    self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                    self.add_module(f"al{i}", nn.Conv2d(68, 256, 1))

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.avg_pool2d(self.conv2(x), 2, 2)
            x = self.conv4(self.conv3(x))
            prev, outs = x, []
            for i in range(self.nm):
                ll = self._modules[f"top_m_{i}"](self._modules[f"m{i}"](prev))
                ll = F.relu(self._modules[f"bn_end{i}"](
                    self._modules[f"conv_last{i}"](ll)))
                out = self._modules[f"l{i}"](ll)
                outs.append(out)
                if i < self.nm - 1:
                    prev = (prev + self._modules[f"bl{i}"](ll)
                            + self._modules[f"al{i}"](out))
            return outs

    return FAN(num_modules)


def test_activation_match_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    net = _torch_fan(torch, nn, F, num_modules=2)
    net.eval()
    sd = net.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in sd:
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = torch.rand(sd[k].shape, generator=g) + 0.5
    net.load_state_dict(sd)

    params = convert_torch_state_dict(net.state_dict())
    x = np.random.RandomState(2).rand(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        t_outs = [o.numpy() for o in net(torch.from_numpy(x))]

    old = fan_mod.NUM_MODULES
    fan_mod.NUM_MODULES = 2
    try:
        j_outs = apply_fan(params, jnp.asarray(x))
    finally:
        fan_mod.NUM_MODULES = old
    assert len(j_outs) == len(t_outs)
    for t, j in zip(t_outs, j_outs):
        np.testing.assert_allclose(np.asarray(j), t, atol=2e-3, rtol=1e-3)
