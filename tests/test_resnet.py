"""ResNet trunk: shapes, frozen BN, and weight-port parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.models.resnet import (ResNetTrunk,
                                                  port_torch_resnet,
                                                  preprocess_image)


@pytest.mark.slow
def test_trunk_shapes_small_depth():
    # depth 50 with tiny input to keep CPU time low
    m = ResNetTrunk(depth=50, num_stages=4)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 2, 2, 2048)
    m3 = ResNetTrunk(depth=50, num_stages=3)
    p3 = m3.init(jax.random.PRNGKey(0), x)
    y3 = m3.apply(p3, x)
    assert y3.shape == (1, 4, 4, 1024)


@pytest.mark.slow
def test_patches_layout():
    m = ResNetTrunk(depth=50, num_stages=4)
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    p = m.apply(params, x, method=ResNetTrunk.patches)
    assert p.shape == (2, 4, 2048)


def test_preprocess_center_crop_and_normalize():
    img = np.full((256, 256, 3), 128, np.uint8)
    out = preprocess_image(jnp.asarray(img), crop=224)
    assert out.shape == (1, 224, 224, 3)
    expected = (128 / 255.0 - 0.485) / 0.229
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expected,
                               rtol=1e-5)


def _torch_resnet(depth_blocks, in_ch=3):
    """Minimal torchvision-compatible bottleneck ResNet (state-dict
    layout matches torchvision naming) for port parity testing."""
    import torch
    import torch.nn as tn

    class TB(tn.Module):  # bottleneck
        def __init__(self, inp, planes, stride=1, down=False):
            super().__init__()
            self.conv1 = tn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tn.BatchNorm2d(planes)
            self.conv2 = tn.Conv2d(planes, planes, 3, stride, 1,
                                   bias=False)
            self.bn2 = tn.BatchNorm2d(planes)
            self.conv3 = tn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tn.BatchNorm2d(planes * 4)
            self.relu = tn.ReLU()
            self.downsample = None
            if down:
                self.downsample = tn.Sequential(
                    tn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                    tn.BatchNorm2d(planes * 4))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + r)

    class Net(tn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = tn.BatchNorm2d(64)
            self.relu = tn.ReLU()
            self.maxpool = tn.MaxPool2d(3, 2, 1)
            inp = 64
            for si, nb in enumerate(depth_blocks):
                planes = 64 * 2 ** si
                stride = 1 if si == 0 else 2
                blocks = []
                for b in range(nb):
                    down = b == 0 and (stride != 1 or inp != planes * 4)
                    blocks.append(TB(inp, planes,
                                     stride if b == 0 else 1, down))
                    inp = planes * 4
                setattr(self, f"layer{si + 1}", tn.Sequential(*blocks))

        def forward(self, x):
            y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for si in range(len(depth_blocks)):
                y = getattr(self, f"layer{si + 1}")(y)
            return y

    return Net()


def test_port_parity_with_torch():
    """Random torch weights ported -> identical features."""
    import torch
    torch.manual_seed(0)
    # a resnet50-shaped net truncated to 2 stages for speed
    net = _torch_resnet([3, 4, 6, 3]).eval()
    # randomize running stats so BN porting is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(0).standard_normal(
        (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = net(torch.tensor(x)).permute(0, 2, 3, 1).numpy()

    m = ResNetTrunk(depth=50, num_stages=4)
    params = port_torch_resnet(net.state_dict(), depth=50, num_stages=4)
    got = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)
