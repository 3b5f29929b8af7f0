"""ResNet feature extractor (headless trunk) with frozen BatchNorm.

Capability parity targets:
- Gen-2 `ResNetFeatureExtractor` with layer4 removed -> 14x14x1024
  patches (/root/reference/final/resnet.py:12-117, used at
  final/encoder.py:47-62)
- Gen-3 full trunk -> 7x7x2048 (/root/reference/ttl/tell/models/resnet.py:12-192,
  used at transformer_flattened.py:185-195)
- Gen-1 `build_cnn` trunk + fc/att pooling (/root/reference/misc/resnet_utils.py:6-27)

Every reference training path freezes the CNN in eval mode
(train.py:121-124; trainer `no_grad: ^resnet`), so BatchNorm is a
constant affine transform here (running stats baked in) — which also
sidesteps cross-replica BN under pjit (SURVEY.md §7).

`port_torch_resnet` converts a torchvision-style state dict (from
`torchvision.models.resnet152(...).state_dict()` or a compatible
checkpoint) into this module's params for weight-exact inference.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

DEPTHS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FrozenBatchNorm(nn.Module):
    """BN in eval mode: y = (x - mean) / sqrt(var+eps) * scale + bias."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(y))
        y = nn.Conv(self.planes * self.expansion, (1, 1),
                    use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(self.planes * self.expansion, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * self.expansion,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """Headless ResNet. `num_stages=3` -> layer3 output (Gen-2),
    `num_stages=4` -> layer4 output (Gen-3). Input NHWC float."""

    depth: int = 152
    num_stages: int = 4

    @nn.compact
    def __call__(self, x):
        blocks = DEPTHS[self.depth]
        block_cls = Bottleneck if self.depth >= 50 else BasicBlock
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(64, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1),
                                                            (1, 1)))
        in_planes = 64
        for stage in range(self.num_stages):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(blocks[stage]):
                down = (b == 0 and
                        (stride != 1
                         or in_planes != planes * block_cls.expansion))
                y = block_cls(planes, stride if b == 0 else 1, down,
                              name=f"layer{stage + 1}_{b}")(y)
                in_planes = planes * block_cls.expansion
        return y

    def patches(self, x) -> jax.Array:
        """[B, H, W, C] -> [B, H*W, C] patch features."""
        y = self(x)
        B, H, W, C = y.shape
        return y.reshape(B, H * W, C)


def preprocess_image(img_uint8: jax.Array,
                     crop: int = 224,
                     random_crop: bool = False,
                     rng=None) -> jax.Array:
    """uint8 HWC [0,255] -> normalized float NHWC.

    Parity: prepro_images (/root/reference/misc/utils.py:114-129) and
    the Gen-2 loader normalize (final/dataloader.py:98-118).
    """
    x = img_uint8.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if x.ndim == 3:
        x = x[None]
    B, H, W, C = x.shape
    if H == crop and W == crop:
        return x
    if H < crop or W < crop:
        # A sub-crop image would make randint(maxval<=0) /
        # dynamic_slice fail or silently clamp to shifted content.
        # The reference resizes to >= crop first (torchvision
        # Resize(256) before the crop) — do the same.
        x = jax.image.resize(
            x, (B, max(H, crop), max(W, crop), C), method="bilinear")
        B, H, W, C = x.shape
        if H == crop and W == crop:
            return x
    if random_crop and rng is not None:
        ky, kx = jax.random.split(rng)
        top = jax.random.randint(ky, (), 0, H - crop + 1)
        left = jax.random.randint(kx, (), 0, W - crop + 1)
    else:
        top, left = (H - crop) // 2, (W - crop) // 2
    return jax.lax.dynamic_slice(x, (0, top, left, 0), (B, crop, crop, C))


# ----------------------------------------------------------------------
# torch state-dict porting
# ----------------------------------------------------------------------

def _conv(w) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def port_torch_resnet(state_dict: Dict[str, Any], depth: int = 152,
                      num_stages: int = 4) -> Dict:
    """torchvision resnet state_dict -> ResNetTrunk params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"]}

    p["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    p["bn1"] = bn("bn1")
    blocks = DEPTHS[depth]
    for stage in range(num_stages):
        for b in range(blocks[stage]):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            entry = {}
            n_convs = 3 if depth >= 50 else 2
            for ci in range(1, n_convs + 1):
                entry[f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                entry[f"bn{ci}"] = bn(f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                entry["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                entry["downsample_bn"] = bn(f"{t}.downsample.1")
            p[f] = entry
    return {"params": jax.tree.map(jnp.asarray, p)}
