"""FaceNet: MTCNN face detector + InceptionResnetV1 embedder, in Flax.

Capability parity target: /root/reference/ttl/tell/facenet/
(mtcnn.py:11-372 PNet/RNet/ONet cascade + detect_face,
inception_resnet_v1.py:184 vggface2 512-d embeddings), used by the
serving worker (tasks/captioner.py) to attach face contexts.

TPU-first: the three cascade nets and the embedder are jitted Flax
modules (frozen BN); the pyramid/NMS orchestration is host-side numpy
(it is control-flow heavy and runs once per request, not per step).
`port_facenet_pt` maps facenet-pytorch state dicts for weight-exact
inference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from news_image_caption_tpu.models.resnet import FrozenBatchNorm


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False,
                    name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(x)
        return nn.relu(x)


# ----------------------------------------------------------------------
# InceptionResnetV1 (512-d embeddings)
# ----------------------------------------------------------------------


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(32, (1, 1), name="branch0")(x)
        b1 = ConvBN(32, (1, 1), name="branch1_0")(x)
        b1 = ConvBN(32, (3, 3), padding=1, name="branch1_1")(b1)
        b2 = ConvBN(32, (1, 1), name="branch2_0")(x)
        b2 = ConvBN(32, (3, 3), padding=1, name="branch2_1")(b2)
        b2 = ConvBN(32, (3, 3), padding=1, name="branch2_2")(b2)
        up = nn.Conv(256, (1, 1), name="conv2d")(
            jnp.concatenate([b0, b1, b2], -1))
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(128, (1, 1), name="branch0")(x)
        b1 = ConvBN(128, (1, 1), name="branch1_0")(x)
        b1 = ConvBN(128, (1, 7), padding=(0, 3), name="branch1_1")(b1)
        b1 = ConvBN(128, (7, 1), padding=(3, 0), name="branch1_2")(b1)
        up = nn.Conv(896, (1, 1), name="conv2d")(
            jnp.concatenate([b0, b1], -1))
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, (1, 1), name="branch0")(x)
        b1 = ConvBN(192, (1, 1), name="branch1_0")(x)
        b1 = ConvBN(192, (1, 3), padding=(0, 1), name="branch1_1")(b1)
        b1 = ConvBN(192, (3, 1), padding=(1, 0), name="branch1_2")(b1)
        up = nn.Conv(1792, (1, 1), name="conv2d")(
            jnp.concatenate([b0, b1], -1))
        x = x + self.scale * up
        return x if self.no_relu else nn.relu(x)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (3, 3), strides=2, name="branch0")(x)
        b1 = ConvBN(192, (1, 1), name="branch1_0")(x)
        b1 = ConvBN(192, (3, 3), padding=1, name="branch1_1")(b1)
        b1 = ConvBN(256, (3, 3), strides=2, name="branch1_2")(b1)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], -1)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(256, (1, 1), name="branch0_0")(x)
        b0 = ConvBN(384, (3, 3), strides=2, name="branch0_1")(b0)
        b1 = ConvBN(256, (1, 1), name="branch1_0")(x)
        b1 = ConvBN(256, (3, 3), strides=2, name="branch1_1")(b1)
        b2 = ConvBN(256, (1, 1), name="branch2_0")(x)
        b2 = ConvBN(256, (3, 3), padding=1, name="branch2_1")(b2)
        b2 = ConvBN(256, (3, 3), strides=2, name="branch2_2")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], -1)


class InceptionResnetV1(nn.Module):
    """512-d l2-normalized face embeddings (vggface2 head)."""

    @nn.compact
    def __call__(self, x):
        """x: [B, 160, 160, 3] float in [-1, 1] -> [B, 512]."""
        x = ConvBN(32, (3, 3), strides=2, name="conv2d_1a")(x)
        x = ConvBN(32, (3, 3), name="conv2d_2a")(x)
        x = ConvBN(64, (3, 3), padding=1, name="conv2d_2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), name="conv2d_3b")(x)
        x = ConvBN(192, (3, 3), name="conv2d_4a")(x)
        x = ConvBN(256, (3, 3), strides=2, name="conv2d_4b")(x)
        for i in range(5):
            x = Block35(name=f"repeat_1_{i}")(x)
        x = Mixed6a(name="mixed_6a")(x)
        for i in range(10):
            x = Block17(name=f"repeat_2_{i}")(x)
        x = Mixed7a(name="mixed_7a")(x)
        for i in range(5):
            x = Block8(name=f"repeat_3_{i}")(x)
        x = Block8(no_relu=True, name="block8")(x)
        x = jnp.mean(x, axis=(1, 2))            # adaptive avg pool
        x = nn.Dense(512, use_bias=False, name="last_linear")(x)
        x = FrozenBatchNorm(512, eps=1e-3, name="last_bn")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


# ----------------------------------------------------------------------
# MTCNN cascade
# ----------------------------------------------------------------------


def _ceil_max_pool(x, window: int, stride: int):
    """torch MaxPool2d(ceil_mode=True): pad only at the END so the
    output is ceil((n - k)/s) + 1 (flax "SAME" pads evenly and gives
    ceil(n/s), a DIFFERENT geometry for k=3,s=2)."""
    pads = []
    for d in (1, 2):
        n = x.shape[d]
        out = -(-(n - window) // stride) + 1
        pads.append((0, max((out - 1) * stride + window - n, 0)))
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=pads)


class PNet(nn.Module):
    # All convs VALID like the torch reference (facenet-pytorch
    # mtcnn.py uses default padding=0): a 12x12 window must produce a
    # 1x1 map so detect()'s stride-2/cell-12 corner mapping holds,
    # and the dense layers below see the reference feature counts.
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = _prelu(self, x, "prelu1")
        x = _ceil_max_pool(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = _prelu(self, x, "prelu2")
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = _prelu(self, x, "prelu3")
        probs = nn.softmax(nn.Conv(2, (1, 1), name="conv4_1")(x))
        reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
        return probs, reg


class RNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = _prelu(self, x, "prelu1")
        x = _ceil_max_pool(x, 3, 2)
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = _prelu(self, x, "prelu2")
        x = _ceil_max_pool(x, 3, 2)
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = _prelu(self, x, "prelu3")
        x = x.reshape(x.shape[0], -1)       # 24px input -> 3*3*64=576
        x = nn.Dense(128, name="dense4")(x)
        x = _prelu(self, x, "prelu4")
        probs = nn.softmax(nn.Dense(2, name="dense5_1")(x))
        reg = nn.Dense(4, name="dense5_2")(x)
        return probs, reg


class ONet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = _prelu(self, x, "prelu1")
        x = _ceil_max_pool(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = _prelu(self, x, "prelu2")
        x = _ceil_max_pool(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = _prelu(self, x, "prelu3")
        x = _ceil_max_pool(x, 2, 2)
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = _prelu(self, x, "prelu4")
        x = x.reshape(x.shape[0], -1)     # 48px input -> 3*3*128=1152
        x = nn.Dense(256, name="dense5")(x)
        x = _prelu(self, x, "prelu5")
        probs = nn.softmax(nn.Dense(2, name="dense6_1")(x))
        reg = nn.Dense(4, name="dense6_2")(x)
        landmarks = nn.Dense(10, name="dense6_3")(x)
        return probs, reg, landmarks


def _prelu(mdl, x, name):
    a = mdl.param(name, nn.initializers.constant(0.25),
                  (x.shape[-1],))
    return jnp.where(x >= 0, x, a * x)


def nms(boxes: np.ndarray, scores: np.ndarray,
        threshold: float = 0.5, method: str = "union") -> List[int]:
    """Greedy NMS (parity: facenet detect_face / yolov3 utils NMS)."""
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = scores.argsort()[::-1]
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(xx2 - xx1, 0)
                 * np.maximum(yy2 - yy1, 0))
        if method == "min":
            o = inter / np.minimum(area[i], area[order[1:]])
        else:
            o = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][o <= threshold]
    return keep


class MTCNN:
    """Host-orchestrated 3-stage cascade over jitted Flax nets.

    Simplified relative to the reference pipeline: ONet's landmark
    head is computed but NOT used for alignment — extract_faces does
    an axis-aligned crop (the reference embedder also consumes plain
    crops). detect(image uint8 HWC) -> (boxes [N,4], probs [N]).

    Note: each distinct input image size triggers fresh PNet
    compilations per pyramid scale (and RNet/ONet per distinct crop
    count). For serving with arbitrary client sizes, letterbox to a
    canonical size first.
    """

    def __init__(self, pnet_vars=None, rnet_vars=None, onet_vars=None,
                 thresholds=(0.6, 0.7, 0.7), min_face: int = 20,
                 factor: float = 0.709, rng: Optional[Any] = None):
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        self.pvars = pnet_vars or self.pnet.init(
            r1, jnp.zeros((1, 12, 12, 3)))
        self.rvars = rnet_vars or self.rnet.init(
            r2, jnp.zeros((1, 24, 24, 3)))
        self.ovars = onet_vars or self.onet.init(
            r3, jnp.zeros((1, 48, 48, 3)))
        self.thresholds = thresholds
        self.min_face = min_face
        self.factor = factor
        self._pnet_j = jax.jit(self.pnet.apply)
        self._rnet_j = jax.jit(self.rnet.apply)
        self._onet_j = jax.jit(self.onet.apply)

    @staticmethod
    def _norm(img: np.ndarray) -> np.ndarray:
        return (img.astype(np.float32) - 127.5) / 128.0

    def _resize(self, img: np.ndarray, h: int, w: int) -> np.ndarray:
        import cv2
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)

    def detect(self, image: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
        H, W = image.shape[:2]
        scale0 = 12.0 / self.min_face
        scales = []
        m = min(H, W) * scale0
        s = scale0
        while m >= 12:
            scales.append(s)
            s *= self.factor
            m *= self.factor
        boxes_all = []
        for s in scales:
            h, w = int(H * s), int(W * s)
            if h < 12 or w < 12:
                continue
            inp = self._norm(self._resize(image, h, w))[None]
            probs, reg = self._pnet_j(self.pvars, jnp.asarray(inp))
            probs = np.asarray(probs)[0, :, :, 1]
            reg = np.asarray(reg)[0]
            ys, xs = np.where(probs > self.thresholds[0])
            if len(ys) == 0:
                continue
            stride, cell = 2, 12
            bb = np.stack([
                (xs * stride) / s, (ys * stride) / s,
                (xs * stride + cell) / s, (ys * stride + cell) / s,
            ], axis=1)
            r = reg[ys, xs]
            wbox = bb[:, 2] - bb[:, 0]
            hbox = bb[:, 3] - bb[:, 1]
            bb = bb + np.stack([r[:, 0] * wbox, r[:, 1] * hbox,
                                r[:, 2] * wbox, r[:, 3] * hbox], 1)
            scores = probs[ys, xs]
            keep = nms(bb, scores, 0.5)
            boxes_all.append(
                np.concatenate([bb[keep], scores[keep, None]], 1))
        if not boxes_all:
            return np.zeros((0, 4)), np.zeros((0,))
        boxes = np.concatenate(boxes_all)
        keep = nms(boxes[:, :4], boxes[:, 4], 0.7)
        boxes = boxes[keep]

        for stage, (net, vars_, size, thr) in enumerate([
                (self._rnet_j, self.rvars, 24, self.thresholds[1]),
                (self._onet_j, self.ovars, 48, self.thresholds[2])]):
            crops = []
            for b in boxes:
                x1, y1, x2, y2 = [int(max(v, 0)) for v in b[:4]]
                # Clamp the TOP-LEFT corner too: a box regressed fully
                # past the right/bottom edge would otherwise give a
                # zero-width crop and crash cv2.resize.
                x1, y1 = min(x1, W - 1), min(y1, H - 1)
                x2 = min(max(x2, x1 + 1), W)
                y2 = min(max(y2, y1 + 1), H)
                crop = image[y1:y2, x1:x2]
                crops.append(self._norm(
                    self._resize(crop, size, size)))
            if not crops:
                return np.zeros((0, 4)), np.zeros((0,))
            out = net(vars_, jnp.asarray(np.stack(crops)))
            probs = np.asarray(out[0])[:, 1]
            reg = np.asarray(out[1])
            mask = probs > thr
            boxes = boxes[mask]
            if boxes.shape[0] == 0:
                return np.zeros((0, 4)), np.zeros((0,))
            reg = reg[mask]
            wb = boxes[:, 2] - boxes[:, 0]
            hb = boxes[:, 3] - boxes[:, 1]
            boxes[:, 0] += reg[:, 0] * wb
            boxes[:, 1] += reg[:, 1] * hb
            boxes[:, 2] += reg[:, 2] * wb
            boxes[:, 3] += reg[:, 3] * hb
            boxes[:, 4] = probs[mask]
            keep = nms(boxes[:, :4], boxes[:, 4], 0.7,
                       "min" if stage == 1 else "union")
            boxes = boxes[keep]
        return boxes[:, :4], boxes[:, 4]

    def extract_faces(self, image: np.ndarray, boxes: np.ndarray,
                      size: int = 160) -> np.ndarray:
        """Crop + resize faces for the embedder. [N, size, size, 3]."""
        H, W = image.shape[:2]
        out = []
        for b in boxes:
            x1, y1, x2, y2 = [int(v) for v in b]
            x1 = min(max(x1, 0), W - 1)
            y1 = min(max(y1, 0), H - 1)
            x2 = min(max(x2, x1 + 1), W)
            y2 = min(max(y2, y1 + 1), H)
            out.append(self._norm(
                self._resize(image[y1:y2, x1:x2], size, size)))
        if not out:
            return np.zeros((0, size, size, 3), np.float32)
        return np.stack(out)


def port_facenet_pt(state_dict: Dict[str, Any]) -> Dict:
    """facenet-pytorch InceptionResnetV1 state dict -> flax params.

    Mapping: torch `conv2d_1a.conv.weight` (OIHW) -> conv kernels
    (HWIO); `*.bn.{weight,bias,running_mean,running_var}` -> frozen BN.
    Block repeats `repeat_1.{i}` -> `repeat_1_{i}` etc.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        out = {"conv": {"kernel": np.transpose(
            sd[f"{prefix}.conv.weight"], (2, 3, 1, 0))},
            "bn": {"scale": sd[f"{prefix}.bn.weight"],
                   "bias": sd[f"{prefix}.bn.bias"],
                   "mean": sd[f"{prefix}.bn.running_mean"],
                   "var": sd[f"{prefix}.bn.running_var"]}}
        return out

    p: Dict[str, Any] = {}
    for name in ["conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_4b"]:
        p[name] = conv(name)

    def block(prefix, branches, flax_name):
        entry: Dict[str, Any] = {}
        for torch_b, flax_b in branches:
            entry[flax_b] = conv(f"{prefix}.{torch_b}")
        entry["conv2d"] = {
            "kernel": np.transpose(sd[f"{prefix}.conv2d.weight"],
                                   (2, 3, 1, 0)),
            "bias": sd[f"{prefix}.conv2d.bias"]}
        p[flax_name] = entry

    b35 = [("branch0", "branch0"), ("branch1.0", "branch1_0"),
           ("branch1.1", "branch1_1"), ("branch2.0", "branch2_0"),
           ("branch2.1", "branch2_1"), ("branch2.2", "branch2_2")]
    for i in range(5):
        block(f"repeat_1.{i}", b35, f"repeat_1_{i}")
    b17 = [("branch0", "branch0"), ("branch1.0", "branch1_0"),
           ("branch1.1", "branch1_1"), ("branch1.2", "branch1_2")]
    for i in range(10):
        block(f"repeat_2.{i}", b17, f"repeat_2_{i}")
    b8 = [("branch0", "branch0"), ("branch1.0", "branch1_0"),
          ("branch1.1", "branch1_1"), ("branch1.2", "branch1_2")]
    for i in range(5):
        block(f"repeat_3.{i}", b8, f"repeat_3_{i}")
    block("block8", b8, "block8")

    p["mixed_6a"] = {
        "branch0": conv("mixed_6a.branch0"),
        "branch1_0": conv("mixed_6a.branch1.0"),
        "branch1_1": conv("mixed_6a.branch1.1"),
        "branch1_2": conv("mixed_6a.branch1.2")}
    p["mixed_7a"] = {
        "branch0_0": conv("mixed_7a.branch0.0"),
        "branch0_1": conv("mixed_7a.branch0.1"),
        "branch1_0": conv("mixed_7a.branch1.0"),
        "branch1_1": conv("mixed_7a.branch1.1"),
        "branch2_0": conv("mixed_7a.branch2.0"),
        "branch2_1": conv("mixed_7a.branch2.1"),
        "branch2_2": conv("mixed_7a.branch2.2")}
    p["last_linear"] = {
        "kernel": np.asarray(sd["last_linear.weight"]).T}
    p["last_bn"] = {"scale": sd["last_bn.weight"],
                    "bias": sd["last_bn.bias"],
                    "mean": sd["last_bn.running_mean"],
                    "var": sd["last_bn.running_var"]}
    return {"params": jax.tree.map(jnp.asarray, p)}
