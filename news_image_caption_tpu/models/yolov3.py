"""YOLOv3-SPP object detector in Flax + detection utilities.

Capability parity target: /root/reference/ttl/tell/yolov3/
(models.py:10-526 Darknet cfg-built network with SPP and 3 YOLO
heads; utils/utils.py non_max_suppression:528; utils/datasets.py
letterbox:653). The serving worker uses it to attach object-region
features (tasks/captioner.py).

TPU-first: the cfg parser/module-builder is replaced by the fixed
YOLOv3-SPP architecture in Flax (the reference only ever loads
yolov3-spp.cfg); anchor decoding is vectorized; NMS/letterbox are
host-side numpy. The model returns (per-scale heads, SPP neck map) —
the 1024-channel neck is what the object-feature extractor pools for
object embeddings.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from news_image_caption_tpu.models.resnet import FrozenBatchNorm

# yolov3-spp anchors (cfg order): 3 per scale, small -> large stride.
ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),        # stride 8
    ((30, 61), (62, 45), (59, 119)),       # stride 16
    ((116, 90), (156, 198), (373, 326)),   # stride 32
)
STRIDES = (8, 16, 32)
NUM_CLASSES = 80


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.strides, padding=pad, use_bias=False,
                    name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=1e-5, name="bn")(x)
        return nn.leaky_relu(x, 0.1)


class Residual(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = ConvBNLeaky(self.features // 2, 1, name="conv1")(x)
        y = ConvBNLeaky(self.features, 3, name="conv2")(y)
        return x + y


class Darknet53(nn.Module):
    """Backbone returning the 3 feature maps (256, 512, 1024 ch)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBNLeaky(32, 3, name="stem")(x)
        x = ConvBNLeaky(64, 3, 2, name="down1")(x)
        x = Residual(64, name="res1_0")(x)
        x = ConvBNLeaky(128, 3, 2, name="down2")(x)
        for i in range(2):
            x = Residual(128, name=f"res2_{i}")(x)
        x = ConvBNLeaky(256, 3, 2, name="down3")(x)
        for i in range(8):
            x = Residual(256, name=f"res3_{i}")(x)
        c3 = x
        x = ConvBNLeaky(512, 3, 2, name="down4")(x)
        for i in range(8):
            x = Residual(512, name=f"res4_{i}")(x)
        c4 = x
        x = ConvBNLeaky(1024, 3, 2, name="down5")(x)
        for i in range(4):
            x = Residual(1024, name=f"res5_{i}")(x)
        return c3, c4, x


class SPP(nn.Module):
    """Spatial pyramid pooling: concat maxpools k=5,9,13."""

    @nn.compact
    def __call__(self, x):
        pools = [x]
        for k in (5, 9, 13):
            pools.append(nn.max_pool(
                x, (k, k), strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2))))
        return jnp.concatenate(pools, axis=-1)


class YoloV3SPP(nn.Module):
    """Full detector: backbone + SPP neck + 3 heads."""

    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x):
        """x [B, S, S, 3] (S % 32 == 0) -> (raw head outputs, neck)."""
        no = 3 * (5 + self.num_classes)
        c3, c4, c5 = Darknet53(name="backbone")(x)
        # head 5 (stride 32) with SPP
        y = ConvBNLeaky(512, 1, name="h5_0")(c5)
        y = ConvBNLeaky(1024, 3, name="h5_1")(y)
        y = ConvBNLeaky(512, 1, name="h5_2")(y)
        y = SPP(name="spp")(y)
        y = ConvBNLeaky(512, 1, name="h5_3")(y)
        y = ConvBNLeaky(1024, 3, name="h5_4")(y)
        neck = y                         # [B, S/32, S/32, 1024]
        y = ConvBNLeaky(512, 1, name="h5_5")(y)
        p5 = nn.Conv(no, (1, 1), name="det5")(
            ConvBNLeaky(1024, 3, name="h5_6")(y))
        # head 4 (stride 16)
        u = ConvBNLeaky(256, 1, name="up4_conv")(y)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2,
                                 u.shape[2] * 2, u.shape[3]),
                             "nearest")
        z = jnp.concatenate([u, c4], axis=-1)
        z = ConvBNLeaky(256, 1, name="h4_0")(z)
        z = ConvBNLeaky(512, 3, name="h4_1")(z)
        z = ConvBNLeaky(256, 1, name="h4_2")(z)
        z = ConvBNLeaky(512, 3, name="h4_3")(z)
        z = ConvBNLeaky(256, 1, name="h4_4")(z)
        p4 = nn.Conv(no, (1, 1), name="det4")(
            ConvBNLeaky(512, 3, name="h4_5")(z))
        # head 3 (stride 8)
        u = ConvBNLeaky(128, 1, name="up3_conv")(z)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2,
                                 u.shape[2] * 2, u.shape[3]),
                             "nearest")
        w = jnp.concatenate([u, c3], axis=-1)
        w = ConvBNLeaky(128, 1, name="h3_0")(w)
        w = ConvBNLeaky(256, 3, name="h3_1")(w)
        w = ConvBNLeaky(128, 1, name="h3_2")(w)
        w = ConvBNLeaky(256, 3, name="h3_3")(w)
        w = ConvBNLeaky(128, 1, name="h3_4")(w)
        p3 = nn.Conv(no, (1, 1), name="det3")(
            ConvBNLeaky(256, 3, name="h3_5")(w))
        return (p3, p4, p5), neck


def decode_predictions(heads: Sequence[jax.Array],
                       num_classes: int = NUM_CLASSES) -> jax.Array:
    """Raw head maps -> [B, N, 5+C] (xywh in pixels, obj, cls probs).

    Parity: YOLOLayer forward (models.py) — sigmoid xy offsets + grid,
    anchor-scaled wh, sigmoid obj/cls.
    """
    outs = []
    for head, anchors, stride in zip(heads, ANCHORS, STRIDES):
        B, H, W, _ = head.shape
        na = len(anchors)
        p = head.reshape(B, H, W, na, 5 + num_classes)
        gy = jnp.arange(H)[None, :, None, None]
        gx = jnp.arange(W)[None, None, :, None]
        xy = jax.nn.sigmoid(p[..., :2])
        x = (xy[..., 0] + gx) * stride
        y = (xy[..., 1] + gy) * stride
        anc = jnp.asarray(anchors, jnp.float32)  # [na, 2]
        wh = jnp.exp(jnp.clip(p[..., 2:4], -10, 10)) * anc
        obj = jax.nn.sigmoid(p[..., 4])
        cls = jax.nn.sigmoid(p[..., 5:])
        out = jnp.concatenate([
            x[..., None], y[..., None], wh, obj[..., None], cls],
            axis=-1)
        outs.append(out.reshape(B, H * W * na, 5 + num_classes))
    return jnp.concatenate(outs, axis=1)


def letterbox(img: np.ndarray, new_shape: int = 416,
              color: int = 114) -> Tuple[np.ndarray, float,
                                         Tuple[int, int]]:
    """Aspect-preserving resize + pad (parity: datasets.py letterbox).

    Returns (image, scale ratio, (pad_x, pad_y))."""
    import cv2
    h, w = img.shape[:2]
    r = min(new_shape / h, new_shape / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    pad_w, pad_h = new_shape - nw, new_shape - nh
    left, top = pad_w // 2, pad_h // 2
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.full((new_shape, new_shape, img.shape[2]), color,
                  img.dtype)
    out[top:top + nh, left:left + nw] = resized
    return out, r, (left, top)


def scale_coords(boxes: np.ndarray, ratio: float,
                 pad: Tuple[int, int],
                 orig_shape: Optional[Tuple[int, int]] = None
                 ) -> np.ndarray:
    """Map letterboxed xyxy boxes back to original image coords.

    orig_shape (H, W): clip to the image bounds like the reference's
    scale_coords + clip_coords (utils.py:167) — detections touching
    the letterbox padding otherwise map to negative / out-of-range
    coordinates."""
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - pad[0]) / ratio
    out[:, [1, 3]] = (out[:, [1, 3]] - pad[1]) / ratio
    if orig_shape is not None:
        h, w = orig_shape
        out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
        out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
    return out


def non_max_suppression(pred: np.ndarray, conf_thres: float = 0.3,
                        iou_thres: float = 0.5,
                        max_det: int = 100) -> np.ndarray:
    """pred [N, 5+C] (xywh,obj,cls) -> [M, 6] (xyxy, conf, cls).

    Parity: utils/utils.py non_max_suppression:528 (conf = obj*cls,
    per-class NMS via class-offset trick)."""
    from news_image_caption_tpu.models.facenet import nms
    obj = pred[:, 4]
    cls_probs = pred[:, 5:]
    cls_id = cls_probs.argmax(-1)
    conf = obj * cls_probs.max(-1)
    mask = conf > conf_thres
    if not mask.any():
        return np.zeros((0, 6), np.float32)
    p = pred[mask]
    conf = conf[mask]
    cls_id = cls_id[mask]
    xy, wh = p[:, :2], p[:, 2:4]
    # Reference box sanity filter (utils.py:539 min_wh, max_wh =
    # 2, 4096) — also what makes the 4096 class-offset trick sound:
    # a degenerate >4096px box would span multiple class slots and
    # suppress across classes.
    ok = ((wh > 2).all(axis=1)) & ((wh < 4096).all(axis=1))
    if not ok.any():
        return np.zeros((0, 6), np.float32)
    xy, wh = xy[ok], wh[ok]
    conf, cls_id = conf[ok], cls_id[ok]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    # class-offset trick: boxes of different classes never overlap
    offset = cls_id[:, None] * 4096.0
    keep = nms(boxes + offset, conf, iou_thres)
    keep = keep[:max_det]
    return np.concatenate([boxes[keep], conf[keep, None],
                           cls_id[keep, None].astype(np.float32)], 1)


def _conv_order():
    """(path-under-params, has_batchnorm) in darknet cfg file order.

    Mirrors the conv sequence of ultralytics yolov3-spp.cfg — the only
    cfg the reference ever loads (tasks/captioner.py:110). Detection
    convs (linear activation) carry a bias and no BN; every other conv
    is conv+BN+leaky.
    """
    order = [(("backbone", "stem"), True), (("backbone", "down1"), True),
             (("backbone", "res1_0", "conv1"), True),
             (("backbone", "res1_0", "conv2"), True),
             (("backbone", "down2"), True)]
    for i in range(2):
        order += [(("backbone", f"res2_{i}", "conv1"), True),
                  (("backbone", f"res2_{i}", "conv2"), True)]
    order.append((("backbone", "down3"), True))
    for i in range(8):
        order += [(("backbone", f"res3_{i}", "conv1"), True),
                  (("backbone", f"res3_{i}", "conv2"), True)]
    order.append((("backbone", "down4"), True))
    for i in range(8):
        order += [(("backbone", f"res4_{i}", "conv1"), True),
                  (("backbone", f"res4_{i}", "conv2"), True)]
    order.append((("backbone", "down5"), True))
    for i in range(4):
        order += [(("backbone", f"res5_{i}", "conv1"), True),
                  (("backbone", f"res5_{i}", "conv2"), True)]
    # Large-object head (with SPP; pools/routes carry no weights),
    # then detection conv, then the upsample lateral — file order.
    order += [((f"h5_{i}",), True) for i in range(7)]
    order += [(("det5",), False), (("up4_conv",), True)]
    order += [((f"h4_{i}",), True) for i in range(6)]
    order += [(("det4",), False), (("up3_conv",), True)]
    order += [((f"h3_{i}",), True) for i in range(6)]
    order += [(("det3",), False)]
    return order


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def port_darknet_weights(weights, template) -> dict:
    """Load a darknet `.weights` binary into YoloV3SPP variables.

    Format parity: /root/reference/ttl/tell/yolov3/models.py:384-443 —
    header = 3x int32 version + 1x int64 seen; then, per conv in cfg
    order: [bn_bias, bn_scale, bn_mean, bn_var] (or conv bias when the
    conv has no BN), then the conv kernel as [out, in, kh, kw]
    row-major float32.

    `weights`: path or raw bytes. `template`: variables from
    model.init (shapes drive the parse). Raises if the byte count
    does not exactly match the architecture.
    """
    import jax

    if isinstance(weights, (str, os.PathLike)):
        with open(weights, "rb") as f:
            raw = f.read()
    else:
        raw = weights
    header = np.frombuffer(raw[:20], dtype=np.int32)
    version = header[:3]
    del version  # informational only
    data = np.frombuffer(raw[20:], dtype=np.float32)

    from flax.core import unfreeze

    # tree.map builds fresh (mutable) dict containers.
    params = jax.tree.map(np.asarray, unfreeze(template["params"]))
    ptr = 0

    def take(n):
        nonlocal ptr
        if ptr + n > data.size:
            raise ValueError(
                f"darknet weights exhausted: need {ptr + n} floats, "
                f"file has {data.size} — architecture mismatch")
        out = data[ptr:ptr + n]
        ptr += n
        return out

    for path, has_bn in _conv_order():
        mod = _get_path(params, path)
        if has_bn:
            conv, bn = mod["conv"], mod["bn"]
            c = bn["bias"].shape[0]
            bn["bias"] = take(c).copy()
            bn["scale"] = take(c).copy()
            bn["mean"] = take(c).copy()
            bn["var"] = take(c).copy()
        else:
            conv = mod
            conv["bias"] = take(conv["bias"].shape[0]).copy()
        kh, kw, cin, cout = conv["kernel"].shape
        w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        conv["kernel"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0))
    if ptr != data.size:
        raise ValueError(
            f"darknet weights not fully consumed: used {ptr} of "
            f"{data.size} floats — architecture mismatch")
    return {"params": params}


def export_darknet_weights(variables) -> bytes:
    """Inverse of `port_darknet_weights` (round-trip testing + interop)."""
    chunks = [np.asarray([0, 2, 5], np.int32).tobytes(),
              np.asarray([0], np.int64).tobytes()]
    params = variables["params"]
    for path, has_bn in _conv_order():
        mod = _get_path(params, path)
        if has_bn:
            conv, bn = mod["conv"], mod["bn"]
            for key in ("bias", "scale", "mean", "var"):
                chunks.append(np.asarray(bn[key], np.float32).tobytes())
        else:
            conv = mod
            chunks.append(np.asarray(conv["bias"], np.float32).tobytes())
        k = np.asarray(conv["kernel"], np.float32)   # [kh, kw, in, out]
        chunks.append(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)).tobytes())
    return b"".join(chunks)


class ObjectFeatureExtractor:
    """Detect objects + pool per-region neck features (2048-d analog).

    The reference feeds YOLO region features as `obj_embeds`
    (nytimes_faces_ner_matched reader + captioner worker). Here each
    detection pools the SPP neck map over its box -> [n_obj, 1024]
    (pad/NaN handling happens in the instance builder).
    """

    def __init__(self, variables=None, img_size: int = 416,
                 rng=None):
        self.model = YoloV3SPP()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.vars = variables or self.model.init(
            rng, jnp.zeros((1, img_size, img_size, 3)))
        self.img_size = img_size
        self._fwd = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray, conf_thres: float = 0.3
                 ) -> Tuple[np.ndarray, np.ndarray]:
        boxed, ratio, pad = letterbox(image, self.img_size)
        inp = boxed.astype(np.float32)[None] / 255.0
        heads, neck = self._fwd(self.vars, jnp.asarray(inp))
        pred = np.asarray(decode_predictions(heads))[0]
        dets = non_max_suppression(pred, conf_thres)
        neck = np.asarray(neck)[0]              # [S/32, S/32, 1024]
        feats = []
        cell = self.img_size / neck.shape[0]
        for d in dets:
            x1, y1, x2, y2 = d[:4] / cell
            x1, y1 = int(max(x1, 0)), int(max(y1, 0))
            x2 = int(min(max(x2, x1 + 1), neck.shape[1]))
            y2 = int(min(max(y2, y1 + 1), neck.shape[0]))
            feats.append(neck[y1:y2, x1:x2].mean(axis=(0, 1)))
        feats = (np.stack(feats) if feats
                 else np.zeros((0, neck.shape[-1]), np.float32))
        boxes = (scale_coords(dets[:, :4], ratio, pad,
                              orig_shape=image.shape[:2])
                 if len(dets) else np.zeros((0, 4), np.float32))
        return boxes, feats
