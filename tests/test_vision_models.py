"""FaceNet/MTCNN/YOLOv3: shapes, NMS, letterbox, detection flows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.models.facenet import (MTCNN,
                                                   InceptionResnetV1,
                                                   nms)
from news_image_caption_tpu.models.yolov3 import (ObjectFeatureExtractor,
                                                  YoloV3SPP,
                                                  decode_predictions,
                                                  letterbox,
                                                  non_max_suppression,
                                                  scale_coords)


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, threshold=0.5)
    assert keep == [0, 2]


@pytest.mark.slow
def test_inception_resnet_embeds():
    m = InceptionResnetV1()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 160, 160, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    emb = m.apply(params, x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_mtcnn_detect_runs():
    mt = MTCNN(min_face=40)
    img = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), dtype=np.uint8)
    boxes, probs = mt.detect(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    faces = mt.extract_faces(img, boxes[:2])
    if len(boxes):
        assert faces.shape[1:] == (160, 160, 3)


@pytest.mark.slow
def test_yolo_heads_and_decode():
    m = YoloV3SPP(num_classes=80)
    x = jnp.zeros((1, 128, 128, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    heads, neck = m.apply(params, x)
    assert heads[0].shape == (1, 16, 16, 255)
    assert heads[1].shape == (1, 8, 8, 255)
    assert heads[2].shape == (1, 4, 4, 255)
    assert neck.shape == (1, 4, 4, 1024)
    pred = decode_predictions(heads)
    n = (16 * 16 + 8 * 8 + 4 * 4) * 3
    assert pred.shape == (1, n, 85)
    p = np.asarray(pred)[0]
    assert (p[:, 4] >= 0).all() and (p[:, 4] <= 1).all()
    assert (p[:, 2:4] > 0).all()           # positive wh


def test_letterbox_and_scale_coords():
    img = np.zeros((100, 200, 3), np.uint8)
    out, r, pad = letterbox(img, 128)
    assert out.shape == (128, 128, 3)
    assert r == pytest.approx(128 / 200)
    # a box at letterboxed coords maps back into original space
    boxes = np.array([[pad[0], pad[1], pad[0] + 64, pad[1] + 32]],
                     np.float32)
    back = scale_coords(boxes, r, pad)
    np.testing.assert_allclose(back[0], [0, 0, 100, 50], atol=1e-3)


def test_non_max_suppression_output_format():
    pred = np.zeros((4, 85), np.float32)
    pred[:, :4] = [[50, 50, 20, 20], [52, 52, 20, 20],
                   [200, 200, 30, 30], [10, 10, 5, 5]]
    pred[:, 4] = [0.9, 0.8, 0.9, 0.1]       # last below conf
    pred[0, 5] = 0.9
    pred[1, 5] = 0.9                          # same class -> suppressed
    pred[2, 6] = 0.9                          # other class survives
    pred[3, 5] = 0.9
    out = non_max_suppression(pred, conf_thres=0.3, iou_thres=0.5)
    assert out.shape == (2, 6)
    assert set(out[:, 5].astype(int)) == {0, 1}


@pytest.mark.slow
def test_object_feature_extractor():
    ex = ObjectFeatureExtractor(img_size=128)
    img = np.random.default_rng(1).integers(
        0, 255, (96, 160, 3), dtype=np.uint8)
    boxes, feats = ex(img, conf_thres=0.2)
    assert boxes.shape[1] == 4 if len(boxes) else True
    assert feats.shape[1] == 1024 if len(feats) else True


@pytest.mark.slow
def test_darknet_weights_port_roundtrip():
    """Darknet .weights binary parse: exact consumption, layout
    round-trip (models.py:384-443 format)."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.models.yolov3 import (
        YoloV3SPP, export_darknet_weights, port_darknet_weights)

    model = YoloV3SPP()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3))))
    # Fill with distinct values host-side (no XLA compile of the
    # 76-conv graph needed for a layout test).
    rng = np.random.RandomState(0)
    leaves, treedef = jax.tree.flatten(shapes)
    template = jax.tree.unflatten(
        treedef, [rng.randn(*l.shape).astype(np.float32)
                  for l in leaves])
    blob = export_darknet_weights(template)
    # yolov3-spp has 63M params; the binary must match exactly.
    n_floats = (len(blob) - 20) // 4
    n_params = sum(x.size for x in jax.tree.leaves(template))
    assert n_floats == n_params

    ported = port_darknet_weights(blob, template)
    flat_a = jax.tree.leaves(jax.tree.map(np.asarray, template))
    flat_b = jax.tree.leaves(ported)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)

    # Corrupt length -> loud failure, not silent drift.
    import pytest
    with pytest.raises(ValueError, match="mismatch"):
        port_darknet_weights(blob[:-40], template)
    with pytest.raises(ValueError, match="mismatch"):
        port_darknet_weights(blob + b"\x00" * 40, template)


def test_darknet_total_param_count_matches_canonical_cfg():
    """The Flax model must consume exactly the float count of the
    canonical yolov3-spp.cfg conv sequence — computed here
    independently (a missing/misshapen layer would shift the total
    and the porter would mis-slice everything after it)."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.models.yolov3 import YoloV3SPP

    convs = []

    def C(cin, cout, k, bn=True):
        convs.append((cin, cout, k, bn))

    C(3, 32, 3); C(32, 64, 3); C(64, 32, 1); C(32, 64, 3)
    C(64, 128, 3)
    for _ in range(2):
        C(128, 64, 1); C(64, 128, 3)
    C(128, 256, 3)
    for _ in range(8):
        C(256, 128, 1); C(128, 256, 3)
    C(256, 512, 3)
    for _ in range(8):
        C(512, 256, 1); C(256, 512, 3)
    C(512, 1024, 3)
    for _ in range(4):
        C(1024, 512, 1); C(512, 1024, 3)
    C(1024, 512, 1); C(512, 1024, 3); C(1024, 512, 1)     # pre-SPP
    C(2048, 512, 1); C(512, 1024, 3); C(1024, 512, 1)     # post-SPP
    C(512, 1024, 3); C(1024, 255, 1, bn=False)            # det5
    C(512, 256, 1)                                        # lateral 4
    C(768, 256, 1); C(256, 512, 3); C(512, 256, 1)
    C(256, 512, 3); C(512, 256, 1); C(256, 512, 3)
    C(512, 255, 1, bn=False)                              # det4
    C(256, 128, 1)                                        # lateral 3
    C(384, 128, 1); C(128, 256, 3); C(256, 128, 1)
    C(128, 256, 3); C(256, 128, 1); C(128, 256, 3)
    C(256, 255, 1, bn=False)                              # det3
    expected = sum(co * ci * k * k + (4 * co if bn else co)
                   for ci, co, k, bn in convs)

    model = YoloV3SPP()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3))))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(template))
    assert len(convs) == 76
    assert n_params == expected == 63_052_381


@pytest.mark.slow
def test_port_facenet_pt_covers_flax_tree():
    """port_facenet_pt must produce exactly the InceptionResnetV1
    param tree (every leaf, right shapes, transposes inverted)."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.models.facenet import (InceptionResnetV1,
                                                       port_facenet_pt)

    model = InceptionResnetV1()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 160, 160, 3))))["params"]

    # Build a synthetic facenet-pytorch state dict by inverting the
    # porter's documented layout (conv HWIO<->OIHW, linear T).
    sd = {}
    counter = [0.0]

    def fresh(shape):
        counter[0] += 1.0
        return np.full(shape, counter[0], np.float32)

    def add_conv(torch_prefix, flax_entry):
        k = flax_entry["conv"]["kernel"].shape       # HWIO
        sd[f"{torch_prefix}.conv.weight"] = fresh(
            (k[3], k[2], k[0], k[1]))                # OIHW
        c = flax_entry["bn"]["scale"].shape
        for t, f in (("weight", "scale"), ("bias", "bias"),
                     ("running_mean", "mean"), ("running_var", "var")):
            sd[f"{torch_prefix}.bn.{t}"] = fresh(c)

    def walk(flax_name, entry):
        """Map flax module name back to the torch prefix."""
        torch_name = flax_name
        for rep in ("repeat_1", "repeat_2", "repeat_3"):
            if flax_name.startswith(rep + "_"):
                torch_name = rep + "." + flax_name[len(rep) + 1:]
        return torch_name

    for name, entry in shapes.items():
        if name in ("last_linear", "last_bn"):
            continue
        tname = walk(name, entry)
        if "conv" in entry and "bn" in entry:        # plain stem conv
            add_conv(tname, entry)
            continue
        for sub, sube in entry.items():              # block branches
            if sub == "conv2d":
                k = sube["kernel"].shape
                sd[f"{tname}.conv2d.weight"] = fresh(
                    (k[3], k[2], k[0], k[1]))
                sd[f"{tname}.conv2d.bias"] = fresh(sube["bias"].shape)
            else:
                tsub = sub.replace("branch0_", "branch0.").replace(
                    "branch1_", "branch1.").replace(
                    "branch2_", "branch2.")
                add_conv(f"{tname}.{tsub}", sube)
    ll = shapes["last_linear"]["kernel"].shape
    sd["last_linear.weight"] = fresh((ll[1], ll[0]))
    for t, f in (("weight", "scale"), ("bias", "bias"),
                 ("running_mean", "mean"), ("running_var", "var")):
        sd[f"last_bn.{t}"] = fresh(shapes["last_bn"][f].shape)

    ported = port_facenet_pt(sd)["params"]

    flat_t, tree_t = jax.tree.flatten_with_path(shapes)
    flat_p = dict(jax.tree.flatten_with_path(ported)[0])
    assert {str(k) for k, _ in flat_t} == {str(k) for k in flat_p}
    for path, spec in flat_t:
        got = flat_p[path]
        assert tuple(got.shape) == tuple(spec.shape), (path, got.shape,
                                                       spec.shape)
    # Spot-check a transpose inversion: conv kernel values land HWIO.
    w_t = sd["conv2d_1a.conv.weight"]                # OIHW
    w_f = np.asarray(ported["conv2d_1a"]["conv"]["kernel"])
    np.testing.assert_array_equal(w_f, w_t.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(ported["last_linear"]["kernel"]),
        sd["last_linear.weight"].T)
