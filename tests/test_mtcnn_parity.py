"""Golden parity of the JAX MTCNN vs facenet-pytorch's algorithm.

facenet-pytorch is not installed in this environment, so the oracle below is
a faithful torch/numpy/PIL re-implementation of its detect flow
(facenet_pytorch/models/utils/detect_face.py: detect_face, generateBoundingBox,
nms 'Union'/'Min', bbreg with the +1 width convention, rerec, pad's
trunc+clamp crop, imresample = F.interpolate(mode='area')) and of
extract_face's PIL path (int-clipped crop + Image.BILINEAR resize, margin 0,
post_process=False) — the exact path the reference exercises
(deepfake_detection.py:24-28,376-383: PIL image in, select_largest=False).

Both sides run the same synthesized weights; the JAX side converts them with
convert_facenet_state_dict, so the converter is under test too.

Tolerances: boxes/scores 1e-3 (pure float paths); the aligned crop 1.0 grey
level (PIL's uint8 resize quantizes coefficients + output to 8 bits, the one
documented deviation — models/mtcnn.py docstring).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from real_time_video_deepfake_detection_tpu.models import mtcnn as M

pytestmark = pytest.mark.slow

MINSIZE = 20
FACTOR = 0.709
IMAGE_SIZE = 160


# ------------------------------------------------------------ weights

def make_torch_state_dicts(seed=0):
    g = np.random.default_rng(seed)

    def t(*shape, scale=0.1):
        return torch.from_numpy((g.standard_normal(shape) * scale).astype(np.float32))

    def conv(cin, cout, k, wscale=0.1):
        return {"weight": t(cout, cin, k, k, scale=wscale),
                "bias": t(cout, scale=0.05)}

    def dense(cin, cout, wscale=0.05):
        return {"weight": t(cout, cin, scale=wscale),
                "bias": t(cout, scale=0.05)}

    def prelu(c):
        return {"weight": torch.full((c,), 0.25)}

    def flat(prefix, d):
        return {f"{prefix}.{k}": v for k, v in d.items()}

    pnet = {}
    pnet.update(flat("conv1", conv(3, 10, 3)))
    pnet.update(flat("prelu1", prelu(10)))
    pnet.update(flat("conv2", conv(10, 16, 3)))
    pnet.update(flat("prelu2", prelu(16)))
    pnet.update(flat("conv3", conv(16, 32, 3)))
    pnet.update(flat("prelu3", prelu(32)))
    pnet.update(flat("conv4_1", conv(32, 2, 1)))
    pnet.update(flat("conv4_2", conv(32, 4, 1, wscale=0.02)))

    rnet = {}
    rnet.update(flat("conv1", conv(3, 28, 3)))
    rnet.update(flat("prelu1", prelu(28)))
    rnet.update(flat("conv2", conv(28, 48, 3)))
    rnet.update(flat("prelu2", prelu(48)))
    rnet.update(flat("conv3", conv(48, 64, 2)))
    rnet.update(flat("prelu3", prelu(64)))
    rnet.update(flat("dense4", dense(576, 128)))
    rnet.update(flat("prelu4", prelu(128)))
    rnet.update(flat("dense5_1", dense(128, 2)))
    rnet.update(flat("dense5_2", dense(128, 4, wscale=0.01)))

    onet = {}
    onet.update(flat("conv1", conv(3, 32, 3)))
    onet.update(flat("prelu1", prelu(32)))
    onet.update(flat("conv2", conv(32, 64, 3)))
    onet.update(flat("prelu2", prelu(64)))
    onet.update(flat("conv3", conv(64, 64, 3)))
    onet.update(flat("prelu3", prelu(64)))
    onet.update(flat("conv4", conv(64, 128, 2)))
    onet.update(flat("prelu4", prelu(128)))
    onet.update(flat("dense5", dense(1152, 256)))
    onet.update(flat("prelu5", prelu(256)))
    onet.update(flat("dense6_1", dense(256, 2)))
    onet.update(flat("dense6_2", dense(256, 4, wscale=0.01)))
    onet.update(flat("dense6_3", dense(256, 10, wscale=0.01)))

    # Random weights give probs ~0.5 everywhere, so every grid cell becomes
    # a candidate (real MTCNN weights are sparse detectors). Sharpen the
    # P-Net classifier and bias it against "face" so the probability field
    # is peaked and the fixed-K capacities in the JAX implementation hold.
    pnet["conv4_1.weight"] = pnet["conv4_1.weight"] * 12.0
    pnet["conv4_1.bias"] = torch.tensor([0.6, -0.6])
    return {"pnet": pnet, "rnet": rnet, "onet": onet}


# --------------------------------------------------- torch net forwards

def _c(sd, n, x, stride=1):
    return F.conv2d(x, sd[f"{n}.weight"], sd[f"{n}.bias"], stride=stride)


def _pr(sd, n, x):
    return F.prelu(x, sd[f"{n}.weight"])


def pnet_t(sd, x):
    x = _pr(sd, "prelu1", _c(sd, "conv1", x))
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = _pr(sd, "prelu2", _c(sd, "conv2", x))
    x = _pr(sd, "prelu3", _c(sd, "conv3", x))
    a = torch.softmax(_c(sd, "conv4_1", x), dim=1)
    b = _c(sd, "conv4_2", x)
    return b, a                      # reg, probs


def rnet_t(sd, x):
    x = _pr(sd, "prelu1", _c(sd, "conv1", x))
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _pr(sd, "prelu2", _c(sd, "conv2", x))
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _pr(sd, "prelu3", _c(sd, "conv3", x))
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = F.prelu(F.linear(x, sd["dense4.weight"], sd["dense4.bias"]),
                sd["prelu4.weight"])
    a = torch.softmax(F.linear(x, sd["dense5_1.weight"], sd["dense5_1.bias"]), dim=1)
    b = F.linear(x, sd["dense5_2.weight"], sd["dense5_2.bias"])
    return b, a                      # reg, probs


def onet_t(sd, x):
    x = _pr(sd, "prelu1", _c(sd, "conv1", x))
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _pr(sd, "prelu2", _c(sd, "conv2", x))
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _pr(sd, "prelu3", _c(sd, "conv3", x))
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = _pr(sd, "prelu4", _c(sd, "conv4", x))
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = F.prelu(F.linear(x, sd["dense5.weight"], sd["dense5.bias"]),
                sd["prelu5.weight"])
    a = torch.softmax(F.linear(x, sd["dense6_1.weight"], sd["dense6_1.bias"]), dim=1)
    b = F.linear(x, sd["dense6_2.weight"], sd["dense6_2.bias"])
    c = F.linear(x, sd["dense6_3.weight"], sd["dense6_3.bias"])
    return b, c, a                   # reg, points, probs


# ------------------------------------------------------- oracle detect

def nms_np(boxes, scores, thresh, method="union"):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        if method == "min":
            o = inter / np.minimum(area[i], area[rest])
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = rest[o <= thresh]
    return np.array(keep, np.int64)


def imresample(img, sz):
    return F.interpolate(img, size=sz, mode="area")


def bbreg_np(boxes, reg):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + reg[:, 0] * w
    out[:, 1] = boxes[:, 1] + reg[:, 1] * h
    out[:, 2] = boxes[:, 2] + reg[:, 2] * w
    out[:, 3] = boxes[:, 3] + reg[:, 3] * h
    return out


def rerec_np(boxes):
    h = boxes[:, 3] - boxes[:, 1]
    w = boxes[:, 2] - boxes[:, 0]
    l = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + w * 0.5 - l * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - l * 0.5
    out[:, 2] = out[:, 0] + l
    out[:, 3] = out[:, 1] + l
    return out


def pad_np(boxes, w, h):
    b = np.trunc(boxes[:, :4]).astype(np.int64)
    x, y, ex, ey = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    x = np.maximum(x, 1)
    y = np.maximum(y, 1)
    ex = np.minimum(ex, w)
    ey = np.minimum(ey, h)
    return y, ey, x, ex


def oracle_detect(img_rgb_u8, sds, thresholds, minsize=MINSIZE,
                  factor=FACTOR, diag=None):
    """facenet-pytorch detect_face for one image; returns (boxes(N,5)) with
    the surviving boxes in score-descending order."""
    imgs = torch.from_numpy(np.float32(img_rgb_u8)).unsqueeze(0).permute(0, 3, 1, 2)
    h, w = imgs.shape[2], imgs.shape[3]
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales = []
    scale_i = m
    while minl >= 12:
        scales.append(scale_i)
        scale_i *= factor
        minl *= factor

    # stage 1
    all_boxes = []
    for scale in scales:
        im_data = imresample(imgs, (int(h * scale + 1), int(w * scale + 1)))
        im_data = (im_data - 127.5) * 0.0078125
        reg, probs = pnet_t(sds["pnet"], im_data)
        probs = probs[:, 1]                       # (1, gh, gw)
        if diag is not None:
            diag.setdefault("pnet_scores", []).append(
                probs[0].detach().numpy().ravel())
        mask = probs[0] >= thresholds[0]
        inds = mask.nonzero().numpy()             # (n, 2) [y, x]
        if inds.size == 0:
            continue
        score = probs[0][mask].detach().numpy()
        rr = reg[0].permute(1, 2, 0)[mask].detach().numpy()   # (n,4)
        bb = inds[:, ::-1].astype(np.float32)     # (x, y)
        q1 = np.floor((2.0 * bb + 1.0) / scale)
        q2 = np.floor((2.0 * bb + 12.0) / scale)
        boxes = np.concatenate([q1, q2, score[:, None], rr], axis=1)
        pick = nms_np(boxes[:, :4], boxes[:, 4], 0.5)
        all_boxes.append(boxes[pick])
    if not all_boxes:
        return np.zeros((0, 5), np.float32)
    boxes = np.concatenate(all_boxes)
    pick = nms_np(boxes[:, :4], boxes[:, 4], 0.7)
    boxes = boxes[pick]
    regw = boxes[:, 2] - boxes[:, 0]
    regh = boxes[:, 3] - boxes[:, 1]
    boxes = np.stack([boxes[:, 0] + boxes[:, 5] * regw,
                      boxes[:, 1] + boxes[:, 6] * regh,
                      boxes[:, 2] + boxes[:, 7] * regw,
                      boxes[:, 3] + boxes[:, 8] * regh,
                      boxes[:, 4]], axis=1)
    boxes = rerec_np(boxes)

    # stage 2
    y, ey, x, ex = pad_np(boxes, w, h)
    patches = []
    ok = []
    for k in range(len(boxes)):
        if ey[k] > (y[k] - 1) and ex[k] > (x[k] - 1):
            crop = imgs[:, :, (y[k] - 1):ey[k], (x[k] - 1):ex[k]]
            patches.append(imresample(crop, (24, 24)))
            ok.append(k)
    if not patches:
        return np.zeros((0, 5), np.float32)
    boxes = boxes[ok]
    im_data = (torch.cat(patches) - 127.5) * 0.0078125
    reg, probs = rnet_t(sds["rnet"], im_data)
    score = probs[:, 1].detach().numpy()
    reg = reg.detach().numpy()
    if diag is not None:
        diag["rnet_scores"] = score.copy()
    ipass = score > thresholds[1]
    boxes = np.concatenate([boxes[ipass, :4], score[ipass, None]], axis=1)
    mv = reg[ipass]
    pick = nms_np(boxes[:, :4], boxes[:, 4], 0.7)
    boxes, mv = boxes[pick], mv[pick]
    boxes = np.concatenate([bbreg_np(boxes[:, :4], mv), boxes[:, 4:5]], axis=1)
    boxes = np.concatenate([rerec_np(boxes[:, :4]), boxes[:, 4:5]], axis=1)

    # stage 3
    if len(boxes) == 0:
        return boxes
    y, ey, x, ex = pad_np(boxes, w, h)
    patches = []
    ok = []
    for k in range(len(boxes)):
        if ey[k] > (y[k] - 1) and ex[k] > (x[k] - 1):
            crop = imgs[:, :, (y[k] - 1):ey[k], (x[k] - 1):ex[k]]
            patches.append(imresample(crop, (48, 48)))
            ok.append(k)
    if not patches:
        return np.zeros((0, 5), np.float32)
    boxes = boxes[ok]
    im_data = (torch.cat(patches) - 127.5) * 0.0078125
    reg, _pts, probs = onet_t(sds["onet"], im_data)
    score = probs[:, 1].detach().numpy()
    reg = reg.detach().numpy()
    if diag is not None:
        diag["onet_scores"] = score.copy()
    ipass = score > thresholds[2]
    boxes = np.concatenate([boxes[ipass, :4], score[ipass, None]], axis=1)
    mv = reg[ipass]
    boxes = np.concatenate([bbreg_np(boxes[:, :4], mv), boxes[:, 4:5]], axis=1)
    pick = nms_np(boxes[:, :4], boxes[:, 4], 0.7, method="min")
    return boxes[pick]


def oracle_extract_face(img_rgb_u8, box, image_size=IMAGE_SIZE):
    """facenet extract_face, PIL path, margin 0, post_process=False."""
    h, w = img_rgb_u8.shape[:2]
    box = [int(max(box[0], 0)), int(max(box[1], 0)),
           int(min(box[2], w)), int(min(box[3], h))]
    pil = Image.fromarray(img_rgb_u8)
    face = pil.crop(box).copy().resize((image_size, image_size), Image.BILINEAR)
    return np.float32(face)


# -------------------------------------------------------------- fixtures

def make_test_image(h=121, w=97, seed=5):
    """Face-ish synthetic image: smooth background + bright ellipse +
    texture, non-square to exercise exact-size compilation."""
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 90 + 50 * np.sin(xx / 23.0) + 40 * np.cos(yy / 17.0)
    ell = (((xx - w * 0.5) / (w * 0.3)) ** 2
           + ((yy - h * 0.45) / (h * 0.35)) ** 2) < 1.0
    img = np.stack([base + 60 * ell, base + 30 * ell, base + 10 * ell], -1)
    img += g.normal(0, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def jax_aligner(sds, thresholds):
    params = {net: M.convert_facenet_state_dict(
        {k: v.numpy() for k, v in sd.items()}, net)
        for net, sd in sds.items()}
    return M.MTCNNAligner(params, image_size=IMAGE_SIZE, minsize=MINSIZE,
                          thresholds=thresholds, factor=FACTOR)


def _mid(scores, n):
    """Threshold between the n-th and (n+1)-th largest score (so exactly n
    pass), robust to the smooth score fields random weights produce."""
    s = np.sort(np.asarray(scores))[::-1]
    n = min(n, len(s) - 1)
    return float((s[n - 1] + s[n]) / 2)


def calibrate_thresholds(img, sds, n1=24, n2=6, n3=3):
    """Pick per-stage thresholds from the oracle's score distributions so
    candidate counts stay well inside the JAX implementation's fixed-K
    capacities (MAX_P/MAX_R/MAX_O) — the regime real MTCNN weights operate
    in."""
    d = {}
    oracle_detect(img, sds, (-1.0, 2.0, 2.0), diag=d)
    t1 = _mid(np.concatenate(d["pnet_scores"]), n1)
    d = {}
    oracle_detect(img, sds, (t1, -1.0, 2.0), diag=d)
    t2 = _mid(d["rnet_scores"], n2)
    d = {}
    oracle_detect(img, sds, (t1, t2, -1.0), diag=d)
    t3 = _mid(d["onet_scores"], n3)
    return (t1, t2, t3)


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("seed", [0, 3])
def test_detect_box_and_score_parity(seed):
    sds = make_torch_state_dicts(seed)
    img = make_test_image(seed=seed + 10)
    th = calibrate_thresholds(img, sds)
    oracle_boxes = oracle_detect(img, sds, th)
    al = jax_aligner(sds, th)
    face, score, box = al.detect(img[..., ::-1].copy())  # aligner takes BGR

    if len(oracle_boxes) == 0:
        assert face is None
        return
    assert face is not None, "oracle found a face, JAX did not"
    best = oracle_boxes[0]
    np.testing.assert_allclose(box, best[:4], atol=1e-3)
    assert score == pytest.approx(float(best[4]), abs=1e-4)


def test_aligned_crop_parity_vs_pil():
    sds = make_torch_state_dicts(0)
    img = make_test_image(seed=10)
    th = calibrate_thresholds(img, sds)
    oracle_boxes = oracle_detect(img, sds, th)
    assert len(oracle_boxes) > 0, "test weights produced no detection"
    ref_face = oracle_extract_face(img, oracle_boxes[0][:4])

    al = jax_aligner(sds, th)
    face, _, _ = al.detect(img[..., ::-1].copy())
    assert face is not None
    assert face.shape == (IMAGE_SIZE, IMAGE_SIZE, 3)
    # PIL's uint8 fixed-point resize is the only quantization between the
    # two paths: <=1 grey level per pixel.
    assert np.abs(face - ref_face).max() <= 1.0 + 1e-3


def test_patch_area_resample_matches_torch():
    """_extract_patch_area (dynamic weight matmuls) == facenet pad+crop+
    F.interpolate(mode='area')."""
    import jax.numpy as jnp
    g = np.random.default_rng(2)
    img = g.random((57, 43, 3)).astype(np.float32) * 255
    for box in ([3.7, 5.2, 30.9, 41.0], [-4.0, -2.5, 20.0, 25.5],
                [10.0, 12.0, 60.0, 70.0], [8.2, 9.9, 14.1, 13.7]):
        ours = np.asarray(M._extract_patch_area(
            jnp.asarray(img), jnp.asarray(box, jnp.float32), 24))
        b = np.trunc(np.array(box)).astype(int)
        x, y = max(b[0], 1), max(b[1], 1)
        ex, ey = min(b[2], 43), min(b[3], 57)
        crop = torch.from_numpy(img[y - 1:ey, x - 1:ex]).permute(2, 0, 1)[None]
        ref = F.interpolate(crop, (24, 24), mode="area")[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pil_bilinear_weights_match_pil():
    """_extract_face_pil == PIL Image.BILINEAR on the same int crop (float
    tolerance = PIL's 8-bit coefficient quantization)."""
    import jax.numpy as jnp
    g = np.random.default_rng(4)
    img = g.integers(0, 256, (80, 64, 3), np.uint8)
    for box in ([2.0, 3.0, 50.0, 61.0], [0.0, 0.0, 64.0, 80.0],
                [10.5, 11.5, 30.5, 29.5]):
        ours = np.asarray(M._extract_face_pil(
            jnp.asarray(img.astype(np.float32)),
            jnp.asarray(box, jnp.float32), 160))
        ib = [int(max(box[0], 0)), int(max(box[1], 0)),
              int(min(box[2], 64)), int(min(box[3], 80))]
        ref = np.float32(Image.fromarray(img).crop(ib).resize(
            (160, 160), Image.BILINEAR))
        assert np.abs(ours - ref).max() <= 1.0 + 1e-3


def test_served_request_exercises_jax_mtcnn():
    """VERDICT #6 'done' criterion: a served /analyze request must run the
    JAX MTCNN aligner (injected into the batched engine, as the server CLI's
    --mtcnn-weights flag does) and return the face-path schema."""
    import io
    import cv2
    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine, create_batched_app,
    )

    sds = make_torch_state_dicts(0)
    al = jax_aligner(sds, (0.01, 0.01, 0.01))  # permissive: always aligns
    calls = []
    orig = al.detect

    def counting_detect(crop):
        calls.append(crop.shape)
        return orig(crop)
    al.detect = counting_detect

    engine = MultiStreamEngine(
        DetectorConfig().with_threshold(0.55),
        ServerConfig(max_streams=2, max_batch=2, batch_timeout_ms=2.0,
                     min_request_interval=0.0),
        aligner=al,
        face_detector=lambda frame: [(40, 30, 120, 120)],
    )
    try:
        app = create_batched_app(engine, engine.server_cfg)
        client = app.test_client()
        frame = make_test_image(h=240, w=320, seed=20)[..., ::-1].copy()
        ok, enc = cv2.imencode(".jpg", frame)
        r = client.post("/analyze",
                        data={"frame": (io.BytesIO(enc.tobytes()), "f.jpg")})
        assert r.status_code == 200
        body = r.get_json()
        assert calls, "JAX MTCNN aligner was not invoked by the served request"
        assert body["analysis_mode"] == "face+frame"
        assert "face_probability" in body and "face_bbox" in body
        assert 0.0 <= body["face_probability"] <= 1.0
    finally:
        engine.shutdown()


def test_area_resize_static_matches_torch():
    import jax.numpy as jnp
    g = np.random.default_rng(7)
    img = g.random((73, 59, 3)).astype(np.float32)
    for sh, sw in ((44, 36), (12, 12), (73, 59)):
        ours = np.asarray(M._area_resize_static(jnp.asarray(img), sh, sw))
        ref = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None],
                            (sh, sw), mode="area")[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)
