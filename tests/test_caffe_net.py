"""Caffe->JAX compiler goldens.

NOTE: cv2 5.0 REMOVED Caffe support (cv2.dnn.readNetFromCaffe no longer
exists), so the reference's DNN face-detector path cannot run at all on
modern OpenCV — this compiler is the replacement. Validation strategy:
  - caffemodel wire-format parser round-trip (our own protobuf writer)
  - conv/pool(ceil-mode) stage parity vs torch (independent implementation)
  - PriorBox invariants + DetectionOutput NMS vs an independent numpy
    greedy-NMS oracle"""

import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from real_time_video_deepfake_detection_tpu.models.caffe_net import CaffeNet
from real_time_video_deepfake_detection_tpu.utils.caffe_convert import load_caffemodel

rng = np.random.default_rng(21)


# ------------------------- minimal protobuf writer (tests only) -------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(arr: np.ndarray) -> bytes:
    shape_payload = b"".join(_varint(int(d)) for d in arr.shape)
    shape_msg = _len_delim(1, shape_payload)  # packed dims
    data = struct.pack(f"<{arr.size}f", *arr.astype(np.float32).reshape(-1))
    return _len_delim(7, shape_msg) + _len_delim(5, data)


def _layer(name: str, blobs) -> bytes:
    payload = _len_delim(1, name.encode())
    for b in blobs:
        payload += _len_delim(7, _blob(b))
    return _len_delim(100, payload)


PROTOTXT = """
name: "tiny_ssd"
input: "data"
input_dim: 1
input_dim: 3
input_dim: 60
input_dim: 60
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 2 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layer { name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 16 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "relu2" type: "ReLU" bottom: "conv2" top: "conv2" }
layer { name: "loc" type: "Convolution" bottom: "conv2" top: "loc"
  convolution_param { num_output: 16 kernel_size: 3 pad: 1 } }
layer { name: "conf" type: "Convolution" bottom: "conv2" top: "conf"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 } }
layer { name: "loc_perm" type: "Permute" bottom: "loc" top: "loc_perm"
  permute_param { order: 0 order: 2 order: 3 order: 1 } }
layer { name: "loc_flat" type: "Flatten" bottom: "loc_perm" top: "loc_flat" }
layer { name: "conf_perm" type: "Permute" bottom: "conf" top: "conf_perm"
  permute_param { order: 0 order: 2 order: 3 order: 1 } }
layer { name: "conf_flat" type: "Flatten" bottom: "conf_perm" top: "conf_flat" }
layer { name: "priorbox" type: "PriorBox" bottom: "conv2" bottom: "data" top: "priorbox"
  prior_box_param { min_size: 20.0 max_size: 40.0 aspect_ratio: 2.0 flip: true clip: false
    variance: 0.1 variance: 0.1 variance: 0.2 variance: 0.2 offset: 0.5 } }
layer { name: "conf_resh" type: "Reshape" bottom: "conf_flat" top: "conf_resh"
  reshape_param { shape { dim: 0 dim: -1 dim: 2 } } }
layer { name: "conf_soft" type: "Softmax" bottom: "conf_resh" top: "conf_soft"
  softmax_param { axis: 2 } }
layer { name: "conf_out" type: "Flatten" bottom: "conf_soft" top: "conf_out" }
layer { name: "detection_out" type: "DetectionOutput"
  bottom: "loc_flat" bottom: "conf_out" bottom: "priorbox" top: "detection_out"
  detection_output_param { num_classes: 2 share_location: true
    background_label_id: 0 keep_top_k: 50 confidence_threshold: 0.01
    code_type: CENTER_SIZE nms_param { nms_threshold: 0.45 top_k: 100 } } }
"""


@pytest.fixture(scope="module")
def net_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("caffe")
    proto = d / "deploy.prototxt"
    proto.write_text(PROTOTXT)

    def conv_blobs(cout, cin, k):
        w = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.2
        b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
        return [w, b]

    model = b""
    model += _layer("conv1", conv_blobs(8, 3, 3))
    model += _layer("conv2", conv_blobs(16, 8, 3))
    model += _layer("loc", conv_blobs(16, 16, 3))
    model += _layer("conf", conv_blobs(8, 16, 3))
    cm = d / "model.caffemodel"
    cm.write_bytes(model)
    return str(proto), str(cm)


def test_caffemodel_parser(net_files):
    proto, cm = net_files
    w = load_caffemodel(cm)
    assert set(w) == {"conv1", "conv2", "loc", "conf"}
    assert w["conv1"][0].shape == (8, 3, 3, 3)
    assert w["conv1"][1].shape == (8,)


def test_conv_pool_stage_parity_vs_torch(net_files):
    torch = pytest.importorskip("torch")
    proto, cm = net_files
    x = rng.standard_normal((1, 3, 60, 60)).astype(np.float32)

    ours = CaffeNet(proto, cm)
    blobs = ours.forward(x)
    w = load_caffemodel(cm)

    xt = torch.from_numpy(x)
    conv1 = torch.nn.functional.conv2d(
        xt, torch.from_numpy(w["conv1"][0]), torch.from_numpy(w["conv1"][1]),
        stride=2, padding=1).relu()
    pool1 = torch.nn.functional.max_pool2d(conv1, 3, 2, 0, ceil_mode=True)
    conv2 = torch.nn.functional.conv2d(
        pool1, torch.from_numpy(w["conv2"][0]), torch.from_numpy(w["conv2"][1]),
        padding=1).relu()

    for name, ref in [("conv1", conv1), ("pool1", pool1), ("conv2", conv2)]:
        got = np.asarray(blobs[name]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref.numpy(), atol=2e-4, rtol=2e-4,
                                   err_msg=name)


def test_priorbox_invariants(net_files):
    proto, cm = net_files
    x = np.zeros((1, 3, 60, 60), np.float32)
    blobs = CaffeNet(proto, cm).forward(x)
    pb = np.asarray(blobs["priorbox"])   # (1, 2, N*4)
    fh = fw = 15   # conv2 spatial (60 ->/2 conv1 -> 30, ceil-pool3s2 -> 15)
    # priors per cell: min + sqrt(min*max) + ar2 flip pair = 4
    n_priors = pb.shape[2] // 4
    assert n_priors == fh * fw * 4
    boxes = pb[0, 0].reshape(-1, 4)
    var = pb[0, 1].reshape(-1, 4)
    np.testing.assert_allclose(var[0], [0.1, 0.1, 0.2, 0.2])
    # first cell's min-size box: centered at (0.5*step)/img with size 20/60
    np.testing.assert_allclose(boxes[0], [(2 - 10) / 60, (2 - 10) / 60,
                                          (2 + 10) / 60, (2 + 10) / 60],
                               atol=1e-6)
    # widths all positive
    assert ((boxes[:, 2] - boxes[:, 0]) > 0).all()


def test_detection_output_vs_numpy_oracle(net_files):
    proto, cm = net_files
    x = rng.standard_normal((1, 3, 60, 60)).astype(np.float32)
    ours = CaffeNet(proto, cm)
    blobs = ours.forward(x)

    loc = np.asarray(blobs["loc_flat"]).reshape(-1, 4)
    conf = np.asarray(blobs["conf_out"]).reshape(-1, 2)
    pb = np.asarray(blobs["priorbox"])
    priors = pb[0, 0].reshape(-1, 4)
    variances = pb[0, 1].reshape(-1, 4)

    # independent numpy decode + greedy NMS oracle
    pw = priors[:, 2] - priors[:, 0]
    ph = priors[:, 3] - priors[:, 1]
    pcx = (priors[:, 0] + priors[:, 2]) / 2
    pcy = (priors[:, 1] + priors[:, 3]) / 2
    cx = variances[:, 0] * loc[:, 0] * pw + pcx
    cy = variances[:, 1] * loc[:, 1] * ph + pcy
    bw = np.exp(variances[:, 2] * loc[:, 2]) * pw
    bh = np.exp(variances[:, 3] * loc[:, 3]) * ph
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
    scores = conf[:, 1]

    def iou(a, b):
        ix1 = np.maximum(a[0], b[:, 0]); iy1 = np.maximum(a[1], b[:, 1])
        ix2 = np.minimum(a[2], b[:, 2]); iy2 = np.minimum(a[3], b[:, 3])
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        aa = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        ab = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
        u = aa + ab - inter
        return np.where(u > 0, inter / u, 0)

    # stable sort: tie order must match lax.top_k's lowest-index-first
    order = np.argsort(-scores, kind="stable")[:100]   # nms top_k pre-cap
    keep = []
    for i in order:
        if scores[i] < 0.01:
            continue
        if all(iou(boxes[i], boxes[np.array(keep)]).max() <= 0.45 for _ in [0]) \
                if keep else True:
            keep.append(i)
    keep = sorted(keep, key=lambda i: (-scores[i], i))[:50]   # keep_top_k
    oracle = [(round(float(scores[i]), 4), np.round(boxes[i], 4).tolist())
              for i in keep if scores[i] > 0.3]

    det = np.asarray(blobs["detection_out"])[0, 0]
    got = [(round(float(r[2]), 4), np.round(r[3:], 4).tolist())
           for r in det if r[2] > 0.3]
    assert sorted(got) == sorted(oracle)
