"""TPU-native real-time video deepfake detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
KrishTanna28/Real-Time-Video-Deepfake-Detection (reference at /root/reference),
designed TPU-first:

- All per-frame compute (forensic signals, face detection, alignment,
  classification, preprocessing) is expressed as batched, jit-able JAX
  functions over fixed-shape arrays so XLA can tile them onto the MXU/VPU.
- Per-stream session state (vote windows, score histories, temporal diffs)
  lives in fixed-size ring-buffer pytrees updated by pure reducers, so 64+
  concurrent streams batch into one TPU step (reference: mutable Python
  deques, single global stream — deepfake_detection.py:93-289).
- The HTTP surface (/analyze /reset /health /stats) is preserved
  bit-for-bit so the reference Chrome extension works unchanged
  (reference: backend_server.py:82-255).

Subpackages:
  core      — config dataclasses, PRNG/dtype discipline
  ops       — image/forensic ops as vectorized jnp (cv2-parity golden-tested)
  kernels   — Pallas TPU kernels for the hot fused ops
  models    — EfficientNet-B0 / SSD-Res10 / MTCNN in functional JAX
  parallel  — mesh/sharding helpers, pjit training step
  state     — per-stream ring-buffer state pytrees + pure reducers
  pipeline  — per-frame detection graph (detect→align→classify→fuse)
  serving   — WSGI HTTP server + dynamic batching frontend
  train     — training stack (focal loss, EMA, onecycle, checkpointing)
  utils     — weight converters (torch/caffe → JAX pytrees), image IO
"""

__version__ = "0.1.0"
