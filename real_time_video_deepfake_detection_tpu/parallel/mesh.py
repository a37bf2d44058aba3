"""Device mesh + sharding helpers.

The reference is single-device (deepfake_detection.py:21, no torch.distributed
anywhere — SURVEY.md §2.3). The TPU-native design scales through
jax.sharding: a ("data",) mesh for DP serving/training of the 5M-param B0
(params replicated, batch sharded — XLA inserts the grad all-reduce over
ICI), with model-axis hooks for the larger backbone swaps (B4/ViT).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # default 2D: data x model, model=1 unless n divisible by 2+
        shape = (n, 1)
    return Mesh(np.array(devs[:n]).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_params_replicated(params, mesh: Mesh):
    """B0-size params are replicated (5M params ≈ 20 MB fp32 — trivially fits
    every chip; TP would only add latency at this scale. The B4/ViT swap can
    override with a param PartitionSpec tree here)."""
    s = replicated(mesh)
    return jax.device_put(params, s)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    s = batch_sharded(mesh, axis)
    return jax.device_put(batch, s)
