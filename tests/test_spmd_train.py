"""SPMD training tests on the 8-device virtual CPU mesh (conftest.py forces
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8) — the JAX
analogue of "multi-node without a cluster" (SURVEY.md §4).

Covers VERDICT round-1 items #1/#2: the data-parallel train step must be
exercised under pytest, not only by the driver dryrun, and must match the
single-device step at the same global batch (params replicated + batch
sharded changes only the reduction order, so parity is to float tolerance).
"""

from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.core.config import TrainConfig
from real_time_video_deepfake_detection_tpu.models.efficientnet import (
    EfficientNetSpec, init_params,
)
from real_time_video_deepfake_detection_tpu.parallel.mesh import (
    make_mesh, replicated, batch_sharded,
)
from real_time_video_deepfake_detection_tpu.train.steps import (
    init_train_state, make_optimizer, make_sharded_train_step, train_step,
)

pytestmark = [
    pytest.mark.slow,  # heavy B0 train-step compiles on the CPU mesh
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]

N_DEV = 8
BATCH = 2 * N_DEV


def _setup():
    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(batch_size=BATCH)
    params = init_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(cfg, total_steps=10)
    rng = np.random.default_rng(3)
    images = rng.standard_normal((BATCH, 64, 64, 3)).astype(np.float32)
    labels = (rng.random(BATCH) > 0.5).astype(np.float32)
    return spec, cfg, params, tx, images, labels


def test_sharded_step_matches_single_device():
    """Same params, same global batch: DP-sharded and single-device steps
    must produce the same loss/accuracy and the same updated params."""
    spec, cfg, params, tx, images, labels = _setup()

    single = jax.jit(partial(train_step, spec=spec, cfg=cfg, tx=tx))
    s1 = init_train_state(params, cfg, total_steps=10, tx=tx)
    s1, m1 = single(s1, jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh(N_DEV)
    sharded = make_sharded_train_step(mesh, spec, cfg, tx)
    s8 = init_train_state(params, cfg, total_steps=10, tx=tx)
    s8 = jax.device_put(s8, replicated(mesh))
    im8 = jax.device_put(jnp.asarray(images), batch_sharded(mesh))
    lb8 = jax.device_put(jnp.asarray(labels), batch_sharded(mesh))
    s8, m8 = sharded(s8, im8, lb8)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), abs=1e-5)
    assert float(m8["accuracy"]) == pytest.approx(float(m1["accuracy"]))
    # updated params match leaf-by-leaf (reduction-order tolerance)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_sharded_step_multiple_steps_finite():
    """Three consecutive donated sharded steps run and stay finite (exercises
    donation + replicated opt state update across steps)."""
    spec, cfg, params, tx, images, labels = _setup()
    mesh = make_mesh(N_DEV)
    sharded = make_sharded_train_step(mesh, spec, cfg, tx)
    state = jax.device_put(init_train_state(params, cfg, total_steps=10, tx=tx),
                           replicated(mesh))
    im = jax.device_put(jnp.asarray(images), batch_sharded(mesh))
    lb = jax.device_put(jnp.asarray(labels), batch_sharded(mesh))
    for _ in range(3):
        state, metrics = sharded(state, im, lb)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3


@pytest.mark.slow
def test_trainer_cli_dp_matches_single_device(tmp_path):
    """VERDICT #2 'done' criterion: the trainer CLI on the 8-CPU mesh
    produces the same loss curve as single-device at the same global batch
    and seed (same RNG stream -> same augmentation/mixup draws)."""
    import cv2
    from real_time_video_deepfake_detection_tpu.train import trainer

    rng_ = np.random.default_rng(11)
    for split, n in (("train", 16), ("val", 8)):
        for cls in ("real", "fake"):
            d = tmp_path / "data" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                img = rng_.integers(0, 256, (64, 64, 3), np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)

    def run(num_devices, out):
        args = ["--dataset", str(tmp_path / "data"),
                "--epochs", "2", "--batch-size", "16",
                "--image-size", "32", "--seed", "7",
                "--output-dir", str(tmp_path / out),
                "--num-devices", str(num_devices), "--fresh"]
        return trainer.main(args)

    r1 = run(1, "out1")
    r8 = run(8, "out8")
    for e1, e8 in zip(r1["log"], r8["log"]):
        assert e8["train_loss"] == pytest.approx(e1["train_loss"], abs=1e-4)
        assert e8["val_loss"] == pytest.approx(e1["val_loss"], abs=1e-4)


def test_dryrun_multichip_body_runs():
    """The driver's dryrun body must succeed in-process on the virtual mesh
    (the subprocess wrapper is just environment armor around this)."""
    import __graft_entry__ as g
    g._dryrun_multichip_body(8)
