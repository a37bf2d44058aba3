"""Test config: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding tests work without TPU hardware (the JAX analogue of
"multi-node without a cluster" — SURVEY.md §4)."""

import os

# The environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and a plugin
# re-asserts it programmatically, so the env var alone is not enough — force
# the CPU backend through jax.config. Every device->host scalar transfer over
# the axon tunnel costs ~30 ms, which would make these tests minutes-slow.
if os.environ.get("RUN_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("RUN_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU jit compiles (B0 forward/train at several shapes, the serving engine).
# Caching them makes re-runs minutes faster. /tmp is per-machine scratch.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass  # older jax without the flags

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.is_dir()
