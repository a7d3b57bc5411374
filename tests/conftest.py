"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding logic is tested on virtual CPU devices
(`xla_force_host_platform_device_count`), per the build plan (SURVEY.md §4):
the reference had no distributed tests at all; JAX makes them cheap.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real TPU);
# unit tests must run on the virtual CPU mesh regardless. Some pytest plugins
# import jax before this file's module body runs, so set the config flag too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep test compiles single-threaded-friendly and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# Exported test checkpoints carry no tokenizer assets (none in this image);
# opt in to the deterministic stand-in. Production loads fail loudly instead
# (experiments/robot/openvla_utils.py::_try_tokenizer).
os.environ.setdefault("OPENVLA_ALLOW_FAKE_TOKENIZER", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls at full precision for golden parity tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
