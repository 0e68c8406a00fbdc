"""Test configuration: CPU backend with 8 virtual devices.

This is the TPU-native "fake backend" testing mechanism (SURVEY.md section 4
item 2 — the reference tests multi-CU hardware in the SDSoC emulator without
a board, Makefile:103-108): multi-chip sharding tests run on a simulated
8-device CPU mesh, and Pallas kernels run in interpreter mode.

The environment's sitecustomize (axon TPU tunnel) force-registers the TPU
platform at interpreter start, so env vars alone are not enough — we
override the config and flush the backend cache before any test imports
jax-dependent code.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    import jax._src.xla_bridge as _xb
    _xb._clear_backends()
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
