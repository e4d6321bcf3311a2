"""Test harness: run everything on an 8-device virtual CPU mesh.

The reference's GPU-gated tests skip without CUDA
(`tests/test_detectors.py:74-77`); here every test runs on CPU, and
multi-device (data-parallel) behavior is exercised with XLA's host
device-count override — a capability the reference suite lacks.
"""

import os

# force CPU even when a TPU plugin (e.g. the axon sitecustomize) already
# registered and pinned the platform: the suite depends on the 8-device
# virtual mesh below
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
