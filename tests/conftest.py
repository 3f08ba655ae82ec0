"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The standard JAX fake-backend trick (SURVEY §4): tests exercise mesh/psum
logic on 8 virtual CPU devices, no TPU needed. The axon TPU plugin ignores
JAX_PLATFORMS, so we also pin jax_default_device to CPU so every test op runs
on the CPU backend (fast, deterministic, no TPU compile latency).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")
# All framework mesh/device selection goes through default_devices(), which
# honors this: tests always run on the virtual CPU backend even when a TPU
# plugin (axon) registers itself regardless of JAX_PLATFORMS.
os.environ["GAN_TPU_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8
    return devs
