"""Test configuration: 8 fake CPU devices for distributed tests.

SURVEY.md §4: `xla_force_host_platform_device_count=8` fakes an 8-device
mesh on CPU so sharding/collective behaviour is tested without a TPU slice.
Pallas kernels are disabled (jnp reference path) since interpret mode on CPU
is too slow; kernel-vs-reference numerics tests run on real TPU only and are
marked `tpu`.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("ARSVT_DISABLE_PALLAS", "1")
# default meshes in tests (Trainer without an explicit mesh, CLI paths) must
# use the fake CPU devices, not the real TPU
os.environ.setdefault("ARSVT_PLATFORM", "cpu")

import jax  # noqa: E402

# Some PJRT plugins (e.g. the axon TPU tunnel) ignore JAX_PLATFORMS=cpu, so
# pin the default device to CPU explicitly; mesh tests build their mesh from
# jax.devices("cpu") (8 fake devices via the XLA flag above).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# XLA CPU's *default* matmul precision truncates fp32 inputs (bf16-sized
# error). Tests assert fp32-level numerics, so pin highest; the production
# path feeds bf16 tensors explicitly and is unaffected.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: multi-second host-side test")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires TPU backend")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
