"""Test configuration.

Default tier: JAX on a virtual 8-device CPU mesh (Pallas kernels run in
interpreter mode); fast, hermetic, covers all math.

On-TPU tier: ``STRIQUE_TEST_TPU=1 python -m pytest tests/ -m tpu``
keeps the real backend (axon TPU tunnel) and runs only the tests marked
``tpu`` — compiled Mosaic kernel parity on the actual chip.

Env vars must be set before jax initializes a backend; the axon
sitecustomize imports jax at interpreter startup, so platform selection
goes through jax.config.update rather than env alone.
"""
import os

TPU_TIER = os.environ.get("STRIQUE_TEST_TPU") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_jax_cache")
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache")

import jax
import pytest

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiled-kernel parity on a real TPU (STRIQUE_TEST_TPU=1, -m tpu)")


def pytest_collection_modifyitems(config, items):
    if not TPU_TIER:
        skip = pytest.mark.skip(
            reason="on-TPU tier: run STRIQUE_TEST_TPU=1 python -m pytest tests/ -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
