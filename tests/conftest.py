"""Test harness: force the CPU backend with 8 virtual devices (SURVEY.md §4.3).

The environment's sitecustomize registers the axon TPU backend at interpreter start,
so JAX_PLATFORMS from the shell is ignored; a runtime config update still wins as
long as it happens before any backend is initialized — hence this conftest must be
imported before any test touches jax arrays (pytest guarantees conftest import order).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from vidcap_tpu.config import get_preset
    return get_preset("synthetic_tiny")


@pytest.fixture(scope="session")
def tiny_dataset(tiny_cfg):
    from vidcap_tpu.data.loader import CaptionDataset
    return CaptionDataset.synthetic(tiny_cfg.data, num_videos=32, seed=0)
