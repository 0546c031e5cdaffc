"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the analog of the reference's
variant-parametrized fixtures, src/conftest.py:35-90).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not enough when a sitecustomize pre-imports jax with a
# hardware plugin forced (the env value is cached at that first import, before
# this file runs). config.update still wins as long as no backend has been
# initialized yet — which is guaranteed here since conftest runs first.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(params=["mono", "rgb", "spectral"])
def variant_all(request):
    from eradiate_kernel_tpu.core.types import Variant

    return Variant(request.param)


@pytest.fixture(params=["mono", "rgb"])
def variant_color(request):
    from eradiate_kernel_tpu.core.types import Variant

    return Variant(request.param)


@pytest.fixture
def variant_rgb():
    from eradiate_kernel_tpu.core.types import Variant

    return Variant("rgb")
