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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (z-test regressions, multi-process "
        "distributed, subprocess x64) — `-m 'not slow'` is the <10-min "
        "smoke subset; CI should run the suite in two shards to keep any "
        "single CPU process under the XLA-compile memory ceiling")


def pytest_collection_modifyitems(config, items):
    # auto-mark the statistically-heavy suites as slow so
    # `pytest -m 'not slow'` stays a fast smoke subset
    slow_files = ("test_regression", "test_distributed", "test_double",
                  "test_sampling_chi2", "test_measured", "test_volpath",
                  "test_instancing", "test_variants", "test_bsdfs",
                  "test_polarization", "test_emitters")
    import pytest as _pytest

    for item in items:
        if any(s in str(item.fspath) for s in slow_files):
            item.add_marker(_pytest.mark.slow)


def assert_driver_equivalent(a, b, max_flips=0, tol=1e-4):
    """Assert two renders of the SAME per-sample estimator (different
    drivers/shardings/compilations) agree sample-for-sample, modulo up to
    ``max_flips`` pixels of discrete estimator divergence.

    Why not exact: free-flight delta tracking makes DISCONTINUOUS decisions
    (null/real classification, majorant-profile bin selection) from f32
    state. XLA compiles each driver separately and may contract FMAs or
    fuse differently, so a lane's state can differ by an ULP between
    programs — almost always invisible, but when it crosses a decision
    boundary the lane takes a different (equally unbiased) path and that
    pixel's value legitimately diverges. Rate observed: ~1 pixel per few
    hundred samples on the atmosphere scene. Pixels beyond the flip budget
    fail the test; flipped pixels must still be finite and bounded."""
    import numpy as np

    a = np.asarray(a)
    b = np.asarray(b)
    diff = np.abs(a - b).max(axis=-1)
    scale = np.abs(a).max(axis=-1) + 1e-6
    bad = diff > tol * np.maximum(scale, 1.0)
    assert bad.sum() <= max_flips, \
        f"{bad.sum()} pixels diverged (budget {max_flips}); max {diff.max()}"
    if bad.any():
        assert np.isfinite(b).all()
        assert diff[bad].max() < 10 * (np.abs(a).mean() + 1.0)
