"""Sampler tests (analog of src/samplers/tests): aggregate uniformity,
in-pixel stratification quality (variance reduction), determinism."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core.rng import SAMPLER_KINDS, Sampler

SPP = 16
N_PIXELS = 4096


def draw_2d(kind, spp=SPP, n_pixels=N_PIXELS, seed=0, dims_skip=0):
    lane = jnp.arange(n_pixels * spp, dtype=jnp.uint32)
    s = Sampler.seed(seed, lane, kind=kind, spp=spp)
    for _ in range(dims_skip):
        s, _ = s.next_2d()
    s, pts = s.next_2d()
    return np.asarray(pts).reshape(n_pixels, spp, 2)


@pytest.mark.parametrize("kind", SAMPLER_KINDS)
def test_aggregate_uniform(kind):
    """Union over pixels and samples must be uniform on [0,1)^2
    (chi^2 on a 16x16 grid)."""
    pts = draw_2d(kind).reshape(-1, 2)
    assert pts.min() >= 0.0 and pts.max() < 1.0
    res = 16
    hist, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=res,
                                range=[[0, 1], [0, 1]])
    expected = len(pts) / res ** 2
    chi2 = ((hist - expected) ** 2 / expected).sum()
    # dof = 255; 3.9 sigma one-sided bound
    assert chi2 < 255 + 3.9 * np.sqrt(2 * 255), chi2


@pytest.mark.parametrize("kind", ["stratified", "multijitter", "orthogonal",
                                  "ldsampler"])
def test_in_pixel_stratification(kind):
    """Each pixel's spp samples must land in distinct 4x4 strata — the
    defining property the stateless rewrite must preserve
    (stratified.cpp:54-70)."""
    pts = draw_2d(kind, spp=16, n_pixels=256)
    gx = np.floor(pts[..., 0] * 4).astype(int)
    gy = np.floor(pts[..., 1] * 4).astype(int)
    cell = gy * 4 + gx
    n_distinct = np.array([len(set(c)) for c in cell.reshape(256, 16)])
    assert (n_distinct == 16).mean() > 0.99, n_distinct.mean()


@pytest.mark.parametrize("kind", ["stratified", "multijitter", "ldsampler"])
def test_variance_reduction_vs_independent(kind):
    """Pixel-mean variance of a smooth integrand must beat independent
    sampling (the point of stratification)."""
    def pixel_var(kind):
        pts = draw_2d(kind, spp=SPP, n_pixels=2048, seed=3)
        f = np.sin(np.pi * pts[..., 0]) * pts[..., 1] ** 2
        return f.mean(axis=1).var()

    assert pixel_var(kind) < 0.6 * pixel_var("independent")


@pytest.mark.parametrize("kind", SAMPLER_KINDS)
def test_deterministic_and_sharding_invariant(kind):
    """Values are pure functions of (seed, lane, dim): any lane subset
    reproduces the full-wavefront values (SURVEY §2.7 decorrelation row)."""
    lane = jnp.arange(64, dtype=jnp.uint32)
    s1, a = Sampler.seed(9, lane, kind=kind, spp=8).next_2d()
    _, b = Sampler.seed(9, lane[17:23], kind=kind, spp=8).next_2d()
    assert np.array_equal(np.asarray(a)[17:23], np.asarray(b))


def test_dims_decorrelated():
    """Consecutive dimensions must not be correlated (pearson < 0.05)."""
    for kind in SAMPLER_KINDS:
        p0 = draw_2d(kind, dims_skip=0).reshape(-1, 2)
        p1 = draw_2d(kind, dims_skip=1).reshape(-1, 2)
        r = np.corrcoef(p0[:, 0], p1[:, 0])[0, 1]
        assert abs(r) < 0.05, (kind, r)


def test_render_with_each_sampler():
    """End-to-end: every sampler kind renders the furnace correctly."""
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu import integrators

    for kind in SAMPLER_KINDS:
        scene = load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "perspective",
                       "film": {"width": 4, "height": 4,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": kind, "sample_count": 16}},
            "env": {"type": "constant", "radiance": 0.7},
        })
        img = np.asarray(integrators.render(scene))
        assert np.allclose(img, 0.7, atol=1e-3), (kind, img.mean())


# --- variance reduction (the POINT of stratified samplers) ----------------------

def _integration_variance(kind, spp, n_pixels=4096, seed=0, dims_2d=True):
    """Per-pixel MC estimates of a smooth integral; returns the empirical
    variance of the per-pixel means across pixels (the pixel-noise proxy)."""
    n = n_pixels * spp
    smp = Sampler.seed(seed, jnp.arange(n, dtype=jnp.uint32),
                       kind=kind, spp=spp)
    if dims_2d:
        smp, s2 = smp.next_2d()
        # smooth 2D integrand: E = 0 after subtracting the true integral
        f = jnp.sin(2 * jnp.pi * s2[:, 0]) * jnp.cos(2 * jnp.pi * s2[:, 1]) \
            + s2[:, 0] * s2[:, 1]
        true = 0.25
    else:
        smp, s1 = smp.next_1d()
        f = s1 * s1
        true = 1.0 / 3.0
    means = f.reshape(n_pixels, spp).mean(axis=1)
    return float(jnp.mean((means - true) ** 2))


@pytest.mark.parametrize("kind,factor", [
    # measured reductions at these settings: stratified 3.2x, multijitter /
    # orthogonal 3.3x, ldsampler 6.2x (the integrand has a full sine period
    # per 4-cell span, so within-cell variance bounds the gain); thresholds
    # sit ~25% below measured
    ("stratified", 2.4), ("multijitter", 2.4), ("orthogonal", 2.4),
    ("ldsampler", 4.5)])
def test_sampler_variance_reduction_2d(kind, factor):
    """Stratified kinds must beat independent sampling by a large factor on
    a smooth 2D integrand at spp=16 (stratified.cpp / multijitter.cpp /
    orthogonal.cpp / ldsampler.cpp exist exactly for this; the reference
    asserts only uniformity, this pins the variance property itself)."""
    spp = 16
    v_ind = _integration_variance("independent", spp)
    v_kind = _integration_variance(kind, spp)
    assert v_kind * factor < v_ind, (kind, v_kind, v_ind)


def test_sampler_variance_reduction_1d():
    spp = 16
    v_ind = _integration_variance("independent", spp, dims_2d=False)
    for kind in ("stratified", "multijitter", "ldsampler"):
        v = _integration_variance(kind, spp, dims_2d=False)
        assert v * 4.0 < v_ind, (kind, v, v_ind)


def test_sampler_estimates_unbiased():
    """Variance reduction must not buy bias: every kind's grand mean over
    many pixels matches the true integral."""
    spp = 16
    for kind in ("independent", "stratified", "multijitter", "orthogonal",
                 "ldsampler"):
        n_pixels, n = 8192, 8192 * spp
        smp = Sampler.seed(3, jnp.arange(n, dtype=jnp.uint32),
                           kind=kind, spp=spp)
        smp, s2 = smp.next_2d()
        f = jnp.sin(2 * jnp.pi * s2[:, 0]) * jnp.cos(2 * jnp.pi * s2[:, 1]) \
            + s2[:, 0] * s2[:, 1]
        err = abs(float(f.mean()) - 0.25)
        assert err < 2e-3, (kind, err)
