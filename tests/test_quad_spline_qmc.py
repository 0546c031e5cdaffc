"""Tests for the quadrature / spline / QMC math toolkit
(counterparts of include/mitsuba/core/{quad,spline,qmc}.h)."""

import numpy as np
import jax.numpy as jnp

from eradiate_kernel_tpu.core import qmc, quad, spline


# ---------------------------------------------------------------------------
# quad.h
# ---------------------------------------------------------------------------

def test_gauss_legendre_exactness():
    """n-point GL integrates degree 2n-1 polynomials exactly."""
    x, w = quad.gauss_legendre(8)
    x, w = np.asarray(x, np.float64), np.asarray(w, np.float64)
    assert np.isclose(w.sum(), 2.0, atol=1e-6)
    # int_{-1}^{1} x^14 dx = 2/15
    assert np.isclose((w * x ** 14).sum(), 2.0 / 15.0, rtol=1e-5)
    # odd powers vanish
    assert abs((w * x ** 13).sum()) < 1e-6


def test_gauss_lobatto():
    x, w = quad.gauss_lobatto(6)
    x, w = np.asarray(x, np.float64), np.asarray(w, np.float64)
    assert np.isclose(x[0], -1.0) and np.isclose(x[-1], 1.0)
    assert np.isclose(w.sum(), 2.0, atol=1e-6)
    # exact for degree 2n-3 = 9
    assert np.isclose((w * x ** 8).sum(), 2.0 / 9.0, rtol=1e-5)


def test_composite_simpson():
    x, w = quad.composite_simpson(33)
    val = float((np.asarray(w) * np.asarray(x) ** 3).sum())
    assert abs(val) < 1e-6  # odd
    val2 = float((np.asarray(w) * np.asarray(x) ** 2).sum())
    assert np.isclose(val2, 2.0 / 3.0, atol=1e-5)
    x8, w8 = quad.composite_simpson_38(31)
    assert np.isclose(float(np.asarray(w8).sum()), 2.0, atol=1e-5)


# ---------------------------------------------------------------------------
# spline.h
# ---------------------------------------------------------------------------

def test_spline_reproduces_quadratic():
    """Catmull-Rom with centered-difference tangents is exact on
    quadratics (spline.h design property)."""
    nodes = np.linspace(-1.0, 3.0, 9)
    f = lambda x: 0.5 * x ** 2 - x + 0.25
    values = jnp.asarray(f(nodes), jnp.float32)
    xs = np.linspace(-0.9, 2.9, 37)
    out = np.asarray(spline.eval_1d(-1.0, 3.0, values, jnp.asarray(xs)))
    assert np.allclose(out, f(xs), atol=2e-5), np.abs(out - f(xs)).max()


def test_spline_nonuniform():
    nodes = np.array([0.0, 0.1, 0.35, 0.7, 1.0, 1.5])
    f = lambda x: 2.0 * x + 1.0  # linear: exact for any tangents
    values = jnp.asarray(f(nodes), jnp.float32)
    xs = np.linspace(0.01, 1.49, 23)
    out = np.asarray(spline.eval_1d_nonuniform(
        jnp.asarray(nodes, jnp.float32), values, jnp.asarray(xs, jnp.float32)))
    assert np.allclose(out, f(xs), atol=2e-5)


def test_spline_integrate_invert_roundtrip():
    nodes = np.linspace(0.0, 2.0, 17)
    values = jnp.asarray(1.0 + 0.5 * np.sin(nodes), jnp.float32)
    cdf = spline.integrate_1d(0.0, 2.0, values)
    # integral of 1 + 0.5 sin over [0, 2]
    ref = 2.0 + 0.5 * (1.0 - np.cos(2.0))
    assert np.isclose(float(cdf[-1]), ref, rtol=1e-4)
    # invert the (monotone) CDF interpolant: f(invert(y)) == y
    ys = jnp.asarray(np.linspace(0.05, float(cdf[-1]) - 0.05, 11), jnp.float32)
    xs = spline.invert_1d(0.0, 2.0, cdf, ys)
    back = spline.eval_1d(0.0, 2.0, cdf, xs)
    assert np.allclose(np.asarray(back), np.asarray(ys), atol=1e-4)


def test_spline_sample_matches_histogram():
    """sample_1d draws from the interpolated density: histogram vs pdf."""
    values = jnp.asarray([0.2, 1.0, 2.0, 1.0, 0.2], jnp.float32)
    cdf = spline.integrate_1d(0.0, 1.0, values)
    u = jnp.asarray(np.random.RandomState(0).rand(200_000), jnp.float32)
    x, pdf = spline.sample_1d(0.0, 1.0, values, cdf, u)
    x = np.asarray(x)
    assert (x >= 0).all() and (x <= 1).all()
    hist, edges = np.histogram(x, bins=20, range=(0, 1), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    dens = np.asarray(spline.eval_1d(0.0, 1.0, values,
                                     jnp.asarray(centers, jnp.float32)))
    dens = dens / float(cdf[-1])
    assert np.allclose(hist, dens, rtol=0.05, atol=0.02), \
        np.abs(hist - dens).max()
    # pdf output agrees with the density at the sampled points
    d_at_x = np.asarray(spline.eval_1d(0.0, 1.0, values,
                                       jnp.asarray(x, jnp.float32)))
    assert np.allclose(np.asarray(pdf), d_at_x / float(cdf[-1]), rtol=1e-3,
                       atol=1e-5)


# ---------------------------------------------------------------------------
# qmc.h
# ---------------------------------------------------------------------------

def test_radical_inverse_base2():
    out = np.asarray(qmc.radical_inverse(0, jnp.arange(8, dtype=jnp.uint32)))
    ref = [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    assert np.allclose(out, ref, atol=1e-6)


def test_radical_inverse_base3():
    out = np.asarray(qmc.radical_inverse(1, jnp.arange(6, dtype=jnp.uint32)))
    ref = [0.0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9]
    assert np.allclose(out, ref, atol=1e-6)


def test_radical_inverse_scrambled_properties():
    """Scrambled points stay in [0,1), are equidistributed, and distinct
    seeds decorrelate."""
    idx = jnp.arange(4096, dtype=jnp.uint32)
    a = np.asarray(qmc.radical_inverse_scrambled(0, idx, 1))
    b = np.asarray(qmc.radical_inverse_scrambled(0, idx, 2))
    assert (a >= 0).all() and (a < 1).all()
    # equidistribution: each of 16 strata gets 4096/16 points exactly for a
    # (0,1)-sequence under digit scrambling in base 2
    counts = np.histogram(a, bins=16, range=(0, 1))[0]
    assert (counts == 256).all(), counts
    assert not np.allclose(a, b)
    # distinct primes give distinct sequences
    c = np.asarray(qmc.radical_inverse(5, idx))
    assert (c >= 0).all() and (c < 1).all()
    assert abs(c.mean() - 0.5) < 0.01
