"""Catmull-Rom cubic splines (counterpart of include/mitsuba/core/spline.h).

The reference's spline toolkit backs its measured-data plugins: Hermite
evaluation from function samples with finite-difference tangents, definite
integration, monotone inversion, and CDF importance sampling, on uniform
(``min/max``) or non-uniform (``nodes``) grids. All entry points here are
jittable and vectorized over the evaluation points; the data arrays are
trace-time constants (device tables).

Conventions match spline.h (centered-difference tangents, C1 interpolant)
except at the boundary cells, where second-order one-sided tangents replace
the reference's first-order ones so quadratic exactness holds on the whole
domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite basis on [0, 1] (spline.h eval_spline)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0 + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0 + (t3 - t2) * d1)


def eval_spline_d(f0, f1, d0, d1, t):
    """Value and derivative of the Hermite segment (spline.h eval_spline_d)."""
    t2 = t * t
    value = eval_spline(f0, f1, d0, d1, t)
    deriv = ((6.0 * t2 - 6.0 * t) * (f0 - f1)
             + (3.0 * t2 - 4.0 * t + 1.0) * d0 + (3.0 * t2 - 2.0 * t) * d1)
    return value, deriv


def eval_spline_i(f0, f1, d0, d1):
    """Integral of the Hermite segment over [0, 1] (spline.h eval_spline_i)."""
    return 0.5 * (f0 + f1) + (d0 - d1) / 12.0


def _segment_uniform(values, x, x_min, x_max):
    """(i, t, f0, f1, d0, d1) for a uniform grid; tangents are centered
    differences (one-sided at the ends), in units of one cell."""
    n = values.shape[-1]
    width = (x_max - x_min) / (n - 1)
    u = jnp.clip((x - x_min) / width, 0.0, n - 1 - 1e-6)
    i = jnp.clip(u.astype(jnp.int32), 0, n - 2)
    t = u - i.astype(u.dtype)

    f = lambda k: values[..., jnp.clip(k, 0, n - 1)]
    f0 = f(i)
    f1 = f(i + 1)
    fm = f(i - 1)
    fp = f(i + 2)
    # centered differences inside; second-order one-sided at the ends (the
    # reference's first-order ends, spline.h:262-268, lose quadratic
    # exactness in the boundary cells — these don't)
    d0 = jnp.where(i > 0, 0.5 * (f1 - fm), -1.5 * f0 + 2.0 * f1 - 0.5 * fp)
    d1 = jnp.where(i + 2 < n, 0.5 * (fp - f0), 1.5 * f1 - 2.0 * f0 + 0.5 * fm)
    return i, t, f0, f1, d0, d1, width


def eval_1d(x_min, x_max, values, x):
    """Evaluate the Catmull-Rom interpolant of uniform samples ``values``
    over [x_min, x_max] at ``x`` (spline.h eval_1d, uniform overload)."""
    values = jnp.asarray(values)
    _i, t, f0, f1, d0, d1, _w = _segment_uniform(values, jnp.asarray(x),
                                                 x_min, x_max)
    return eval_spline(f0, f1, d0, d1, t)


def eval_1d_nonuniform(nodes, values, x):
    """Non-uniform-grid overload (spline.h eval_1d with nodes): tangents are
    scaled finite differences over the neighboring intervals."""
    nodes = jnp.asarray(nodes)
    values = jnp.asarray(values)
    n = nodes.shape[-1]
    x = jnp.asarray(x)
    i = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0 = nodes[i]
    x1 = nodes[i + 1]
    w = x1 - x0
    t = jnp.clip((x - x0) / w, 0.0, 1.0)

    f = lambda k: values[jnp.clip(k, 0, n - 1)]
    g = lambda k: nodes[jnp.clip(k, 0, n - 1)]
    f0 = f(i)
    f1 = f(i + 1)
    fm = f(i - 1)
    fp = f(i + 2)
    d0 = jnp.where(i > 0, w * (f1 - fm) / (x1 - g(i - 1)), f1 - f0)
    d1 = jnp.where(i + 2 < n, w * (fp - f0) / (g(i + 2) - x0), f1 - f0)
    return eval_spline(f0, f1, d0, d1, t)


def integrate_1d(x_min, x_max, values):
    """Cumulative definite integral of the interpolant at every node
    (spline.h integrate_1d): out[k] = int_{x_min}^{node_k} f. Host-free,
    runs as a cumsum of per-segment Hermite integrals."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    width = (x_max - x_min) / (n - 1)
    i = jnp.arange(n - 1)
    f = lambda k: values[..., jnp.clip(k, 0, n - 1)]
    f0 = f(i)
    f1 = f(i + 1)
    fm = f(i - 1)
    fp = f(i + 2)
    d0 = jnp.where(i > 0, 0.5 * (f1 - fm), -1.5 * f0 + 2.0 * f1 - 0.5 * fp)
    d1 = jnp.where(i + 2 < n, 0.5 * (fp - f0), 1.5 * f1 - 2.0 * f0 + 0.5 * fm)
    seg = eval_spline_i(f0, f1, d0, d1) * width
    return jnp.concatenate([jnp.zeros(values.shape[:-1] + (1,)),
                            jnp.cumsum(seg, -1)], -1)


def invert_1d(x_min, x_max, values, y, n_iter=16):
    """Invert a strictly increasing interpolant: find x with f(x) = y
    (spline.h invert_1d). Bracketed Newton with bisection fallback, fixed
    trip count for jit."""
    values = jnp.asarray(values)
    y = jnp.asarray(y)
    n = values.shape[-1]
    i = jnp.clip(jnp.searchsorted(values, y, side="right") - 1, 0, n - 2)
    width = (x_max - x_min) / (n - 1)

    f = lambda k: values[..., jnp.clip(k, 0, n - 1)]
    f0 = f(i)
    f1 = f(i + 1)
    fm = f(i - 1)
    fp = f(i + 2)
    d0 = jnp.where(i > 0, 0.5 * (f1 - fm), -1.5 * f0 + 2.0 * f1 - 0.5 * fp)
    d1 = jnp.where(i + 2 < n, 0.5 * (fp - f0), 1.5 * f1 - 2.0 * f0 + 0.5 * fm)

    def body(_, carry):
        lo, hi, t = carry
        val, deriv = eval_spline_d(f0, f1, d0, d1, t)
        too_low = val < y
        lo = jnp.where(too_low, t, lo)
        hi = jnp.where(too_low, hi, t)
        t_newton = t - (val - y) / jnp.where(jnp.abs(deriv) > 1e-12, deriv,
                                             1.0)
        ok = (t_newton > lo) & (t_newton < hi) & (jnp.abs(deriv) > 1e-12)
        return lo, hi, jnp.where(ok, t_newton, 0.5 * (lo + hi))

    lo0 = jnp.zeros(jnp.shape(y))
    hi0 = jnp.ones(jnp.shape(y))
    _lo, _hi, t = jax.lax.fori_loop(0, n_iter, body, (lo0, hi0, 0.5 * (lo0 + hi0)))
    return x_min + (i.astype(t.dtype) + t) * width


def sample_1d(x_min, x_max, values, cdf, sample, n_iter=16):
    """Importance-sample the density interpolant given its node CDF from
    ``integrate_1d`` (spline.h sample_1d). Returns (x, pdf)."""
    values = jnp.asarray(values)
    cdf = jnp.asarray(cdf)
    total = cdf[..., -1]
    y = jnp.asarray(sample) * total
    n = values.shape[-1]
    width = (x_max - x_min) / (n - 1)
    i = jnp.clip(jnp.searchsorted(cdf, y, side="right") - 1, 0, n - 2)

    f = lambda k: values[..., jnp.clip(k, 0, n - 1)]
    f0 = f(i)
    f1 = f(i + 1)
    fm = f(i - 1)
    fp = f(i + 2)
    d0 = jnp.where(i > 0, 0.5 * (f1 - fm), -1.5 * f0 + 2.0 * f1 - 0.5 * fp)
    d1 = jnp.where(i + 2 < n, 0.5 * (fp - f0), 1.5 * f1 - 2.0 * f0 + 0.5 * fm)
    y_seg = (y - cdf[i]) / width

    def cdf_seg(t):
        """Integral of the Hermite segment from 0 to t (antiderivative)."""
        t2 = t * t
        t3 = t2 * t
        t4 = t2 * t2
        return (f0 * (0.5 * t4 - t3 + t)
                + f1 * (-0.5 * t4 + t3)
                + d0 * (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2)
                + d1 * (0.25 * t4 - t3 / 3.0))

    def body(_, carry):
        lo, hi, t = carry
        val = cdf_seg(t)
        deriv = eval_spline(f0, f1, d0, d1, t)
        too_low = val < y_seg
        lo = jnp.where(too_low, t, lo)
        hi = jnp.where(too_low, hi, t)
        t_newton = t - (val - y_seg) / jnp.where(deriv > 1e-12, deriv, 1.0)
        ok = (t_newton > lo) & (t_newton < hi) & (deriv > 1e-12)
        return lo, hi, jnp.where(ok, t_newton, 0.5 * (lo + hi))

    lo0 = jnp.zeros(jnp.shape(y))
    hi0 = jnp.ones(jnp.shape(y))
    _lo, _hi, t = jax.lax.fori_loop(0, n_iter, body,
                                    (lo0, hi0, 0.5 * (lo0 + hi0)))
    x = x_min + (i.astype(t.dtype) + t) * width
    pdf = eval_spline(f0, f1, d0, d1, t) / jnp.maximum(total, 1e-20)
    return x, pdf
