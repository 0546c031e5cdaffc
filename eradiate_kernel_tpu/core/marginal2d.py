"""Marginal sample warping for 2D distributions with linear interpolation and
an optional dependence on conditioning parameters.

Reference: include/mitsuba/core/distr_2d.h:818-1436 — ``Marginal2D<Float,
Dimension, Continuous=true>`` (the ``MarginalContinuous2D0..3`` family used by
the data-driven `measured` BSDF, measured.cpp:22-24).

TPU-native split: CDF table construction happens once on the host in NumPy
(`build_continuous`, off the hot path, vectorized over all parameter slices at
once instead of the reference's per-slice loop, distr_2d.h:884-945); `eval` /
`sample` / `invert` are traced JAX over a wavefront of lanes. Conditioning
parameters (e.g. phi_i/theta_i/lambda) are handled by multilinear
interpolation over up to 2^D corner slices of the parameter grid
(distr_2d.h:752-771 `lookup`), and the marginal/conditional CDF inversions run
as fixed-trip branchless binary searches (`lax`-free unrolled loops of
ceil(log2 n) steps — n is trace-time static).

All tables passed to the traced functions must have their TRUE shapes (the
caller statically slices away any stack-padding first); every size below is
read from ``.shape`` and is static under jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .math import lerp, safe_sqrt

_EPS = 1e-7
_ONE_MINUS_EPS = 1.0 - 1e-6


def build_continuous(data: np.ndarray, normalize: bool = True) -> dict:
    """Precompute conditional/marginal CDF tables (distr_2d.h:884-910).

    data: (*param_res, h, w) float array (w contiguous). Returns a dict of
    float32 numpy arrays: data (*P,h,w), cond_cdf (*P,h,w-1),
    marg_cdf (*P,h-1). With normalize=True each slice is rescaled so the
    bilinear interpolant integrates to 1 over [0,1]^2.
    """
    data = np.asarray(data, np.float64)
    h, w = data.shape[-2:]
    assert h >= 2 and w >= 2, "Marginal2D needs at least a 2x2 grid"
    scale_x = 0.5 / (w - 1)
    scale_y = 0.5 / (h - 1)
    cond = np.cumsum(scale_x * (data[..., :-1] + data[..., 1:]), axis=-1)
    csum = cond[..., -1]
    marg = np.cumsum(scale_y * (csum[..., :-1] + csum[..., 1:]), axis=-1)
    if normalize:
        norm = 1.0 / np.maximum(marg[..., -1], 1e-30)
        data = data * norm[..., None, None]
        cond = cond * norm[..., None, None]
        marg = marg * norm[..., None]
    return {
        "data": data.astype(np.float32),
        "cond_cdf": cond.astype(np.float32),
        "marg_cdf": marg.astype(np.float32),
    }


def _interp_corners(param_values, params):
    """Multilinear interpolation state over the conditioning-parameter grid
    (distr_2d.h interpolate_weights): returns ([flat slice indices], [weights])
    with up to 2^D entries, each (...,) arrays broadcast to the lane shape."""
    offsets = [None]  # None == scalar 0 seed (avoids materializing zeros)
    weights = [1.0]
    for v, p in zip(param_values, params):
        n = v.shape[0]
        if n == 1:
            continue  # offset*1 + 0 == offset
        p = jnp.clip(p, v[0], v[-1])
        i = jnp.clip(jnp.searchsorted(v, p, side="right") - 1, 0, n - 2)
        i = i.astype(jnp.int32)
        lo = jnp.take(v, i)
        hi = jnp.take(v, i + 1)
        w1 = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
        new_o, new_w = [], []
        for o, wgt in zip(offsets, weights):
            base = i if o is None else o * n + i
            new_o += [base, base + 1]
            new_w += [wgt * (1.0 - w1), wgt * w1]
        offsets, weights = new_o, new_w
    return offsets, weights


def _make_fetch(table, n_slice, offsets, weights):
    """fetch(idx) -> parameter-interpolated lookup of flattened `table`
    (distr_2d.h:1067-1087). idx is an in-slice flat index array."""
    flat = table.reshape(-1)

    def fetch(idx):
        out = None
        for o, w in zip(offsets, weights):
            j = idx if o is None else o * n_slice + idx
            v = w * jnp.take(flat, j)
            out = v if out is None else out + v
        return out

    return fetch


def _bisect(fetch, n, value):
    """First index i in [0, n-1] with fetch(i) >= value (enoki binary_search
    semantics). Fixed-trip unrolled loop: ceil(log2 n)+1 steps."""
    lo = jnp.zeros_like(value, dtype=jnp.int32)
    hi = jnp.full_like(lo, n - 1)
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        pred = fetch(mid) < value
        lo = jnp.where(pred, jnp.minimum(mid + 1, n - 1), lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _sample_segment(s, inv_width, v0, v1):
    """Invert the CDF of one linear segment (distr_2d.h:1408-1417)."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    divisor = jnp.where(non_const, v0 - v1, v0 + v1)
    s = s * (2.0 * inv_width)
    s = jnp.where(non_const, v0 - safe_sqrt(v0 * v0 + s * (v1 - v0)), s)
    ok = divisor != 0.0
    return jnp.where(ok, s / jnp.where(ok, divisor, 1.0), s)


def _invert_segment(s, width, v0, v1):
    """CDF of one linear segment (distr_2d.h:1419-1422)."""
    return s * lerp(v0, v1, 0.5 * s) * width


def _corner_values(data, pos, clip_hi=True):
    """Shared eval/invert preamble: bilinear patch index + fractional offset.
    pos: (..., 2) with x = column axis (width), y = row axis (height)."""
    h, w = data.shape[-2:]
    x = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    px = jnp.clip(x.astype(jnp.int32), 0, w - 2)
    py = jnp.clip(y.astype(jnp.int32), 0, h - 2)
    return px, py, x - px, y - py


def eval(tables, pos, param_values=(), params=(), active=True):
    """Density at `pos` in [0,1]^2 (distr_2d.h:1005-1036). For tables built
    with normalize=False this is the raw bilinear interpolant (the eval-only
    Warp2D0/Warp2D3 uses in measured.cpp:103-147)."""
    data = tables["data"]
    h, w = data.shape[-2:]
    offs, wts = _interp_corners(param_values, params)
    fetch_d = _make_fetch(data, h * w, offs, wts)
    px, py, fx, fy = _corner_values(data, pos)
    idx = py * w + px
    v00 = fetch_d(idx)
    v10 = fetch_d(idx + 1)
    v01 = fetch_d(idx + w)
    v11 = fetch_d(idx + w + 1)
    out = lerp(lerp(v00, v10, fx), lerp(v01, v11, fx), fy)
    return jnp.where(active, out, 0.0)


def sample(tables, sample2, param_values=(), params=(), active=True,
           normalized=True):
    """Warp a uniform (..., 2) variate by the continuous marginal scheme
    (distr_2d.h:1236-1328). Returns ((..., 2) position, density)."""
    data, cond_cdf, marg_cdf = \
        tables["data"], tables["cond_cdf"], tables["marg_cdf"]
    h, w = data.shape[-2:]
    n_cond = h * (w - 1)
    n_marg = h - 1
    offs, wts = _interp_corners(param_values, params)
    fetch_d = _make_fetch(data, h * w, offs, wts)
    fetch_c = _make_fetch(cond_cdf, n_cond, offs, wts)
    fetch_m = _make_fetch(marg_cdf, n_marg, offs, wts)

    sx = jnp.clip(sample2[..., 0], _EPS, _ONE_MINUS_EPS)
    sy = jnp.clip(sample2[..., 1], _EPS, _ONE_MINUS_EPS)

    if not normalized:
        sy = sy * fetch_m(jnp.full_like(sx, n_marg - 1, dtype=jnp.int32))

    # Sample the row from the marginal CDF
    row = _bisect(fetch_m, n_marg, sy)
    row = jnp.minimum(row, h - 2)
    sy = sy - jnp.where(row > 0, fetch_m(jnp.maximum(row - 1, 0)), 0.0)

    off_cond = row * (w - 1)
    r0 = fetch_c(off_cond + (w - 2))
    r1 = fetch_c(off_cond + (w - 1) + (w - 2))
    sy = _sample_segment(sy, float(h - 1), r0, r1)

    # Multiply by the integrated density along x for this fractional row
    sx = sx * lerp(r0, r1, sy)

    def fetch_cond(i):
        return lerp(fetch_c(off_cond + i), fetch_c(off_cond + (w - 1) + i), sy)

    col = _bisect(fetch_cond, w - 1, sx)
    col = jnp.minimum(col, w - 2)
    sx = sx - jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)), 0.0)

    idx = row * w + col
    v00 = fetch_d(idx)
    v10 = fetch_d(idx + 1)
    v01 = fetch_d(idx + w)
    v11 = fetch_d(idx + w + 1)
    c0 = lerp(v00, v01, sy)
    c1 = lerp(v10, v11, sy)
    sx = _sample_segment(sx, float(w - 1), c0, c1)

    pos = jnp.stack([(col + sx) / (w - 1), (row + sy) / (h - 1)], axis=-1)
    pdf = lerp(c0, c1, sx)
    return pos, jnp.where(active, pdf, 0.0)


def invert(tables, pos, param_values=(), params=(), active=True,
           normalized=True):
    """Inverse of `sample` (distr_2d.h:1330-1406): position in [0,1]^2 back
    to the uniform variate, plus the density at `pos`."""
    data, cond_cdf, marg_cdf = \
        tables["data"], tables["cond_cdf"], tables["marg_cdf"]
    h, w = data.shape[-2:]
    n_cond = h * (w - 1)
    n_marg = h - 1
    offs, wts = _interp_corners(param_values, params)
    fetch_d = _make_fetch(data, h * w, offs, wts)
    fetch_c = _make_fetch(cond_cdf, n_cond, offs, wts)
    fetch_m = _make_fetch(marg_cdf, n_marg, offs, wts)

    px, py, fx, fy = _corner_values(data, pos)
    idx = py * w + px
    v00 = fetch_d(idx)
    v10 = fetch_d(idx + 1)
    v01 = fetch_d(idx + w)
    v11 = fetch_d(idx + w + 1)
    c0 = lerp(v00, v01, fy)
    c1 = lerp(v10, v11, fy)
    pdf = lerp(c0, c1, fx)

    sx = _invert_segment(fx, 1.0 / (w - 1), c0, c1)

    off_cond = py * (w - 1)

    def fetch_cond(i):
        return lerp(fetch_c(off_cond + i), fetch_c(off_cond + (w - 1) + i), fy)

    sx = sx + jnp.where(px > 0, fetch_cond(jnp.maximum(px - 1, 0)), 0.0)
    r0 = fetch_c(off_cond + (w - 2))
    r1 = fetch_c(off_cond + (w - 1) + (w - 2))
    total = lerp(r0, r1, fy)
    ok = total > 0
    sx = jnp.where(ok, sx / jnp.where(ok, total, 1.0), sx)

    sy = _invert_segment(fy, 1.0 / (h - 1), r0, r1)
    sy = sy + jnp.where(py > 0, fetch_m(jnp.maximum(py - 1, 0)), 0.0)
    if not normalized:
        tot_m = fetch_m(jnp.full_like(px, n_marg - 1))
        okm = tot_m > 0
        sy = jnp.where(okm, sy / jnp.where(okm, tot_m, 1.0), sy)

    out = jnp.stack([sx, sy], axis=-1)
    return out, jnp.where(active, pdf, 0.0)
