"""Hierarchical2D — mip-based warping of bilinear interpolants.

Re-design of the reference's hierarchical sample warping
(include/mitsuba/core/distr_2d.h:18-57, 336-690): a coarse-to-fine MIP
traversal that maps [0,1]^2 uniforms to samples distributed proportionally
to a bilinearly-interpolated 2D density, with an exact pdf and an exact
inverse. Compared with the flat marginal-CDF scheme, the warp has little
shear and — crucially — its pdf equals the *bilinear interpolant* itself,
so an envmap's value/pdf ratio stays bounded even for a single hot texel
(an HDR sun).

TPU mapping: the build runs on host (NumPy, scene-build time); sample /
pdf / invert are pure JAX with a statically-unrolled descent over the mip
levels (log2(max(n_patches)) iterations of gathers + elementwise warps).

Data layout (all per-slot rows stacked on axis 0, like every registry
table): level 0 is the (S, H, W) vertex grid normalized so the interpolant
integrates to 1 over [0,1]^2; mips[k] are the (zero-padded, even-sized)
patch sums with mips[0] = per-patch averages.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import warp


def build_hierarchical2d(data: np.ndarray) -> dict:
    """Build tables for a (S, H, W) or (H, W) vertex grid (bilinear
    interpolant with (H-1) x (W-1) patches). Returns a dict of NumPy arrays
    to merge into a registry row: 'lv0' (S, H, W) plus 'mip0'.. 'mip<K-1>'
    (finest->coarsest, coarsest is <= 2x2)."""
    data = np.asarray(data, np.float64)
    if data.ndim == 2:
        data = data[None]
    S, H, W = data.shape
    assert H >= 2 and W >= 2, "Hierarchical2D needs >= 2x2 vertices"
    ph, pw = H - 1, W - 1

    patch = 0.25 * (data[:, :-1, :-1] + data[:, :-1, 1:]
                    + data[:, 1:, :-1] + data[:, 1:, 1:])   # (S, ph, pw)
    total = patch.reshape(S, -1).sum(-1)                    # (S,)
    scale = (ph * pw) / np.maximum(total, 1e-30)
    out = {"lv0": (data * scale[:, None, None]).astype(np.float32)}

    def pad_even(a):
        return np.pad(a, ((0, 0), (0, a.shape[1] % 2), (0, a.shape[2] % 2)))

    cur = pad_even(patch * scale[:, None, None])
    mips = [cur]
    while max(cur.shape[1], cur.shape[2]) > 2:
        cur = pad_even(cur[:, 0::2, 0::2] + cur[:, 0::2, 1::2]
                       + cur[:, 1::2, 0::2] + cur[:, 1::2, 1::2])
        mips.append(cur)
    for k, m in enumerate(mips):
        out[f"mip{k}"] = m.astype(np.float32)
    return out


def _mip_keys(params):
    keys = sorted((k for k in params if k.startswith("mip")),
                  key=lambda k: int(k[3:]))
    return keys


def _fetch(tab, slot, y, x):
    """Per-lane tab[slot, y, x] with index clamping (out-of-range fetches
    only occur on zero-probability descent paths of padded levels)."""
    S, h, w = tab.shape
    y = jnp.clip(y, 0, h - 1)
    x = jnp.clip(x, 0, w - 1)
    if S == 1:
        return tab[0, y, x]
    return tab[jnp.broadcast_to(slot, y.shape), y, x]


def h2d_sample(params, slot, sample, prefix=""):
    """distr_2d.h:473-557 Hierarchical2D::sample — returns (pos in [0,1]^2,
    pdf w.r.t. the unit square). ``params`` holds lv0/mip* (optionally under
    a key prefix); ``slot`` is the per-lane row index."""
    lv0 = params[prefix + "lv0"]
    keys = [prefix + k for k in _mip_keys(
        {k[len(prefix):]: 1 for k in params if k.startswith(prefix + "mip")})]
    ph, pw = lv0.shape[-2] - 1, lv0.shape[-1] - 1

    sx = jnp.clip(sample[..., 0], 0.0, 1.0)
    sy = jnp.clip(sample[..., 1], 0.0, 1.0)
    ox = jnp.zeros(sx.shape, jnp.int32)
    oy = jnp.zeros(sx.shape, jnp.int32)

    for key in reversed(keys):  # coarsest -> finest
        level = params[key]
        ox = ox * 2
        oy = oy * 2
        v00 = _fetch(level, slot, oy, ox)
        v10 = _fetch(level, slot, oy, ox + 1)
        v01 = _fetch(level, slot, oy + 1, ox)
        v11 = _fetch(level, slot, oy + 1, ox + 1)
        r0 = v00 + v10
        r1 = v01 + v11
        sy = sy * (r0 + r1)
        m = sy > r0
        oy = oy + m.astype(jnp.int32)
        sy = jnp.where(m, sy - r0, sy) / jnp.maximum(
            jnp.where(m, r1, r0), 1e-20)
        c0 = jnp.where(m, v01, v00)
        c1 = jnp.where(m, v11, v10)
        sx = sx * (c0 + c1)
        m = sx > c0
        ox = ox + m.astype(jnp.int32)
        sx = jnp.where(m, sx - c0, sx) / jnp.maximum(
            jnp.where(m, c1, c0), 1e-20)
        sx = jnp.clip(sx, 0.0, 1.0)
        sy = jnp.clip(sy, 0.0, 1.0)

    ox = jnp.clip(ox, 0, pw - 1)
    oy = jnp.clip(oy, 0, ph - 1)
    v00 = _fetch(lv0, slot, oy, ox)
    v10 = _fetch(lv0, slot, oy, ox + 1)
    v01 = _fetch(lv0, slot, oy + 1, ox)
    v11 = _fetch(lv0, slot, oy + 1, ox + 1)
    pos, pdf = warp.square_to_bilinear(v00, v10, v01, v11,
                                       jnp.stack([sx, sy], -1))
    uv = jnp.stack([(ox + pos[..., 0]) / pw, (oy + pos[..., 1]) / ph], -1)
    return uv, pdf


def h2d_pdf(params, slot, pos, prefix=""):
    """distr_2d.h:649-690 eval — bilinear density at pos in [0,1]^2."""
    lv0 = params[prefix + "lv0"]
    ph, pw = lv0.shape[-2] - 1, lv0.shape[-1] - 1
    x = jnp.clip(pos[..., 0], 0.0, 1.0) * pw
    y = jnp.clip(pos[..., 1], 0.0, 1.0) * ph
    xi = jnp.clip(x.astype(jnp.int32), 0, pw - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, ph - 1)
    fx = x - xi
    fy = y - yi
    v00 = _fetch(lv0, slot, yi, xi)
    v10 = _fetch(lv0, slot, yi, xi + 1)
    v01 = _fetch(lv0, slot, yi + 1, xi)
    v11 = _fetch(lv0, slot, yi + 1, xi + 1)
    return ((v00 * (1 - fx) + v10 * fx) * (1 - fy)
            + (v01 * (1 - fx) + v11 * fx) * fy)


def h2d_invert(params, slot, pos, prefix=""):
    """distr_2d.h:560-646 invert — maps a warped position back to the
    uniform sample that produces it. Returns (sample, pdf)."""
    lv0 = params[prefix + "lv0"]
    keys = [prefix + k for k in _mip_keys(
        {k[len(prefix):]: 1 for k in params if k.startswith(prefix + "mip")})]
    ph, pw = lv0.shape[-2] - 1, lv0.shape[-1] - 1
    x = jnp.clip(pos[..., 0], 0.0, 1.0) * pw
    y = jnp.clip(pos[..., 1], 0.0, 1.0) * ph
    ox = jnp.clip(x.astype(jnp.int32), 0, pw - 1)
    oy = jnp.clip(y.astype(jnp.int32), 0, ph - 1)
    v00 = _fetch(lv0, slot, oy, ox)
    v10 = _fetch(lv0, slot, oy, ox + 1)
    v01 = _fetch(lv0, slot, oy + 1, ox)
    v11 = _fetch(lv0, slot, oy + 1, ox + 1)
    frac = jnp.stack([x - ox, y - oy], -1)
    s, pdf = warp.bilinear_to_square(v00, v10, v01, v11, frac)
    sx = s[..., 0]
    sy = s[..., 1]

    for key in keys:  # finest -> coarsest
        level = params[key]
        bx = ox & ~1
        by = oy & ~1
        v00 = _fetch(level, slot, by, bx)
        v10 = _fetch(level, slot, by, bx + 1)
        v01 = _fetch(level, slot, by + 1, bx)
        v11 = _fetch(level, slot, by + 1, bx + 1)
        xm = (ox & 1) != 0
        ym = (oy & 1) != 0
        r0 = v00 + v10
        r1 = v01 + v11
        c0 = jnp.where(ym, v01, v00)
        c1 = jnp.where(ym, v11, v10)
        sy = sy * jnp.where(ym, r1, r0)
        sy = jnp.where(ym, sy + r0, sy) / jnp.maximum(r0 + r1, 1e-20)
        sx = sx * jnp.where(xm, c1, c0)
        sx = jnp.where(xm, sx + c0, sx) / jnp.maximum(c0 + c1, 1e-20)
        sx = jnp.clip(sx, 0.0, 1.0)
        sy = jnp.clip(sy, 0.0, 1.0)
        ox = ox >> 1
        oy = oy >> 1

    return jnp.stack([sx, sy], -1), pdf
