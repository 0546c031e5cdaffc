"""Spectrum / image / media-profile build helpers — split out of scene/build.py (kept import-compatible via
re-exports there)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.transform import Transform, as_transform

def _cie_rgb_of_spectrum(eval_fn, emitter: bool) -> np.ndarray:
    """Bake a spectrum (callable wavelength->value) to linear sRGB by CIE
    integration — what the reference does for spectra in rgb variants
    (spectrum.cpp spectrum_to_rgb). Reflectance spectra are weighted by the
    D65 illuminant (bounded=True path)."""
    lam = np.linspace(sp.CIE_MIN, sp.CIE_MAX, 471)
    vals = np.asarray(eval_fn(lam), np.float64)
    cie = np.asarray(sp.cie1931_xyz(jnp.asarray(lam, jnp.float32)), np.float64)
    if emitter:
        xyz = np.trapezoid(vals[:, None] * cie, lam, axis=0)
    else:
        from ..render.texture import d65_approx
        d65 = np.asarray(d65_approx(jnp.asarray(lam, jnp.float32)), np.float64)
        denom = np.trapezoid(d65 * cie[:, 1], lam)
        xyz = np.trapezoid(vals[:, None] * d65[:, None] * cie, lam, axis=0) / denom
    rgb = np.asarray(sp.xyz_to_srgb(jnp.asarray(xyz[None], jnp.float32)))[0]
    return np.maximum(rgb, 0.0)


def _srgb_const_coeff(l):
    """Sigmoid-polynomial coeffs (0, 0, c) giving a flat reflectance l."""
    l = float(np.clip(l, 1e-4, 1.0 - 1e-4))
    y = 2.0 * l - 1.0
    return np.array([0.0, 0.0, y / np.sqrt(max(1.0 - y * y, 1e-9))], np.float32)


def _image_data(d):
    """Image payload for bitmap/envmap dicts: inline 'data' or 'filename'
    (EXR incl. ZIP/RLE compression via utils.bitmap, or LDR via PIL —
    bitmap.cpp's loader role)."""
    if "data" in d:
        return np.asarray(d["data"], np.float32)
    fn = d["filename"]
    from ..utils import bitmap as bm

    low = fn.lower()
    if low.endswith(".exr"):
        img, _names = bm.read_exr(fn)
        return img[..., :3] if img.shape[-1] >= 3 else img
    if low.endswith(".pfm"):
        return np.asarray(bm.read_pfm(fn), np.float32)
    if low.endswith(".hdr") or low.endswith(".rgbe"):
        return np.asarray(bm.read_rgbe(fn), np.float32)
    return np.asarray(bm.read_image(fn), np.float32)


AXPROF_BINS = 64  # fixed per-axis majorant profile resolution (media)

SMP_TABLE_N = 96  # spectrum sampling-table resolution (sample_spectrum)


def _spectrum_sampling_table(kind, row):
    """Piecewise-linear wavelength importance-sampling table for a spectral
    row — the Texture::sample_spectrum / pdf_spectrum machinery
    (texture.h:23-201; regular.cpp:87-97 ContinuousDistribution,
    blackbody.cpp:149+ analytic CDF both collapse to this one table form).

    The sampler draws from the table's own piecewise-linear density and
    reports exactly that density as the pdf, so eval/pdf stays unbiased even
    where the table under-resolves the true spectrum. Returns smp_nodes /
    smp_pdf (normalized density) / smp_cdf, each (SMP_TABLE_N,)."""
    from ..core import spectrum as spmod

    P = SMP_TABLE_N
    wmin, wmax = spmod.WAVELENGTH_MIN, spmod.WAVELENGTH_MAX

    if kind == "uniform":
        nodes = np.linspace(wmin, wmax, P)
        f = np.full(P, float(row["value"]))
    elif kind == "regular":
        lo, hi = float(row["lo"]), float(row["hi"])
        vals = np.asarray(row["values"], np.float64)
        nodes = np.linspace(lo, hi, P)
        f = np.interp(nodes, np.linspace(lo, hi, len(vals)), vals)
    elif kind == "irregular":
        nd = np.asarray(row["nodes"], np.float64)
        vals = np.asarray(row["values"], np.float64)
        nodes = np.linspace(nd[0], nd[-1], P)
        f = np.interp(nodes, nd, vals)
    elif kind in ("srgb", "srgb_d65", "blackbody", "d65"):
        from ..render.texture import d65_approx, srgb_model_eval

        nodes = np.linspace(wmin, wmax, P)
        lam = jnp.asarray(nodes, jnp.float32)
        if kind == "blackbody":
            f = np.asarray(spmod.blackbody_radiance(
                lam, float(row["temperature"]))) * float(row["scale"])
        else:
            f = np.ones(P)
            if kind in ("srgb", "srgb_d65"):
                f = f * np.asarray(srgb_model_eval(
                    jnp.asarray(row["coeff"], jnp.float32)[None], lam)[0])
            if kind in ("d65", "srgb_d65"):
                f = f * np.asarray(d65_approx(lam)) * float(row["scale"])
    else:
        raise ValueError(kind)

    f = np.maximum(np.asarray(f, np.float64), 1e-12)
    seg = 0.5 * (f[1:] + f[:-1]) * np.diff(nodes)
    integral = seg.sum()
    cdf = np.concatenate([[0.0], np.cumsum(seg)]) / integral
    return {"smp_nodes": nodes.astype(np.float32),
            "smp_pdf": (f / integral).astype(np.float32),
            "smp_cdf": cdf.astype(np.float32)}


def _axis_majorant_profiles(vol_row, vmax):
    """Conservative per-axis slab-max profiles of a sigma_t volume — the
    TPU-native super-grid majorant (SURVEY §7 "Majorant quality"; the
    reference's single global max, heterogeneous.cpp:29, forces null
    collisions everywhere in exponential atmospheres).

    For each local axis a and fixed bin i (covering local coord
    [i/P, (i+1)/P]) the profile stores the max of the grid's node values
    over every node whose trilinear support touches the bin: any
    interpolated value inside the bin is bounded by it. min over the three
    axis range-maxes is then a valid spatial majorant for a segment.

    Returns (3, P) f32 NORMALIZED by vmax (values in [0, 1]): the traced
    'majorant' row (= scale * vmax at build) sets the magnitude at query
    time, so it remains the single ParameterMap knob that raises majorants
    (e.g. to feed null-collision gradients) exactly as with the global
    scheme."""
    P = AXPROF_BINS
    grid = vol_row.get("grid")
    if grid is None or vmax <= 0:  # constvolume / empty: flat profiles
        return np.ones((3, P), np.float32)
    # grid (D, H, W, C): axis 0 = local z, 1 = local y, 2 = local x
    out = np.empty((3, P), np.float32)
    for a_out, a_grid in ((0, 2), (1, 1), (2, 0)):  # out rows: x, y, z
        other = tuple(i for i in range(grid.ndim) if i != a_grid)
        node_max = grid.max(axis=other)          # (n_nodes,)
        n = len(node_max)
        for i in range(P):
            g0 = int(np.floor(i / P * (n - 1)))
            g1 = int(np.ceil((i + 1) / P * (n - 1)))
            out[a_out, i] = node_max[g0:g1 + 1].max()
    # f32 safety margin so interpolation rounding can never exceed it
    return out * np.float32((1.0 + 1e-4) / vmax)


def _control_and_residual_profiles(vol_kind, vol_row, vmax):
    """Control profile + per-axis residual-bound profiles for the residual
    ratio-tracking NEE estimator (Novák et al. 2014 "Residual ratio
    tracking"; no reference counterpart — the reference only ratio-tracks
    against the global majorant, volpath.cpp:282-365).

    The transmittance over a segment factorizes as
        T = exp(-int sigma_c) * E[ prod_i (1 - (sigma(x_i) - sigma_c(x_i))/R) ]
    where sigma_c is ANY control field with a closed-form integral and the
    collisions x_i arrive at rate R >= |sigma - sigma_c| on the segment.
    Here sigma_c(z) is the horizontal mean of the grid per z-slice —
    piecewise linear in local z, so its optical depth is exact via a
    cumulative table (same machinery as the plane-parallel zprof/zcum).
    The residual rate per segment is the min over the three per-axis
    range-max profiles of |grid - sigma_c| — for a plane-parallel profile
    the residual is ZERO (the estimator degenerates to the exact closed
    form with no stochastic steps at all), and for mildly heterogeneous
    atmospheres it is far below the majorant, collapsing the NEE walk's
    step count (each step costs a full-wavefront grid gather on TPU).

    Unbiasedness is robust to STALE tables (e.g. after a ParameterMap grid
    update): the same sigma_c appears in the closed form and in the
    collision weights, so any control cancels in expectation as long as
    rate > 0 wherever sigma != sigma_c (weights merely leave [0, 2] and
    variance grows). cprof/ccum/resprof are therefore sampling parameters,
    like the majorant knob.

    Returns (cprof (D,), ccum (D,), resprof (3, P) — resprof in absolute
    sigma units BEFORE the medium's traced `scale`)."""
    P = AXPROF_BINS
    grid = vol_row.get("grid")
    if vol_kind == "constvolume":
        val = float(np.max(vol_row["value"]))
        return (np.asarray([val], np.float32), np.zeros(1, np.float32),
                np.zeros((3, P), np.float32))
    ctrl_ok = (vol_kind == "gridvolume" and grid is not None
               and int(vol_row.get("wrap", 0)) == 0
               and grid.shape[-1] == 1)
    if not ctrl_ok:
        # zero control: residual tracking degenerates to per-segment-
        # majorant ratio tracking (resprof = the unnormalized axis majorant)
        return (np.zeros(1, np.float32), np.zeros(1, np.float32),
                _axis_majorant_profiles(vol_row, vmax) * np.float32(vmax)
                if vmax > 0 else np.zeros((3, P), np.float32))
    g = grid[..., 0].astype(np.float64)          # (D, H, W), axis 0 = z
    cprof = g.mean(axis=(1, 2))                  # horizontal mean per slice
    D = len(cprof)
    if D > 1:
        dz = 1.0 / (D - 1)
        ccum = np.concatenate(
            [[0.0], np.cumsum(0.5 * (cprof[:-1] + cprof[1:]) * dz)])
    else:
        ccum = np.zeros(1)
    resid = np.abs(g - cprof[:, None, None])     # (D, H, W)
    out = np.empty((3, P), np.float32)
    for a_out, a_grid in ((0, 2), (1, 1), (2, 0)):  # out rows: x, y, z
        other = tuple(i for i in range(3) if i != a_grid)
        node_max = resid.max(axis=other)
        n = len(node_max)
        for i in range(P):
            g0 = int(np.floor(i / P * (n - 1)))
            g1 = int(np.ceil((i + 1) / P * (n - 1)))
            out[a_out, i] = node_max[g0:g1 + 1].max()
    return (cprof.astype(np.float32), ccum.astype(np.float32),
            out * np.float32(1.0 + 1e-4))


