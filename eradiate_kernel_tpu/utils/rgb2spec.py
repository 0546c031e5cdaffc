"""RGB -> smooth reflectance spectrum fitting (Jakob & Hanika 2019).

The reference ships precomputed rgb2spec coefficient tables
(ext/rgb2spec, loaded by srgb.cpp:14-37). Instead of shipping a table, the
sigmoid-polynomial coefficients are fitted *per unique rgb value at scene
build time* with a damped Gauss-Newton on the CIE/D65 projection — a few
dozen host-side iterations per color, cached. The evaluated model is
identical to the reference's (srgb.h:9-21 sigmoid polynomial), so spectral
renders reproduce the requested sRGB reflectances under D65.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import spectrum as sp

_LAM = np.linspace(sp.CIE_MIN, sp.CIE_MAX, 95)


@functools.lru_cache(maxsize=1)
def _projection():
    """(3, K) matrix taking spectral reflectance samples to normalized sRGB
    under D65 (the same bake the rgb variant uses in build.py)."""
    import jax.numpy as jnp

    from ..render.texture import d65_approx

    lam = _LAM
    cie = np.asarray(sp.cie1931_xyz(jnp.asarray(lam, jnp.float32)),
                     np.float64)
    d65 = np.asarray(d65_approx(jnp.asarray(lam, jnp.float32)), np.float64)
    w = d65[:, None] * cie                     # (K, 3) integrand weights
    w *= (lam[1] - lam[0])
    denom = (d65 * cie[:, 1]).sum() * (lam[1] - lam[0])
    xyz_to_srgb = np.array([[3.240479, -1.537150, -0.498535],
                            [-0.969256, 1.875991, 0.041556],
                            [0.055648, -0.204043, 1.057311]])
    return xyz_to_srgb @ (w.T / denom)         # (3, K)


def _model(coeff):
    """Sigmoid polynomial over _LAM; coeff (3,) -> (K,) reflectance."""
    x = coeff[0] * _LAM ** 2 + coeff[1] * _LAM + coeff[2]
    return 0.5 * x / np.sqrt(1.0 + x * x) + 0.5


def _jacobian(coeff):
    x = coeff[0] * _LAM ** 2 + coeff[1] * _LAM + coeff[2]
    dsig = 0.5 / (1.0 + x * x) ** 1.5
    basis = np.stack([_LAM ** 2, _LAM, np.ones_like(_LAM)])  # (3, K)
    return (dsig * basis).T                                   # (K, 3)


@functools.lru_cache(maxsize=4096)
def fit_srgb_coeff(r, g, b):
    """Sigmoid-polynomial coefficients reproducing linear sRGB (r, g, b)
    under D65. Gauss-Newton with Levenberg damping; inputs clipped to the
    fittable gamut like the reference's table."""
    target = np.clip([r, g, b], 1e-4, 0.9999)
    P = _projection()

    # init: flat spectrum at luminance
    lum = float(0.2126 * target[0] + 0.7152 * target[1] + 0.0722 * target[2])
    y = 2.0 * lum - 1.0
    coeff = np.array([0.0, 0.0, y / np.sqrt(max(1.0 - y * y, 1e-9))])

    lam_damp = 1e-4
    resid = P @ _model(coeff) - target
    err = float(resid @ resid)
    for _ in range(60):
        J = P @ _jacobian(coeff)               # (3, 3)
        JtJ = J.T @ J + lam_damp * np.eye(3)
        step = np.linalg.solve(JtJ, J.T @ resid)
        new = coeff - step
        new_resid = P @ _model(new) - target
        new_err = float(new_resid @ new_resid)
        if new_err < err:
            coeff, resid, err = new, new_resid, new_err
            lam_damp = max(lam_damp * 0.5, 1e-8)
            if err < 1e-10:
                break
        else:
            lam_damp *= 4.0
            if lam_damp > 1e6:
                break
    return tuple(np.asarray(coeff, np.float32))
