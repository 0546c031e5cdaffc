"""Spectra, CIE color matching, and hero-wavelength sampling.

Counterpart of include/mitsuba/core/spectrum.h. The global wavelength range
follows the Eradiate kernel: 280–2400 nm (spectrum.h:15-20). The CIE 1931
color-matching functions are generated from the multi-lobe Gaussian analytic
fit of Wyman, Sloan & Shirley 2013 ("Simple Analytic Approximations to the
CIE XYZ Color Matching Functions") on the reference's 95-sample 360–830 nm
grid — same resolution/interpolation scheme as the reference table
(spectrum.h:127-133) without copying its data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WAVELENGTH_MIN = 280.0
WAVELENGTH_MAX = 2400.0
CIE_MIN = 360.0
CIE_MAX = 830.0
CIE_SAMPLES = 95
N_HERO = 4  # hero wavelengths per ray in spectral mode


def _gauss(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return np.exp(-0.5 * ((x - mu) / s) ** 2)


def _cie_table():
    lam = np.linspace(CIE_MIN, CIE_MAX, CIE_SAMPLES)
    x = (1.056 * _gauss(lam, 599.8, 37.9, 31.0)
         + 0.362 * _gauss(lam, 442.0, 16.0, 26.7)
         - 0.065 * _gauss(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _gauss(lam, 568.8, 46.9, 40.5)
         + 0.286 * _gauss(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _gauss(lam, 437.0, 11.8, 36.0)
         + 0.681 * _gauss(lam, 459.0, 26.0, 13.8))
    return lam, np.stack([x, y, z], axis=-1).astype(np.float32)


_CIE_LAM, _CIE_XYZ_NP = _cie_table()
# Normalize so that a unit-radiance spectrum maps to luminance Y = 1 under the
# hero-wavelength estimator with the default uniform [CIE_MIN, CIE_MAX]
# sampling: E[ybar(L) * w] with w = (CIE_MAX - CIE_MIN) must be 1, i.e. divide
# by integral of ybar (reference: MTS_CIE_Y_NORMALIZATION, spectrum.h:133).
# Fold the reference's MTS_CIE_Y_NORMALIZATION (spectrum.h:133, applied to
# emitter spectra in xml.cpp:1117) into the table itself: the stored responses
# have units 1/nm so that E[ybar(L)*w] = 1 for a unit-radiance spectrum under
# any unbiased wavelength sampling (w = 1/pdf). Emitter spectra then need no
# unit conversion anywhere.
_CIE_Y_INTEGRAL = float(np.trapezoid(_CIE_XYZ_NP[:, 1], _CIE_LAM))  # ~106.9 nm
CIE_XYZ_TABLE = jnp.asarray(_CIE_XYZ_NP / _CIE_Y_INTEGRAL)


def cie1931_xyz(wavelength):
    """Linear interpolation of the CIE table (spectrum.h:148-200).

    wavelength: (...,) nm -> (..., 3) xyz responses (normalized, see above).
    """
    t = (wavelength - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN))
    active = (wavelength >= CIE_MIN) & (wavelength <= CIE_MAX)
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = t - i0
    v = CIE_XYZ_TABLE[i0] * (1.0 - w1[..., None]) + CIE_XYZ_TABLE[i0 + 1] * w1[..., None]
    return jnp.where(active[..., None], v, 0.0)


def cie1931_y(wavelength):
    return cie1931_xyz(wavelength)[..., 1]


def spectrum_to_xyz(value, wavelengths):
    """Hero-wavelength estimator of XYZ: mean over the wavelength axis
    (spectrum.h:210-217). value/wavelengths: (..., nw) -> (..., 3)."""
    xyz = cie1931_xyz(wavelengths)  # (..., nw, 3)
    return jnp.mean(xyz * value[..., None], axis=-2)


SRGB_TO_XYZ_M = jnp.asarray(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], jnp.float32)

XYZ_TO_SRGB_M = jnp.asarray(
    [[3.240479, -1.537150, -0.498535],
     [-0.969256, 1.875991, 0.041556],
     [0.055648, -0.204043, 1.057311]], jnp.float32)


def srgb_to_xyz(rgb):
    # pinned precision: 3x3 color matmuls must not inherit a reduced global
    # default (bf16-class precision costs ~0.5% on a srgb<->xyz roundtrip)
    return jnp.matmul(rgb, SRGB_TO_XYZ_M.T, precision=jax.lax.Precision.HIGHEST)


def xyz_to_srgb(xyz):
    return jnp.matmul(xyz, XYZ_TO_SRGB_M.T, precision=jax.lax.Precision.HIGHEST)


def luminance(value, wavelengths=None):
    if wavelengths is not None:
        return jnp.mean(cie1931_y(wavelengths) * value, axis=-1)
    return (value[..., 0] * 0.212671 + value[..., 1] * 0.715160
            + value[..., 2] * 0.072169)


def sample_shifted(sample, n=N_HERO):
    """One uniform sample -> n stratified-shifted samples in [0,1)
    (reference: math.h:419-440)."""
    shift = jnp.arange(n, dtype=jnp.float32) / n
    v = sample[..., None] + shift
    return jnp.where(v > 1.0, v - 1.0, v)


def sample_uniform_spectrum(sample):
    """Uniform wavelength sampling over the CIE range, weight = range width
    (spectrum.h:250-253). Returns (wavelength, weight)."""
    lam = sample * (CIE_MAX - CIE_MIN) + CIE_MIN
    return lam, jnp.full_like(lam, CIE_MAX - CIE_MIN)


def pdf_uniform_spectrum(wavelength):
    """Note: the reference's pdf_uniform_spectrum quirkily uses the *full*
    wavelength range (spectrum.h:256-258) while its sampler draws from the CIE
    range; we keep the two self-consistent over the CIE range here."""
    return pdf_uniform_spectrum_cie(wavelength)


def pdf_uniform_spectrum_cie(wavelength):
    ok = (wavelength >= CIE_MIN) & (wavelength <= CIE_MAX)
    return jnp.where(ok, 1.0 / (CIE_MAX - CIE_MIN), 0.0)


def sample_rgb_spectrum(sample):
    """Importance spectrum for RGB rendering (Radziszewski et al.), valid only
    for the visible 360–830 range; the Eradiate 280–2400 build falls back to
    uniform (spectrum.h:271-285). Returns (wavelength, weight=1/pdf)."""
    if (WAVELENGTH_MIN, WAVELENGTH_MAX) == (360.0, 830.0):
        lam = 538.0 - jnp.arctanh(0.8569106254698279 - 1.8275019724092267 * sample) * 138.88888888888889
        tmp = jnp.cosh(0.0072 * (lam - 538.0))
        return lam, 253.82 * tmp * tmp
    return sample_uniform_spectrum(sample)


def pdf_rgb_spectrum(wavelength):
    if (WAVELENGTH_MIN, WAVELENGTH_MAX) == (360.0, 830.0):
        tmp = 1.0 / jnp.cosh(0.0072 * (wavelength - 538.0))
        ok = (wavelength >= WAVELENGTH_MIN) & (wavelength <= WAVELENGTH_MAX)
        return jnp.where(ok, 0.003939804229326285 * tmp * tmp, 0.0)
    return pdf_uniform_spectrum(wavelength)


def sample_wavelength(sample):
    """Default sensor wavelength sampling: stratified hero wavelengths via
    sample_shifted + the rgb/uniform importance warp (spectrum.h:305-313).
    sample: (...,) -> (wavelengths (..., 4), weights (..., 4))."""
    ws = sample_shifted(sample)
    return sample_rgb_spectrum(ws)


def blackbody_radiance(wavelength_nm, temperature):
    """Planck's law, spectral radiance in W/m^2/sr/nm
    (reference: src/spectra/blackbody.cpp)."""
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    lam = wavelength_nm * 1e-9
    p = 2.0 * h * c * c / lam ** 5 / (jnp.exp(h * c / (lam * kb * temperature)) - 1.0)
    return p * 1e-9  # per nm
