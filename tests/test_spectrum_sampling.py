"""Texture::sample_spectrum / pdf_spectrum analog (texture.h:23-201):
wavelength importance sampling of spectrum and texture objects."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.core import spectrum as sp
from eradiate_kernel_tpu.render.texture import (
    scene_spectrum_eval, scene_spectrum_pdf, scene_spectrum_sample,
    texture_pdf_spectrum, texture_sample_spectrum)


def _spectral_scene(extra):
    d = {"type": "scene",
         "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}}}
    d.update(extra)
    return load_dict(d, Variant("spectral"))


def _spec_index(scene, kind):
    kinds = scene.config.spectrum_kinds
    sk = np.asarray(scene.spec_kind)
    return [i for i, k in enumerate(sk) if kinds[k] == kind][0]


N = 150_000


def _check_spectrum(scene, idx_val, analytic_integral, rel=0.01):
    """E[weight] == integral (unbiasedness) and weight == eval/pdf."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random(N), jnp.float32)
    idx = jnp.full(N, idx_val, jnp.int32)
    lam, w = scene_spectrum_sample(scene, idx, u)
    pdf = scene_spectrum_pdf(scene, idx, lam)
    val = scene_spectrum_eval(scene, idx, lam)
    assert np.allclose(np.asarray(val / jnp.maximum(pdf, 1e-20)),
                       np.asarray(w), rtol=1e-4, atol=1e-5)
    est = float(jnp.mean(w))
    assert est == pytest.approx(analytic_integral, rel=rel), \
        (est, analytic_integral)
    return lam, pdf


def test_regular_spectrum_sampling_exact():
    """Piecewise-linear spectra are exactly table-resolved: weight is the
    constant integral (regular.cpp:87-97: sample -> {lambda, integral})."""
    vals = [0.1, 0.9, 0.2, 0.5]
    scene = _spectral_scene({"rect": {
        "type": "rectangle",
        "bsdf": {"type": "diffuse", "reflectance": {
            "type": "regular", "lambda_min": 400.0, "lambda_max": 700.0,
            "values": vals}}}})
    integral = np.trapezoid(vals, np.linspace(400, 700, 4))
    lam, _ = _check_spectrum(scene, _spec_index(scene, "regular"), integral,
                             rel=1e-3)
    lam = np.asarray(lam)
    assert lam.min() >= 400.0 - 1e-3 and lam.max() <= 700.0 + 1e-3


def test_irregular_spectrum_sampling():
    nodes = [300.0, 450.0, 460.0, 1200.0]
    vals = [0.0, 2.0, 3.0, 0.1]
    scene = _spectral_scene({"rect": {
        "type": "rectangle",
        "bsdf": {"type": "diffuse", "reflectance": {
            "type": "irregular", "wavelengths": nodes, "values": vals}}}})
    integral = np.trapezoid(vals, nodes)
    _check_spectrum(scene, _spec_index(scene, "irregular"), integral,
                    rel=1e-3)


def test_blackbody_spectrum_sampling():
    """Planck importance sampling through the table: E[weight] matches the
    numerically integrated radiance over the global range."""
    T = 5500.0
    scene = _spectral_scene({"l": {
        "type": "point",
        "intensity": {"type": "blackbody", "temperature": T}}})
    lamg = np.linspace(sp.WAVELENGTH_MIN, sp.WAVELENGTH_MAX, 20001)
    pl = np.asarray(sp.blackbody_radiance(jnp.asarray(lamg, jnp.float32), T))
    _check_spectrum(scene, _spec_index(scene, "blackbody"),
                    float(np.trapezoid(pl, lamg)), rel=0.01)


def test_sampling_concentrates_where_spectrum_is():
    """A narrow emission-like regular spectrum: nearly all sampled
    wavelengths land inside the support (the point of importance sampling —
    uniform sampling would put ~97% of them outside)."""
    scene = _spectral_scene({"rect": {
        "type": "rectangle",
        "bsdf": {"type": "diffuse", "reflectance": {
            "type": "regular", "lambda_min": 540.0, "lambda_max": 560.0,
            "values": [1.0, 1.0]}}}})
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(4096), jnp.float32)
    idx = jnp.full(4096, _spec_index(scene, "regular"), jnp.int32)
    lam, w = scene_spectrum_sample(scene, idx, u)
    lam = np.asarray(lam)
    assert ((lam >= 540.0 - 1e-3) & (lam <= 560.0 + 1e-3)).mean() > 0.999
    assert float(jnp.mean(w)) == pytest.approx(20.0, rel=1e-3)


def test_discrete_spectrum_sampling_lines():
    """Line spectra: samples land exactly on the lines with pmf proportional
    to the line values; weight = sum of line values (discrete.cpp:39-84)."""
    lines = [500.0, 600.0, 700.0]
    vals = [1.0, 3.0, 6.0]
    scene = _spectral_scene({"l": {
        "type": "point",
        "intensity": {"type": "discrete", "wavelengths": lines,
                      "values": vals}}})
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random(N), jnp.float32)
    idx = jnp.full(N, _spec_index(scene, "discrete"), jnp.int32)
    lam, w = scene_spectrum_sample(scene, idx, u)
    lam = np.asarray(lam)
    assert np.isin(lam.round(3), lines).all()
    assert np.allclose(np.asarray(w), 10.0)
    freq = [(lam == l).mean() for l in lines]
    assert np.allclose(freq, np.asarray(vals) / 10.0, atol=0.01)


def test_texture_sample_spectrum_dispatch():
    """'constant' textures delegate to their spectrum's importance sampler;
    checkerboard falls back to uniform-range sampling with weight =
    eval * range."""
    scene = _spectral_scene({
        "rect": {"type": "rectangle", "bsdf": {"type": "diffuse",
                 "reflectance": {"type": "regular", "lambda_min": 500.0,
                                 "lambda_max": 600.0, "values": [1.0, 1.0]}}},
        "rect2": {"type": "rectangle", "bsdf": {"type": "diffuse",
                  "reflectance": {"type": "checkerboard"}}},
    })
    cfg = scene.config
    tex_kinds = cfg.texture_kinds
    tk = np.asarray(scene.tex_kind)
    const_idx = [i for i, k in enumerate(tk)
                 if tex_kinds[k] == "constant"][0]
    chk_idx = [i for i, k in enumerate(tk)
               if tex_kinds[k] == "checkerboard"][0]
    n = 50_000
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random(n), jnp.float32)
    uv = jnp.full((n, 2), 0.1)

    idx = jnp.full(n, const_idx, jnp.int32)
    lam, w = texture_sample_spectrum(scene, idx, uv, u, jnp.ones(n, bool))
    pdf = texture_pdf_spectrum(scene, idx, uv, lam)
    lam = np.asarray(lam)
    assert ((lam >= 500 - 1e-3) & (lam <= 600 + 1e-3)).all()
    assert float(jnp.mean(w)) == pytest.approx(100.0, rel=1e-3)
    assert np.allclose(np.asarray(pdf), 0.01, rtol=1e-3)  # 1/100 nm

    idx = jnp.full(n, chk_idx, jnp.int32)
    lam2, w2 = texture_sample_spectrum(scene, idx, uv, u, jnp.ones(n, bool))
    pdf2 = texture_pdf_spectrum(scene, idx, uv, lam2)
    rng_w = sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN
    assert np.allclose(np.asarray(pdf2), 1.0 / rng_w, rtol=1e-5)
    # weight = eval * range; color0 default 0.4 at uv=(0.1,0.1)
    assert float(jnp.mean(w2)) == pytest.approx(0.4 * rng_w, rel=0.05)
