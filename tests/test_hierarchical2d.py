"""Hierarchical2D mip-warp tests (distr_2d.h:18-57 analog) and the
envmap HDR-sun gates the warp exists for."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core.hierarchical2d import (
    build_hierarchical2d, h2d_invert, h2d_pdf, h2d_sample)
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators


def _tables(grid):
    return {k: jnp.asarray(v) for k, v in build_hierarchical2d(grid).items()}


def test_builder_levels_and_normalization():
    rng = np.random.default_rng(0)
    grid = rng.random((9, 17))
    tabs = build_hierarchical2d(grid)
    ph, pw = 8, 16
    assert tabs["lv0"].shape == (1, 9, 17)
    # normalized: patch averages of lv0 sum to n_patches (unit mean density)
    l0 = tabs["lv0"][0]
    pa = 0.25 * (l0[:-1, :-1] + l0[:-1, 1:] + l0[1:, :-1] + l0[1:, 1:])
    assert np.allclose(pa.sum(), ph * pw, rtol=1e-5)
    # mip0 = patch averages (zero-padded even); each mip = 2x2 sums of prev
    assert np.allclose(tabs["mip0"][0][:ph, :pw], pa, rtol=1e-5)
    k = 0
    while f"mip{k + 1}" in tabs:
        m0, m1 = tabs[f"mip{k}"][0], tabs[f"mip{k + 1}"][0]
        s = m0[0::2, 0::2] + m0[0::2, 1::2] + m0[1::2, 0::2] + m0[1::2, 1::2]
        assert np.allclose(m1[:s.shape[0], :s.shape[1]], s, rtol=1e-5)
        k += 1
    assert max(tabs[f"mip{k}"].shape[1:]) <= 2


def test_sample_pdf_invert_consistency():
    rng = np.random.default_rng(1)
    grid = rng.random((13, 29)) ** 3
    grid[5, 11] = 80.0  # hot texel
    tabs = _tables(grid)
    n = 200_000
    s = jnp.asarray(rng.random((n, 2)), jnp.float32)
    slot = jnp.zeros(n, jnp.int32)
    uv, pdf = h2d_sample(tabs, slot, s)
    assert float(jnp.min(pdf)) > 0
    # the sample pdf IS the bilinear density at the returned position
    pdf_eval = h2d_pdf(tabs, slot, uv)
    rel = jnp.abs(pdf - pdf_eval) / jnp.maximum(pdf, 1e-6)
    assert float(jnp.max(rel)) < 1e-3
    # unit integral: E[1/pdf] = area = 1
    assert abs(float(jnp.mean(1.0 / pdf)) - 1.0) < 0.02
    # exact inverse mapping
    back, pdf_inv = h2d_invert(tabs, slot, uv)
    assert float(jnp.percentile(jnp.abs(back - s), 99)) < 1e-5
    rel_inv = jnp.abs(pdf_inv - pdf) / jnp.maximum(pdf, 1e-6)
    assert float(jnp.max(rel_inv)) < 1e-4


def test_sample_histogram_matches_density():
    rng = np.random.default_rng(2)
    grid = 0.05 + rng.random((7, 7)) ** 2
    tabs = _tables(grid)
    n = 500_000
    s = jnp.asarray(rng.random((n, 2)), jnp.float32)
    uv, _ = h2d_sample(tabs, jnp.zeros(n, jnp.int32), s)
    B = 12
    hist, _, _ = np.histogram2d(np.asarray(uv[:, 1]), np.asarray(uv[:, 0]),
                                bins=[B, B], range=[[0, 1], [0, 1]])
    hist = hist / n * B * B
    # analytic bin masses of the bilinear interpolant via fine midpoint grid
    f = 16
    yy, xx = np.meshgrid((np.arange(B * f) + 0.5) / (B * f),
                         (np.arange(B * f) + 0.5) / (B * f), indexing="ij")
    pts = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1), jnp.float32)
    dens = np.asarray(h2d_pdf(tabs, jnp.zeros(len(pts), jnp.int32), pts))
    ana = dens.reshape(B, f, B, f).mean(axis=(1, 3))
    rel = np.abs(hist - ana) / np.maximum(ana, 0.05)
    assert rel.mean() < 0.05, rel.mean()


def test_envmap_sun_chi2():
    """chi2 of envmap direction sampling on an HDR sky with a small, very
    bright sun (the case the VERDICT calls out: flat CDFs are high-variance
    here; the hierarchical warp's pdf must still match its histogram)."""
    from eradiate_kernel_tpu import emitters
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
    from eradiate_kernel_tpu.core.frame import Frame
    from eradiate_kernel_tpu.render.records import SurfaceInteraction

    rng = np.random.default_rng(3)
    env = (0.05 + 0.2 * rng.random((16, 32, 3))).astype(np.float32)
    env[6, 9] = 4000.0  # one-texel sun
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "sky": {"type": "envmap", "data": env},
    })

    def _si(n):
        z = jnp.zeros(n)
        nrm = jnp.zeros((n, 3)).at[:, 2].set(1.0)
        return SurfaceInteraction(
            t=jnp.ones(n), p=jnp.zeros((n, 3)), n=nrm,
            sh_frame=Frame.from_normal(nrm), uv=jnp.zeros((n, 2)),
            prim_uv=jnp.zeros((n, 2)), dp_du=jnp.zeros((n, 3)),
            dp_dv=jnp.zeros((n, 3)), wi=nrm, wavelengths=jnp.zeros((n, 0)),
            time=z, prim_index=jnp.zeros(n, jnp.int32),
            shape_index=jnp.zeros(n, jnp.int32))

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        sampler, sp = sampler.next_1d()
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        ds, _w = emitters.sample_emitter_direction(
            scene, _si(n), sp, s1, s2, jnp.ones(n, bool),
            test_visibility=False)
        return np.asarray(ds.d)

    def pdf_func(pts):
        n = pts.shape[0]
        return emitters.envmap_pdf_direction(
            scene, scene.emitters["envmap"], jnp.zeros(n, jnp.int32),
            jnp.asarray(pts, jnp.float32), jnp.ones(n, bool))

    t = ChiSquareTest(SphericalDomain(cos_bounds=(-0.97, 0.97)),
                      sample_func, pdf_func, sample_count=200_000,
                      res=16, ires=33)
    assert t.run(0.01), "\n".join(t.messages)


def test_envmap_one_texel_sun_low_variance():
    """A single-texel sun 5e4x brighter than the sky: with the bilinear-
    matched pdf, independent seeds must agree tightly (the flat per-texel
    CDF sampler shows >2x larger spread here because pdf and bilinear eval
    disagree inside/around the hot texel)."""
    env = np.full((32, 64, 3), 1e-3, np.float32)
    env[8, 20] = 50.0
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "distant", "direction": [0, 0, 1],
                   "target": [0, 0, 0],
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 256}},
        "floor": {"type": "rectangle",
                  "to_world": {"type": "scale", "value": 50.0},
                  "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        "sky": {"type": "envmap", "data": env},
    })
    imgs = [np.asarray(integrators.render(scene, seed=s))[0, 0, 1]
            for s in range(6)]
    m = float(np.mean(imgs))
    assert m > 1e-3  # the sun is found at all
    assert np.std(imgs) / m < 0.12, (m, np.std(imgs) / m)
