"""BSDF tests: Fresnel closed forms, chi^2 sample/pdf consistency for every
smooth lobe, and furnace energy gates for delta lobes and wrappers (analog of
src/bsdfs/tests/test_*.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.render import fresnel as fr
from eradiate_kernel_tpu.utils.chi2 import (BSDFAdapter, ChiSquareTest,
                                            SphericalDomain)
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators


# --- Fresnel closed forms -------------------------------------------------------

def test_fresnel_dielectric_normal_incidence():
    r, cos_t, eta_it, eta_ti = fr.fresnel(jnp.asarray([1.0]), 1.5)
    assert np.allclose(r, ((1.5 - 1) / (1.5 + 1)) ** 2, atol=1e-6)
    assert np.allclose(cos_t, -1.0, atol=1e-6)
    assert np.allclose(eta_it, 1.5) and np.allclose(eta_ti, 1 / 1.5)


def test_fresnel_dielectric_tir():
    # from inside glass beyond the critical angle: total internal reflection
    crit = np.sqrt(1.0 - (1 / 1.5) ** 2)  # cos of critical angle
    r, _, _, _ = fr.fresnel(jnp.asarray([-0.5 * crit]), 1.5)
    assert np.allclose(r, 1.0)


def test_fresnel_dielectric_grazing():
    r, _, _, _ = fr.fresnel(jnp.asarray([0.0]), 1.5)
    assert np.allclose(r, 1.0)


def test_fresnel_conductor_normal_incidence():
    eta, k = 0.2, 3.0
    r = fr.fresnel_conductor(jnp.asarray([1.0]),
                             jnp.asarray([[eta]]), jnp.asarray([[k]]))
    expect = ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2)
    assert np.allclose(r, expect, atol=1e-5)


def test_fresnel_reciprocity():
    # R(cos, eta) == R(-cos_t, 1/eta_from_the_other_side): crossing symmetry
    r1, cos_t, _, _ = fr.fresnel(jnp.asarray([0.7]), 1.5)
    r2, _, _, _ = fr.fresnel(cos_t, 1.5)
    assert np.allclose(r1, r2, atol=1e-5)


# --- chi^2 consistency for smooth lobes -----------------------------------------

N = 150_000


def run_bsdf_chi2(bsdf_dict, wi=(0.3, -0.2, 0.9), res=64,
                  cos_bounds=(-1.0, 1.0), ires=9):
    sample_func, pdf_func = BSDFAdapter(bsdf_dict, wi)
    test = ChiSquareTest(SphericalDomain(cos_bounds), sample_func, pdf_func,
                         sample_count=N, res=res, ires=ires)
    assert test.run(significance_level=0.01), "\n".join(test.messages)


@pytest.mark.parametrize("dist", ["ggx", "beckmann"])
def test_chi2_roughconductor(dist):
    run_bsdf_chi2({"type": "roughconductor", "alpha": 0.5,
                   "distribution": dist}, cos_bounds=(0.0, 1.0))


def test_chi2_roughconductor_anisotropic():
    run_bsdf_chi2({"type": "roughconductor", "alpha_u": 0.3, "alpha_v": 0.6},
                  cos_bounds=(0.0, 1.0))


@pytest.mark.parametrize("dist", ["ggx", "beckmann"])
def test_chi2_roughdielectric(dist):
    # ires=17: the refraction peak concentrates ~90% of the mass into a few
    # cells; coarser Simpson integration misses ~0.2% there, which the huge
    # per-cell counts would flag as a (false) rejection
    run_bsdf_chi2({"type": "roughdielectric", "alpha": 0.5,
                   "distribution": dist}, ires=17)


def test_chi2_roughdielectric_from_inside():
    run_bsdf_chi2({"type": "roughdielectric", "alpha": 0.5},
                  wi=(0.2, 0.1, -0.97))


def test_chi2_roughplastic():
    run_bsdf_chi2({"type": "roughplastic", "alpha": 0.3,
                   "diffuse_reflectance": 0.5}, cos_bounds=(0.0, 1.0))


def test_chi2_diffuse():
    run_bsdf_chi2({"type": "diffuse"}, cos_bounds=(0.0, 1.0))


def test_chi2_plastic_smooth_component():
    # delta lobe excluded by the adapter; the diffuse remainder must match
    run_bsdf_chi2({"type": "plastic", "diffuse_reflectance": 0.8},
                  cos_bounds=(0.0, 1.0))


# --- furnace energy gates --------------------------------------------------------

def furnace_scene(bsdf, spp=96, depth=48, w=8):
    return load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": depth, "rr_depth": 1000},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"type": "hdrfilm", "width": w, "height": w,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "sphere": {"type": "sphere", "radius": 1.0, "bsdf": bsdf},
        "env": {"type": "constant", "radiance": 1.0},
    })


def center_mean(bsdf, seed=7, **kw):
    img = np.asarray(integrators.render(furnace_scene(bsdf, **kw), seed=seed))
    assert np.all(np.isfinite(img))
    return img[3:5, 3:5].mean()


def test_furnace_conductor_mirror():
    assert center_mean({"type": "conductor"}) == pytest.approx(1.0, abs=0.01)


def test_furnace_dielectric():
    assert center_mean({"type": "dielectric"}) == pytest.approx(1.0, abs=0.01)


def test_furnace_thindielectric():
    assert center_mean({"type": "thindielectric"}) == pytest.approx(1.0, abs=0.01)


def test_furnace_roughdielectric_smooth_limit():
    assert center_mean({"type": "roughdielectric", "alpha": 0.02}) \
        == pytest.approx(1.0, abs=0.02)


def test_furnace_blend():
    b = {"type": "blendbsdf", "weight": 0.5,
         "a": {"type": "diffuse", "reflectance": 1.0},
         "b": {"type": "conductor"}}
    assert center_mean(b) == pytest.approx(1.0, abs=0.02)


def test_furnace_normalmap_flat_is_identity():
    b = {"type": "normalmap", "normalmap": [0.5, 0.5, 1.0],
         "b": {"type": "diffuse", "reflectance": 1.0}}
    assert center_mean(b) == pytest.approx(1.0, abs=0.02)


def test_mask_rectangle_passthrough():
    """Rect with opacity-0.5 mask over white diffuse in a white furnace:
    passthrough + full reflection both see radiance 1."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 16, "rr_depth": 1000},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 96}},
        "rect": {"type": "rectangle",
                 "bsdf": {"type": "mask", "opacity": 0.5,
                          "b": {"type": "twosided",
                                "a": {"type": "diffuse",
                                      "reflectance": 1.0}}}},
        "env": {"type": "constant", "radiance": 1.0},
    })
    img = np.asarray(integrators.render(scene, seed=3))
    assert img[3:5, 3:5].mean() == pytest.approx(1.0, abs=0.03)


def test_conductor_material_presets():
    """Au preset reflects more in red than blue (sanity on the eta/k table)."""
    img = np.asarray(integrators.render(
        furnace_scene({"type": "conductor", "material": "au"},
                      spp=64, depth=8), seed=1))
    c = img[3:5, 3:5].mean(axis=(0, 1))
    assert c[0] > c[2] * 1.5, c


# --- pplastic (pplastic.cpp) -------------------------------------------------

def test_chi2_pplastic():
    run_bsdf_chi2({"type": "pplastic", "alpha": 0.3,
                   "diffuse_reflectance": 0.4}, cos_bounds=(0.0, 1.0))


def test_chi2_pplastic_ggx_smoothish():
    run_bsdf_chi2({"type": "pplastic", "alpha": 0.12,
                   "distribution": "ggx", "diffuse_reflectance": 0.05},
                  cos_bounds=(0.0, 1.0), ires=17)


def _pplastic_scene_si(bsdf_dict, wi):
    from eradiate_kernel_tpu.core.frame import Frame
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.render.records import SurfaceInteraction
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle", "bsdf": bsdf_dict},
    }, Variant("rgb"))
    wi = jnp.asarray(wi, jnp.float32)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    n = wi.shape[0]
    z = jnp.zeros(n)
    si = SurfaceInteraction(
        t=jnp.ones(n), p=jnp.zeros((n, 3)),
        n=jnp.zeros((n, 3)).at[:, 2].set(1.0),
        sh_frame=Frame.from_normal(jnp.zeros((n, 3)).at[:, 2].set(1.0)),
        uv=jnp.full((n, 2), 0.5), prim_uv=jnp.zeros((n, 2)),
        dp_du=jnp.zeros((n, 3)).at[:, 0].set(1.0),
        dp_dv=jnp.zeros((n, 3)).at[:, 1].set(1.0),
        wi=wi, wavelengths=jnp.zeros((n, 0)),
        time=z, prim_index=jnp.zeros(n, jnp.int32),
        shape_index=jnp.zeros(n, jnp.int32))
    return scene, si


def test_pplastic_eval_components():
    """Diffuse-only pplastic follows (1-F_i)(1-F_o) rho/pi cos_o exactly
    (pplastic.cpp:319-329: no internal-scattering normalization)."""
    from eradiate_kernel_tpu.bsdfs import bsdf_eval_pdf
    from eradiate_kernel_tpu.render import fresnel as fr

    wi = jnp.asarray([[0.0, 0.6, 0.8]])
    scene, si = _pplastic_scene_si({"type": "pplastic", "alpha": 0.2,
                                    "diffuse_reflectance": 0.6,
                                    "specular_reflectance": 0.0}, wi)
    wo = jnp.asarray([[0.5, 0.0, np.sqrt(0.75)]])
    val, _pdf = bsdf_eval_pdf(scene, jnp.zeros(1, jnp.int32), si, wo,
                              jnp.ones(1, bool))
    eta = 1.49 / 1.000277
    f_i = float(fr.fresnel(wi[..., 2], eta)[0][0])
    f_o = float(fr.fresnel(wo[..., 2], eta)[0][0])
    expect = (1 - f_i) * (1 - f_o) * 0.6 / np.pi * float(wo[0, 2])
    assert np.allclose(np.asarray(val)[0], expect, rtol=1e-4)


def test_pplastic_mueller_m00_matches_unpolarized():
    """The (0,0) element of the polarized BSDF equals the unpolarized eval
    — basis rotations leave M00 invariant and the unpolarized Fresnel
    factors are the s/p averages (pplastic.cpp eval, both branches)."""
    from eradiate_kernel_tpu.bsdfs import bsdf_eval_pdf, pplastic

    wi = jnp.asarray([[0.2, -0.3, 0.93], [0.0, 0.0, 1.0]])
    scene, si = _pplastic_scene_si({"type": "pplastic", "alpha": 0.25,
                                    "diffuse_reflectance": 0.3}, wi)
    wo = jnp.asarray([[-0.4, 0.1, 0.91], [0.1, 0.2, 0.97]])
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    act = jnp.ones(2, bool)
    val, _ = bsdf_eval_pdf(scene, jnp.zeros(2, jnp.int32), si, wo, act)
    m = pplastic.eval_mueller(scene, scene.bsdfs["pplastic"],
                              jnp.zeros(2, jnp.int32), si, wo, act)
    assert np.allclose(np.asarray(m[..., 0, 0]), np.asarray(val),
                       rtol=2e-3, atol=1e-6)
    # physical realizability: |M00| bounds every other element
    m00 = np.asarray(m[..., 0, 0])[..., None, None]
    assert (np.abs(np.asarray(m)) <= m00 + 1e-5).all()
