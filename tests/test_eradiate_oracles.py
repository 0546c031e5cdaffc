"""Independent value-level oracles for the Eradiate core plugins.

The reference validates its Earth-observation plugins against closed-form
NumPy reimplementations that are independent of the rendering code
(src/bsdfs/tests/test_rpv.py:35-110 `rpv_reference`). The renderer itself
cannot be built here, so these re-derived closed forms are the absolute
correctness anchor for rpv / bilambertian / rayleigh / distant — they share
no code with eradiate_kernel_tpu (plain NumPy, formulas from the papers).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.utils.chi2 import (BSDFAdapter, ChiSquareTest,
                                            SphericalDomain)


# --- independent closed forms (NumPy only, no package imports) -------------------

def rpv_reference(rho_0, rho_0_hotspot, g, k, theta_i, phi_i, theta_o, phi_o):
    """Closed-form Rahman-Pinty-Verstraete BRF (Rahman et al. 1993, eq. 2),
    converted to BRDF-times-cosine. Independently written from the paper
    (cf. the reference's own oracle, test_rpv.py:35-58)."""
    sini, ui = np.sin(theta_i), np.cos(theta_i)
    sino, uo = np.sin(theta_o), np.cos(theta_o)
    tan_i, tan_o = sini / ui, sino / uo
    cosphi = np.cos(phi_i - phi_o)

    minnaert = np.power(ui * uo * (ui + uo), k - 1.0)
    cos_g = ui * uo + sini * sino * cosphi
    fg = (1.0 - g * g) / np.power(1.0 + g * g + 2.0 * g * cos_g, 1.5)
    G = np.sqrt(tan_i ** 2 + tan_o ** 2 - 2.0 * tan_i * tan_o * cosphi)
    hotspot = 1.0 + (1.0 - rho_0_hotspot) / (1.0 + G)
    # 1/pi: the paper's formula is the BRF; * uo: value carries the cosine
    return rho_0 * minnaert * fg * hotspot * np.abs(uo) / np.pi


def rayleigh_cdf(c):
    """CDF over cos(theta) of the Rayleigh phase:
    p(c) = (3/8)(1 + c^2) on [-1, 1]."""
    return (3.0 / 8.0) * (c + c ** 3 / 3.0 + 4.0 / 3.0)


def sph_dirs(theta, phi):
    return np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], -1).astype(np.float32)


# --- shared scene/si scaffolding -------------------------------------------------

def _scene_si(bsdf_dict, wi):
    from eradiate_kernel_tpu.core.frame import Frame
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.render.records import SurfaceInteraction

    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle", "bsdf": bsdf_dict},
    }, Variant("rgb"))
    wi = jnp.asarray(wi, jnp.float32)
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


def _eval(bsdf_dict, wi, wo):
    from eradiate_kernel_tpu.bsdfs import bsdf_eval_pdf

    scene, si = _scene_si(bsdf_dict, wi)
    val, pdf = bsdf_eval_pdf(scene, jnp.zeros(si.t.shape[0], jnp.int32), si,
                             jnp.asarray(wo, jnp.float32),
                             jnp.ones(si.t.shape[0], bool))
    return np.asarray(val), np.asarray(pdf)


# --- RPV ------------------------------------------------------------------------

@pytest.mark.parametrize("rho_0,k,g", [
    (0.1, 0.543, -0.29), (0.497, 0.851, 0.086), (0.004, 0.634, 0.2)])
def test_rpv_eval_matches_reference(rho_0, k, g):
    """bsdf eval (value incl. cosine) == the closed-form RPV oracle
    (test_rpv.py:80-110 analog; rho_c defaults to rho_0)."""
    rng = np.random.default_rng(5)
    n = 256
    theta_i = rng.random(n) * (np.pi / 2 * 0.98)
    theta_o = rng.random(n) * (np.pi / 2 * 0.98)
    phi_i = rng.random(n) * 2 * np.pi
    phi_o = rng.random(n) * 2 * np.pi
    val, _ = _eval({"type": "rpv", "rho_0": rho_0, "k": k, "g": g},
                   sph_dirs(theta_i, phi_i), sph_dirs(theta_o, phi_o))
    ref = rpv_reference(rho_0, rho_0, g, k, theta_i, phi_i, theta_o, phi_o)
    assert np.allclose(val, ref[:, None], rtol=1e-3, atol=1e-3), \
        np.abs(val[:, 0] - ref).max()


@pytest.mark.parametrize("rho_0", [0.0, 0.25, 0.75, 1.0])
def test_rpv_degenerate_matches_diffuse(rho_0):
    """k=1, g=0, rho_c=1 collapses RPV to a Lambertian with albedo rho_0
    (test_rpv.py:112-151 analog)."""
    rng = np.random.default_rng(7)
    n = 128
    wi = sph_dirs(rng.random(n) * np.pi / 2 * 0.98, rng.random(n) * 2 * np.pi)
    wo = sph_dirs(rng.random(n) * np.pi / 2 * 0.98, rng.random(n) * 2 * np.pi)
    val, _ = _eval({"type": "rpv", "rho_0": rho_0, "k": 1.0, "g": 0.0,
                    "rho_c": 1.0}, wi, wo)
    dif, _ = _eval({"type": "diffuse", "reflectance": rho_0}, wi, wo)
    assert np.allclose(val, dif, rtol=1e-4, atol=1e-5)


def test_chi2_rpv():
    """Sample/pdf consistency of the RPV lobe (test_rpv.py:21-33 analog)."""
    sample_func, pdf_func = BSDFAdapter({"type": "rpv", "rho_0": 0.3,
                                         "k": 0.7, "g": -0.2})
    test = ChiSquareTest(SphericalDomain((0.0, 1.0)), sample_func, pdf_func,
                         sample_count=150_000, res=64, ires=9)
    assert test.run(), test.messages


# --- bilambertian ------------------------------------------------------------------

def test_bilambertian_eval_closed_form():
    """value = (r | t) * |cos_o| / pi depending on the hemisphere of wo
    relative to wi; pdf = lobe weight * cosine-hemisphere pdf
    (bilambertian.cpp:112-175)."""
    r, t = 0.3, 0.6
    rng = np.random.default_rng(11)
    n = 256
    th_i = rng.random(n) * np.pi  # both sides
    th_o = rng.random(n) * np.pi
    wi = sph_dirs(th_i, rng.random(n) * 2 * np.pi)
    wo = sph_dirs(th_o, rng.random(n) * 2 * np.pi)
    val, pdf = _eval({"type": "bilambertian", "reflectance": r,
                      "transmittance": t}, wi, wo)
    same = np.sign(wi[:, 2]) == np.sign(wo[:, 2])
    ref = np.where(same, r, t) * np.abs(wo[:, 2]) / np.pi
    assert np.allclose(val, ref[:, None], rtol=1e-5, atol=1e-6)
    w_r = r / (r + t)
    ref_pdf = np.abs(wo[:, 2]) / np.pi * np.where(same, w_r, 1.0 - w_r)
    assert np.allclose(pdf, ref_pdf, rtol=1e-5, atol=1e-6)


def test_bilambertian_white_sky_albedo():
    """E[sample weight] over the lobe choice = r + t (the directional-
    hemispherical albedo of the leaf model), and each lobe's share matches
    its albedo — an energy-level oracle independent of the pdf details."""
    from eradiate_kernel_tpu.bsdfs import bsdf_sample
    from eradiate_kernel_tpu.core.rng import Sampler

    r, t = 0.25, 0.55
    n = 200_000
    wi = np.tile(np.asarray([[0.0, 0.6, 0.8]], np.float32), (n, 1))
    scene, si = _scene_si({"type": "bilambertian", "reflectance": r,
                           "transmittance": t}, wi)
    smp = Sampler.seed(3, jnp.arange(n, dtype=jnp.uint32))
    smp, s1 = smp.next_1d()
    smp, s2 = smp.next_2d()
    bs, weight = bsdf_sample(scene, jnp.zeros(n, jnp.int32), si, s1, s2,
                             jnp.ones(n, bool))
    weight = np.asarray(weight)[:, 0]
    wo_z = np.asarray(bs.wo[:, 2])
    assert abs(weight.mean() - (r + t)) < 5e-3
    reflect = wo_z > 0  # wi.z > 0 -> reflection keeps the upper hemisphere
    assert abs(weight[reflect].sum() / n - r) < 5e-3
    assert abs(weight[~reflect].sum() / n - t) < 5e-3


def test_chi2_bilambertian():
    sample_func, pdf_func = BSDFAdapter({"type": "bilambertian",
                                         "reflectance": 0.4,
                                         "transmittance": 0.35})
    test = ChiSquareTest(SphericalDomain((-1.0, 1.0)), sample_func, pdf_func,
                         sample_count=150_000, res=64, ires=9)
    assert test.run(), test.messages


# --- rayleigh ---------------------------------------------------------------------

def _atmo_scene():
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    return load_dict(atmosphere(width=4, height=4, spp=2, max_depth=4))


def test_rayleigh_eval_closed_form():
    """phase eval == (3/16pi)(1 + cos^2 theta) (Chandrasekhar 1950;
    rayleigh.cpp:42-46)."""
    from eradiate_kernel_tpu import phase as ph

    sc = _atmo_scene()
    rng = np.random.default_rng(2)
    n = 512
    wi = rng.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rng.normal(size=(n, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(ph.phase_eval(sc, jnp.zeros(n, jnp.int32),
                                   jnp.asarray(wi), jnp.asarray(wo)))
    cos = (wi * wo).sum(-1)
    ref = 3.0 / (16.0 * np.pi) * (1.0 + cos ** 2)
    assert np.allclose(val, ref, rtol=1e-5, atol=1e-7)


def test_rayleigh_inverse_cdf_exact():
    """The cubic-root inverse CDF (rayleigh.cpp:54-60) must satisfy
    CDF(cos(u)) == u against the independently integrated CDF."""
    from eradiate_kernel_tpu.phase import _sample_cos_theta

    u = np.linspace(1e-6, 1.0 - 1e-6, 4097).astype(np.float32)
    ct = np.asarray(_sample_cos_theta("rayleigh", {}, None,
                                      jnp.asarray(u))).astype(np.float64)
    assert np.allclose(rayleigh_cdf(ct), u, atol=2e-6)


def test_rayleigh_normalization():
    """int p dOmega = 1: Gauss-Legendre quadrature of the closed form the
    eval oracle pins, sanity on the constant."""
    x, w = np.polynomial.legendre.leggauss(64)
    integral = (2 * np.pi * w * 3.0 / (16.0 * np.pi) * (1 + x ** 2)).sum()
    assert abs(integral - 1.0) < 1e-12


# --- distant sensors ---------------------------------------------------------------

def _sensor_rays(sensor_dict, n, extra=None):
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.rng import Sampler

    d = {"type": "scene", "sensor": sensor_dict,
         "env": {"type": "constant", "radiance": 0.7}}
    d.update(extra or {})
    scene = load_dict(d)
    smp = Sampler.seed(0, jnp.arange(n, dtype=jnp.uint32))
    pos = jnp.asarray(np.random.default_rng(0).random((n, 2)), jnp.float32)
    ray, weight, _ = sensors.sample_ray(scene, smp, pos, jnp.zeros(n))
    return scene, np.asarray(pos), ray, np.asarray(weight)


def test_distant_single_ray_geometry():
    """Fixed-direction distant sensor with a point target: rays travel
    along -direction (distant.cpp:314-332), o == target - 2 R d, weight ==
    1 (distant.cpp:339-343,380-383, Point target + BoundingSphere
    origin)."""
    direction = np.asarray([0.3, -0.2, -0.93])
    direction /= np.linalg.norm(direction)
    target = [0.1, 0.2, 0.0]
    scene, _pos, ray, weight = _sensor_rays(
        {"type": "distant", "direction": list(direction),
         "target": target,
         "film": {"width": 1, "height": 1, "rfilter": {"type": "box"}}},
        64,
        extra={"s": {"type": "sphere", "radius": 1.0}})
    r = float(scene.bsphere_radius)
    d_exp = -direction
    assert np.allclose(np.asarray(ray.d), d_exp, atol=1e-6)
    expect_o = np.asarray(target) - d_exp * 2.0 * r
    assert np.allclose(np.asarray(ray.o), expect_o, atol=1e-5)
    assert np.allclose(weight, 1.0)
    # flip_directions reverses the ray (distant.cpp:331-332)
    _sc, _p, ray_f, _w = _sensor_rays(
        {"type": "distant", "direction": list(direction),
         "target": target, "flip_directions": True,
         "film": {"width": 1, "height": 1, "rfilter": {"type": "box"}}},
        8, extra={"s": {"type": "sphere", "radius": 1.0}})
    assert np.allclose(np.asarray(ray_f.d), direction, atol=1e-6)


def test_distant_plane_arc_directions():
    """Nx1 film: direction at film u is -[cos(pi u), 0, sin(pi u)] under
    the identity to_world (distant.cpp:321-326 SampleWidth mode)."""
    _scene, pos, ray, _w = _sensor_rays(
        {"type": "distant",
         "film": {"width": 8, "height": 1, "rfilter": {"type": "box"}}}, 256)
    ang = np.pi * pos[:, 0]
    expect = -np.stack([np.cos(ang), np.zeros_like(ang),
                        np.sin(ang)], -1)
    assert np.allclose(np.asarray(ray.d), expect, atol=1e-5)


def test_distant_hemisphere_directions_cover():
    """NxM film: directions are the flipped uniform-hemisphere warp of the
    film square — all point into -z, and are uniformly distributed
    (mean z approx -1/2 for the uniform hemisphere)."""
    _scene, _pos, ray, _w = _sensor_rays(
        {"type": "distant",
         "film": {"width": 4, "height": 4, "rfilter": {"type": "box"}}},
        8192)
    dz = np.asarray(ray.d[:, 2])
    assert (dz <= 1e-6).all()
    assert abs(dz.mean() + 0.5) < 0.02
    assert abs(np.asarray(ray.d[:, 0]).mean()) < 0.02


def test_distant_disk_target_origins():
    """Default 'none' targeting: ray targets (o + R d) lie on the
    bounding-sphere cross-section disk through the center, perpendicular
    to d, uniformly (mean == center, radii <= R); weight carries the
    1/dot(-d, z_world) normalization (distant.cpp:357-366)."""
    direction = [0.0, 0.0, 1.0]
    scene, _pos, ray, _w = _sensor_rays(
        {"type": "distant", "direction": direction,
         "film": {"width": 1, "height": 1, "rfilter": {"type": "box"}}},
        8192,
        extra={"s": {"type": "sphere", "radius": 2.0,
                     "center": [1.0, 0.0, 0.0]}})
    r = float(scene.bsphere_radius)
    c = np.asarray(scene.bsphere_center)
    # cross-section targets sit one radius downstream (distant.cpp:376-378)
    target = np.asarray(ray.o) + np.asarray(ray.d) * r
    # on the plane through the center
    assert np.allclose(target[:, 2], c[2], atol=1e-4)
    rad = np.linalg.norm(target[:, :2] - c[None, :2], axis=-1)
    assert (rad <= r * (1 + 1e-4)).all()
    assert abs(target[:, 0].mean() - c[0]) < r * 0.05
    # uniform over the disk: E[rad^2] = R^2/2
    assert abs((rad ** 2).mean() - r * r / 2) < r * r * 0.05
