"""Independent closed-form anchor for the flagship atmosphere physics.

For a plane-parallel slab with vertical extinction profile sigma_t(z)
(arbitrary!), constant single-scattering albedo w, phase p, a directional
sun (irradiance E0 perpendicular to the beam, zenith cosine mu0) and a
Lambertian ground of reflectance rho, the TOA radiance truncated at one
scattering order has the exact closed form (standard radiative-transfer
result, derivable by integrating the source term along the view ray —
independent of the renderer's estimators):

    L_sky    = E0 * w * p(cos Theta) * mu0/(mu + mu0)
               * (1 - exp(-tau * (1/mu + 1/mu0)))
    L_ground = E0 * mu0 * rho/pi * exp(-tau * (1/mu + 1/mu0))

with tau the vertical optical depth, mu the view-path zenith cosine, and
Theta the scattering angle between the sun's direction of propagation and
the propagation direction toward the sensor. Crucially the result depends
on the profile only through tau, so it is exact for the production
exponential-profile gridvolume as well.

volpath with max_depth=2 computes exactly this sum (one real scatter + NEE
to the sun, plus the direct sun->ground->sensor bounce; the sun is a delta
emitter so no other order-<=1 path exists). This pins, in one number, the
whole flagship chain: gridvolume trilinear eval, majorant distance
sampling, ratio-tracked throughput, null slab boundaries, medium- and
surface-NEE transmittance walks, Rayleigh/isotropic phase eval, the
directional emitter, and the distant sensor's ray weights — against a
formula that shares no code with any of them (VERDICT weak #3: the z-test
harness is self-referential; this is an absolute anchor for the
atmosphere workload like tests/test_eradiate_oracles.py is for the
surface plugins).

Reference counterparts: src/integrators/volpath.cpp (transport),
src/media/heterogeneous.cpp, src/textures/grid3d.cpp:254-295 (profile),
src/emitters/directional.cpp:64-132, src/sensors/distant.cpp:301-385.
"""

import numpy as np
import pytest

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.scene import load_dict


def _normalize(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def _slab_scene(profile, albedo, rho, phase, d_sun, d_view, spp):
    """Plane-parallel slab in z [0,1] (same geometry as utils.scenes.
    atmosphere: 40-wide so oblique rays never see the sides), Lambertian
    ground, directional sun, single-ray distant sensor."""
    D = len(profile)
    sigma = np.broadcast_to(
        np.asarray(profile, np.float32)[:, None, None], (D, 4, 4)).copy()
    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 2, "rr_depth": 100},
        "sensor": {
            "type": "distant", "direction": list(-np.asarray(d_view)),
            "target": [0.5, 0.5, 0.0],
            "film": {"width": 1, "height": 1, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        # ground sits 0.01 below the medium's bottom face: exactly coplanar
        # surfaces z-fight with the null boundary interface, and the closed
        # form depends on the profile only through tau, so the vacuum gap
        # changes nothing
        "surface": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 20.0},
                         {"type": "translate", "value": [0.5, 0.5, -0.01]}],
            "bsdf": {"type": "diffuse", "reflectance": float(rho)},
        },
        "atmo": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]},
                         {"type": "translate", "value": [0.5, 0.5, 0.5]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "heterogeneous",
                "sigma_t": {"type": "gridvolume", "data": sigma,
                            "to_world": [{"type": "scale",
                                          "value": [40.0, 40.0, 1.0]},
                                         {"type": "translate",
                                          "value": [-19.5, -19.5, 0.0]}]},
                "albedo": float(albedo),
                "phase": {"type": phase},
            },
        },
        "sun": {"type": "directional", "direction": list(d_sun),
                "irradiance": 1.0},
    }


def _closed_form(profile, albedo, rho, phase, d_sun, d_view):
    """The formula above, with tau integrated from an independent numpy
    replication of node-centered trilinear interpolation (grid local z =
    world z here): sigma(z) = interp over nodes at z_i = i/(D-1)."""
    D = len(profile)
    zs = np.linspace(0.0, 1.0, 8001)
    sig = np.interp(zs, np.linspace(0.0, 1.0, D), profile)
    tau = np.trapezoid(sig, zs)

    d_s = _normalize(d_sun)          # sun propagation (downward)
    w = -_normalize(d_view)          # propagation toward the sensor (upward)
    mu0 = -d_s[2]
    mu = w[2]
    assert mu0 > 0 and mu > 0
    cos_theta = float(np.dot(d_s, w))
    if phase == "rayleigh":
        p = 3.0 / (16.0 * np.pi) * (1.0 + cos_theta ** 2)
    else:
        p = 1.0 / (4.0 * np.pi)
    m = 1.0 / mu + 1.0 / mu0
    l_sky = albedo * p * mu0 / (mu + mu0) * (1.0 - np.exp(-tau * m))
    l_ground = mu0 * rho / np.pi * np.exp(-tau * m)
    return l_sky, l_ground


def _render_mean_std(scene_dict, n_seeds=4):
    scene = load_dict(scene_dict)
    vals = []
    for s in range(n_seeds):
        img = np.asarray(integrators.render(scene, seed=100 + s))
        vals.append(float(img.mean()))
    vals = np.asarray(vals)
    return vals.mean(), vals.std(ddof=1) / np.sqrt(n_seeds)


CASES = [
    # (profile kind, albedo, rho, phase, d_sun, d_view)
    ("exp", 0.9, 0.0, "rayleigh", (0.3, 0.0, -0.954), (0.0, 0.0, -1.0)),
    ("exp", 0.8, 0.3, "rayleigh", (0.35, 0.1, -0.93), (0.4, -0.2, -0.9)),
    ("exp", 0.9, 0.0, "isotropic", (0.0, 0.45, -0.89), (-0.3, 0.0, -0.95)),
    ("linear", 0.7, 0.15, "rayleigh", (0.2, -0.3, -0.93), (0.0, 0.0, -1.0)),
]


@pytest.mark.parametrize("kind,albedo,rho,phase,d_sun,d_view", CASES)
def test_single_scattering_closed_form(kind, albedo, rho, phase, d_sun,
                                       d_view):
    D = 16
    z = (np.arange(D) + 0.5) / D
    if kind == "exp":
        profile = np.exp(-z / 0.25)
        profile *= 0.5 / profile.mean()
    else:
        profile = 0.8 * (1.0 - z) + 0.1
    l_sky, l_ground = _closed_form(profile, albedo, rho, phase, d_sun,
                                   d_view)
    expected = l_sky + l_ground
    mean, stderr = _render_mean_std(
        _slab_scene(profile, albedo, rho, phase, d_sun, d_view, spp=2048))
    # 4-sigma statistical gate + an absolute floor for quadrature error in
    # the tau integral (~1e-6 here)
    tol = 4.0 * stderr + 0.005 * expected
    assert abs(mean - expected) < tol, (
        f"MC {mean:.6f} vs closed form {expected:.6f} "
        f"(sky {l_sky:.6f} + ground {l_ground:.6f}), stderr {stderr:.2e}")


def test_single_scattering_scales_with_depth():
    """Sanity: raising max_depth can only ADD radiance (multiple scattering
    is non-negative), and the single-scatter term stays dominant at this
    optical depth."""
    D = 16
    z = (np.arange(D) + 0.5) / D
    profile = np.exp(-z / 0.25)
    profile *= 0.5 / profile.mean()
    sc2 = _slab_scene(profile, 0.9, 0.3, "rayleigh", (0.3, 0.0, -0.954),
                      (0.0, 0.0, -1.0), spp=2048)
    sc8 = dict(sc2)
    sc8["integrator"] = {"type": "volpath", "max_depth": 8, "rr_depth": 100}
    m2, e2 = _render_mean_std(sc2, n_seeds=3)
    m8, e8 = _render_mean_std(sc8, n_seeds=3)
    assert m8 > m2 - 3 * (e2 + e8), (m2, m8)
    l_sky, l_ground = _closed_form(profile, 0.9, 0.3, "rayleigh",
                                   (0.3, 0.0, -0.954), (0.0, 0.0, -1.0))
    assert m8 < 2.0 * (l_sky + l_ground)
