"""Spectral upsampling of 3-channel gridvolumes (grid3d.cpp:69-89,300-341).

In spectral variants the reference pre-converts rgb voxel data to per-voxel
rgb2spec sigmoid coefficients + a brightness scale (2*max(rgb)), evaluates
the sigmoid AT EACH CORNER for the ray wavelengths, and trilinearly
interpolates the resulting spectra (scale interpolated separately). The
metadata max — the majorant source — becomes the max scale, which bounds
the value since the sigmoid is < 1.
"""

import jax.numpy as jnp
import numpy as np

from eradiate_kernel_tpu.core import spectrum as sp
from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.textures.volumes import volume_eval, volume_max


def _scene_with_grid(data, mode="spectral"):
    return load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "bound": {"type": "cube",
                  "to_world": [{"type": "scale", "value": 0.5},
                               {"type": "translate",
                                "value": [0.5, 0.5, 0.5]}],
                  "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "gridvolume",
                                           "data": data},
                               "albedo": 0.5}},
    }, Variant(mode))


def _grid_slot(scene, kind):
    kinds = scene.config.volume_kinds
    vk = np.asarray(scene.vol_kind)
    idx = [i for i, k in enumerate(vk) if kinds[k] == kind]
    assert idx, f"no {kind} volume built (kinds: {kinds})"
    return idx[0]


def _eval_at(scene, vol_idx, pts, lams):
    n = len(pts)
    wl = jnp.broadcast_to(jnp.asarray(lams, jnp.float32), (n, len(lams)))
    return np.asarray(volume_eval(scene, jnp.full(n, vol_idx, jnp.int32),
                                  jnp.asarray(pts, jnp.float32), wl))


def test_rgb_grid_upsampled_roundtrip():
    """Constant-color rgb grid -> spectrum -> CIE integration -> the
    original rgb (within the sigmoid-fit tolerance)."""
    rgb = np.array([0.62, 0.28, 0.09], np.float32)
    data = np.broadcast_to(rgb, (2, 2, 2, 3)).copy()
    scene = _scene_with_grid(data)
    gi = _grid_slot(scene, "gridvolume_srgb")

    lams = np.linspace(sp.CIE_MIN, sp.CIE_MAX, 95).astype(np.float32)
    vals = _eval_at(scene, gi, [[0.5, 0.5, 0.5]], lams)[0]  # (95,)
    assert np.all(np.isfinite(vals)) and np.all(vals >= 0)

    # reflectances reproduce their rgb under the D65 illuminant (the
    # rgb2spec convention, srgb.cpp:14-37): integrate D65-weighted CMFs
    from eradiate_kernel_tpu.render.texture import d65_approx
    cmf = np.asarray(sp.cie1931_xyz(jnp.asarray(lams)))        # (95, 3)
    d65 = np.asarray(d65_approx(jnp.asarray(lams)))            # (95,)
    xyz = np.trapezoid(vals[:, None] * d65[:, None] * cmf, lams, axis=0)
    xyz /= np.trapezoid(d65 * cmf[:, 1], lams)
    got = np.asarray(sp.xyz_to_srgb(jnp.asarray(xyz, jnp.float32)))
    assert np.allclose(got, rgb, atol=0.03), (got, rgb)


def test_corner_eval_then_lerp_semantics():
    """Midpoint value = mean of the two corner SPECTRA (the reference
    interpolates evaluated spectra, not coefficients)."""
    a = np.array([0.8, 0.1, 0.1], np.float32)
    b = np.array([0.05, 0.2, 0.9], np.float32)
    data = np.empty((1, 1, 2, 3), np.float32)
    data[..., 0, :] = a
    data[..., 1, :] = b
    scene = _scene_with_grid(data)
    gi = _grid_slot(scene, "gridvolume_srgb")

    lams = np.linspace(400.0, 700.0, 16).astype(np.float32)
    va = _eval_at(scene, gi, [[0.0, 0.5, 0.5]], lams)[0]
    vb = _eval_at(scene, gi, [[1.0, 0.5, 0.5]], lams)[0]
    vm = _eval_at(scene, gi, [[0.5, 0.5, 0.5]], lams)[0]
    # scales are interpolated separately: mid = mean(spec) * mean(scale);
    # recover the per-corner spectra/scales from the endpoint evals
    sa, sb = 2 * a.max(), 2 * b.max()
    expect = 0.5 * (va / sa + vb / sb) * (0.5 * (sa + sb))
    assert np.allclose(vm, expect, rtol=1e-4, atol=1e-5), \
        np.abs(vm - expect).max()


def test_majorant_bounds_upsampled_values():
    """volume_max (= max scale) must bound the spectral eval everywhere —
    ratio tracking is only unbiased under a true majorant."""
    rng = np.random.default_rng(3)
    data = rng.uniform(0.0, 2.5, (3, 3, 3, 3)).astype(np.float32)
    scene = _scene_with_grid(data)
    gi = _grid_slot(scene, "gridvolume_srgb")

    vmax = float(np.asarray(volume_max(scene,
                                       jnp.asarray([gi], jnp.int32)))[0])
    assert vmax == np.float32(2.0 * data.max(-1).max())

    pts = rng.uniform(0.0, 1.0, (256, 3))
    lams = np.linspace(sp.CIE_MIN, sp.CIE_MAX, 24).astype(np.float32)
    vals = _eval_at(scene, gi, pts, lams)
    assert vals.max() <= vmax * (1 + 1e-5), (vals.max(), vmax)


def test_rgb_variant_keeps_raw_grid():
    """Color (non-spectral) variants keep the raw 3-channel grid — no
    conversion (grid3d.cpp only converts when is_spectral_v<Spectrum>)."""
    rgb = np.array([0.3, 0.5, 0.7], np.float32)
    data = np.broadcast_to(rgb, (2, 2, 2, 3)).copy()
    scene = _scene_with_grid(data, mode="rgb")
    gi = _grid_slot(scene, "gridvolume")
    out = np.asarray(volume_eval(
        scene, jnp.asarray([gi], jnp.int32),
        jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32), jnp.zeros((1, 0))))
    assert np.allclose(out[0], rgb, atol=1e-6)


def test_raw_flag_skips_conversion():
    """raw=True opts out of the spectral conversion (props.bool_("raw"))."""
    data = np.full((2, 2, 2, 3), 0.4, np.float32)
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "bound": {"type": "cube",
                  "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": {"type": "gridvolume",
                                           "data": data, "raw": True},
                               "albedo": 0.5}},
    }, Variant("spectral"))
    _grid_slot(scene, "gridvolume")
