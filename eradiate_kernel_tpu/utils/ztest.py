"""Statistical image-regression harness (reference:
src/librender/tests/test_renders.py:64-133).

A scene is rendered with the ``moment`` wrapper capturing per-pixel second
moments; a per-pixel Z-test against a stored reference mean+variance with
Šidák-corrected significance decides pass/fail. Reference data is generated
by this same harness at a high sample budget (the reference repo's
resources/data submodule is empty, so references are regenerated here too).
"""

from __future__ import annotations

import os

import numpy as np

from .. import integrators
from ..scene import load_dict


def render_with_variance(scene_dict, variant=None, spp=None, seed=0):
    """Render mean image + per-pixel variance of the mean via the moment
    integrator. Returns (mean (H,W,3) XYZ, var_of_mean (H,W,3), n)."""
    d = dict(scene_dict)
    child = d["integrator"] if d["integrator"].get("type") != "moment" \
        else dict(d["integrator"]).get("child", {"type": "path"})
    d["integrator"] = {"type": "moment", "child": child}
    scene = load_dict(d, variant)
    spp = spp or scene.config.spp
    film = np.asarray(integrators.render(scene, seed=seed, spp=spp,
                                         develop_film=False))
    w = np.maximum(film[..., 4:5], 1e-12)
    mean = film[..., 0:3] / w
    m2 = film[..., 5:8] / w
    var = np.maximum(m2 - mean ** 2, 0.0)
    n = w[..., 0]
    return mean, var / np.maximum(n[..., None], 1.0), n


def sidak_alpha(alpha, n_tests):
    return 1.0 - (1.0 - alpha) ** (1.0 / n_tests)


def z_test(mean, var_of_mean, ref_mean, ref_var_of_mean, alpha=0.01,
           min_pass=0.9975):
    """Per-pixel two-sample Z-test (test_renders.py:112-133). Returns
    (ok, pass_fraction, p_values)."""
    from jax.scipy.special import erf
    import jax.numpy as jnp

    diff = np.abs(mean - ref_mean)
    sigma = np.sqrt(var_of_mean + ref_var_of_mean)
    # pixels with ~zero variance on both sides: compare directly
    degenerate = sigma < 1e-12
    z = diff / np.maximum(sigma, 1e-12)
    p = 1.0 - np.asarray(erf(jnp.asarray(z / np.sqrt(2.0))))
    p = np.where(degenerate, np.where(diff < 1e-6, 1.0, 0.0), p)
    a = sidak_alpha(alpha, p.size)
    passed = (p > a) | (diff < 5e-4)
    frac = float(passed.mean())
    return frac >= min_pass, frac, p


def check_scene(scene_dict, ref_dir, name, variant=None, spp=64,
                ref_spp=512, alpha=0.01, min_pass=0.9975,
                regenerate=False):
    """Compare a render of ``scene_dict`` against the stored reference,
    generating the reference (mean + variance EXRs) when missing."""
    from .bitmap import read_exr, write_exr

    os.makedirs(ref_dir, exist_ok=True)
    mean_path = os.path.join(ref_dir, f"{name}_mean.exr")
    var_path = os.path.join(ref_dir, f"{name}_var.exr")
    if regenerate or not os.path.exists(mean_path):
        ref_mean, ref_var, _ = render_with_variance(
            scene_dict, variant, spp=ref_spp, seed=1234)
        write_exr(mean_path, ref_mean)
        write_exr(var_path, ref_var)
    ref_mean = read_exr(mean_path)[0]
    ref_var = read_exr(var_path)[0]
    mean, var, _ = render_with_variance(scene_dict, variant, spp=spp, seed=7)
    return z_test(mean, var, ref_mean, ref_var, alpha, min_pass)
