"""float64 precision axis (mitsuba.conf.template:57-63 float/double
variants). x64 is a process-global JAX flag, so these run in a
subprocess."""

import os
import subprocess
import sys

import pytest


_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.core.ray import Ray
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.render.geometry import ray_intersect
from eradiate_kernel_tpu.utils.scenes import cornell_box

# 1. the suffix parses and the whole render pipeline runs in f64
assert Variant("rgb_double").dtype == jnp.float64
d = cornell_box(width=8, height=8, spp=16, max_depth=3)
img64 = np.asarray(integrators.render(load_dict(d, Variant("rgb_double")),
                                      seed=1))
assert img64.dtype == np.float64, img64.dtype
img32 = np.asarray(integrators.render(load_dict(d, Variant("rgb")), seed=1))
assert np.allclose(img64, img32, atol=1e-3), np.abs(img64 - img32).max()

# 2. precision gate: intersecting a unit sphere from 1e5 away. The f64
# variant must recover the analytic hit distance far beyond f32 precision
# (this is WHY the double axis exists: planetary-scale Earth-observation
# scene geometry).
D = 1e5
sc64 = load_dict({"type": "scene",
                  "sensor": {"type": "perspective",
                             "film": {"width": 2, "height": 2}},
                  "s": {"type": "sphere", "radius": 1.0}},
                 Variant("rgb_double"))
o = jnp.asarray([[0.0, 0.0, D]], jnp.float64)
dvec = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64)
si64 = ray_intersect(sc64.geo, Ray.make(o, dvec,
                                        wavelengths=jnp.zeros((1, 0))))
err64 = abs(float(si64.t[0]) - (D - 1.0))
sc32 = load_dict({"type": "scene",
                  "sensor": {"type": "perspective",
                             "film": {"width": 2, "height": 2}},
                  "s": {"type": "sphere", "radius": 1.0}}, Variant("rgb"))
si32 = ray_intersect(sc32.geo, Ray.make(o.astype(jnp.float32),
                                        dvec.astype(jnp.float32),
                                        wavelengths=jnp.zeros((1, 0),
                                                              jnp.float32)))
err32 = abs(float(si32.t[0]) - (D - 1.0))
assert err64 < 1e-6, err64
assert err64 < err32 * 1e-2 or err32 < 1e-9, (err64, err32)
print("OK", err32, err64)
"""


def test_double_variant_subprocess():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)),
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "OK" in r.stdout


def test_double_requires_x64():
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.scene import load_dict

    with pytest.raises(RuntimeError, match="x64"):
        load_dict({"type": "scene",
                   "sensor": {"type": "perspective",
                              "film": {"width": 2, "height": 2}}},
                  Variant("rgb_double"))
