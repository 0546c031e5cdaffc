"""Linear polarizer (reference: src/bsdfs/polarizer.cpp).

A flat, delta-transmissive optical element. In unpolarized variants it
attenuates by transmittance/2 (what an ideal polarizer does to unpolarized
light); the stokes integrator composes its full Mueller matrix
(mueller.h linear_polarizer + rotated_element).
Params: theta (rotation about the normal, degrees), transmittance texture.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mueller as mu
from ..core.gather import table_gather as _tg
from ..render.texture import texture_eval
from . import common

IS_POLARIZED_ELEMENT = True
FLAGS = common.Null | common.FrontSide | common.BackSide


def build(props, builder):
    return {
        "theta": np.float32(np.deg2rad(float(props.get("theta", 0.0)))),
        "transmittance": np.int32(
            builder.texture(props.get("transmittance", 1.0))),
        "twosided": builder.twosided_flag(props),
    }


def _trans(scene, params, slot, si, active):
    return texture_eval(scene, _tg(params["transmittance"], slot), si.uv,
                        si.wavelengths, active)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    batch = si.t.shape
    value = 0.5 * _trans(scene, params, slot, si, active)
    bs = common.BSDFSample(
        wo=-si.wi, pdf=jnp.where(active, 1.0, 0.0),
        eta=jnp.ones(batch),
        sampled_type=jnp.full(batch, FLAGS, jnp.uint32))
    return bs, jnp.where(active[..., None], value, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def eval_null_transmission(scene, params, slot, si, active):
    return jnp.where(active[..., None],
                     0.5 * _trans(scene, params, slot, si, active), 0.0)


def mueller(scene, params, slot, si, active):
    """Element Mueller matrix in the element's own frame (fast axis = the
    element's dp_du rotated by theta)."""
    v = jnp.mean(_trans(scene, params, slot, si, active), axis=-1)
    theta = _tg(params["theta"], slot)
    return mu.rotated_element(theta, mu.linear_polarizer(v))
