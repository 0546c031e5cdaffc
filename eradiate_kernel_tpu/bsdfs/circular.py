"""Circular polarizer (reference: src/bsdfs/circular.cpp)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mueller as mu
from ..core.gather import table_gather as _tg
from . import common

IS_POLARIZED_ELEMENT = True
FLAGS = common.Null | common.FrontSide | common.BackSide


def build(props, builder):
    return {
        "left_handed": np.bool_(props.get("left_handed", False)),
        "twosided": builder.twosided_flag(props),
    }


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    batch = si.t.shape
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    bs = common.BSDFSample(
        wo=-si.wi, pdf=jnp.where(active, 1.0, 0.0), eta=jnp.ones(batch),
        sampled_type=jnp.full(batch, FLAGS, jnp.uint32))
    return bs, jnp.where(active[..., None],
                         jnp.full(batch + (nc,), 0.5), 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def eval_null_transmission(scene, params, slot, si, active):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.where(active[..., None],
                     jnp.full(si.t.shape + (nc,), 0.5), 0.0)


def mueller(scene, params, slot, si, active):
    lh = _tg(params["left_handed"], slot)
    m = jnp.where(lh[..., None, None], mu.left_circular_polarizer(),
                  mu.right_circular_polarizer())
    return m
