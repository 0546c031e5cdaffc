"""Null (passthrough) BSDF for medium boundaries (reference: src/bsdfs/null.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from . import common

FLAGS = common.Null | common.FrontSide | common.BackSide


def build(props, builder):
    return {"twosided": builder.twosided_flag(props)}


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    batch = si.t.shape
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    pdf = jnp.where(active, 1.0, 0.0)
    bs = common.BSDFSample(
        wo=-si.wi, pdf=pdf, eta=jnp.ones(batch),
        sampled_type=jnp.full(batch, FLAGS, jnp.uint32))
    weight = jnp.where(active[..., None], jnp.ones(batch + (nc,)), 0.0)
    return bs, weight


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def eval_null_transmission(scene, params, slot, si, active):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.where(active[..., None], jnp.ones(si.t.shape + (nc,)), 0.0)
