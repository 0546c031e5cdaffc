"""Opacity mask wrapper (reference: src/bsdfs/mask.cpp).

With probability ``opacity`` the nested BSDF acts; otherwise the surface is
passed through unscattered (null transmission). Row: opacity (texture idx),
nested (global bsdf idx).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

IS_WRAPPER = True
FLAGS = common.All | common.Null | common.FrontSide | common.BackSide


def build(props, builder):
    from ..scene.build import _build_bsdf
    child = [v for k, v in props.items()
             if isinstance(v, dict) and "type" in v and k != "opacity"]
    assert len(child) == 1, "mask needs exactly one nested bsdf"
    nested = _build_bsdf(builder, child[0])
    return {
        "opacity": np.int32(builder.texture(props.get("opacity", 0.5))),
        "nested": np.int32(nested),
        "twosided": builder.twosided_flag(props),
    }


def _opacity(scene, params, slot, si, active):
    op = texture_eval(scene, _tg(params["opacity"], slot), si.uv, si.wavelengths,
                      active)
    return jnp.clip(jnp.mean(op, axis=-1), 0.0, 1.0)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    from . import dispatch_sample_nested

    op = _opacity(scene, params, slot, si, active)
    sel_nested = s1 < op
    # renormalize the lobe-selection sample for the nested BSDF (mask.cpp)
    s1n = jnp.where(sel_nested, s1 / jnp.maximum(op, 1e-12),
                    (s1 - op) / jnp.maximum(1.0 - op, 1e-12))
    nested = _tg(params["nested"], slot)
    bs_n, w_n = dispatch_sample_nested(scene, nested, si, s1n, s2,
                                       active & sel_nested, mode)
    batch = si.t.shape
    pass_pdf = 1.0 - op
    bs = common.BSDFSample(
        wo=jnp.where(sel_nested[..., None], bs_n.wo, -si.wi),
        pdf=jnp.where(sel_nested, bs_n.pdf * op, pass_pdf),
        eta=jnp.where(sel_nested, bs_n.eta, jnp.ones(batch)),
        sampled_type=jnp.where(
            sel_nested, bs_n.sampled_type,
            jnp.full(batch, common.Null | common.FrontSide | common.BackSide,
                     jnp.uint32)))
    weight = jnp.where(sel_nested[..., None], w_n, 1.0)
    weight = jnp.where(active[..., None], weight, 0.0)
    return bs, weight


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    from . import dispatch_eval_pdf_nested

    op = _opacity(scene, params, slot, si, active)
    nested = _tg(params["nested"], slot)
    v, p = dispatch_eval_pdf_nested(scene, nested, si, wo, active, mode)
    return v * op[..., None], p * op


def eval_null_transmission(scene, params, slot, si, active):
    op = _opacity(scene, params, slot, si, active)
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.where(active[..., None],
                     jnp.broadcast_to((1.0 - op)[..., None],
                                      si.t.shape + (nc,)), 0.0)
