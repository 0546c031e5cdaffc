"""Texture-weighted blend of two nested BSDFs (reference: src/bsdfs/blendbsdf.cpp).

Row: weight (texture idx), nested0, nested1 (global bsdf indices).
weight = 0 -> first BSDF, 1 -> second (blendbsdf.cpp docs).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

IS_WRAPPER = True
FLAGS = common.All | common.FrontSide | common.BackSide


def build(props, builder):
    from ..scene.build import _build_bsdf
    children = [v for k, v in props.items()
                if isinstance(v, dict) and "type" in v and k != "weight"]
    assert len(children) == 2, "blendbsdf needs exactly two nested bsdfs"
    return {
        "weight": np.int32(builder.texture(props.get("weight", 0.5))),
        "nested0": np.int32(_build_bsdf(builder, children[0])),
        "nested1": np.int32(_build_bsdf(builder, children[1])),
        "twosided": builder.twosided_flag(props),
    }


def _weight(scene, params, slot, si, active):
    w = texture_eval(scene, _tg(params["weight"], slot), si.uv, si.wavelengths,
                     active)
    return jnp.clip(jnp.mean(w, axis=-1), 0.0, 1.0)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    from . import dispatch_sample_nested

    w = _weight(scene, params, slot, si, active)
    sel1 = s1 < w  # second bsdf with probability w
    s1n = jnp.where(sel1, s1 / jnp.maximum(w, 1e-12),
                    (s1 - w) / jnp.maximum(1.0 - w, 1e-12))
    bs0, w0 = dispatch_sample_nested(scene, _tg(params["nested0"], slot), si, s1n,
                                     s2, active & ~sel1, mode)
    bs1, w1 = dispatch_sample_nested(scene, _tg(params["nested1"], slot), si, s1n,
                                     s2, active & sel1, mode)
    bs = common.BSDFSample(
        wo=jnp.where(sel1[..., None], bs1.wo, bs0.wo),
        pdf=jnp.where(sel1, bs1.pdf * w, bs0.pdf * (1.0 - w)),
        eta=jnp.where(sel1, bs1.eta, bs0.eta),
        sampled_type=jnp.where(sel1, bs1.sampled_type, bs0.sampled_type))
    weight = jnp.where(sel1[..., None], w1, w0)
    return bs, jnp.where(active[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    from . import dispatch_eval_pdf_nested

    w = _weight(scene, params, slot, si, active)
    v0, p0 = dispatch_eval_pdf_nested(scene, _tg(params["nested0"], slot), si, wo,
                                      active, mode)
    v1, p1 = dispatch_eval_pdf_nested(scene, _tg(params["nested1"], slot), si, wo,
                                      active, mode)
    value = v0 * (1.0 - w)[..., None] + v1 * w[..., None]
    pdf = p0 * (1.0 - w) + p1 * w
    return value, pdf
