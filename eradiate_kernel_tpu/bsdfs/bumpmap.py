"""Bump-map wrapper (reference: src/bsdfs/bumpmap.cpp).

A scalar height texture perturbs the shading normal by its uv-gradient
(finite-differenced at a fixed uv step); the nested BSDF runs in the
perturbed frame. Row: bumpmap (texture idx), scale (f32), nested (bsdf idx).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.frame import Frame
from ..core.math import normalize
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

IS_WRAPPER = True
FLAGS = common.All | common.FrontSide | common.BackSide

_EPS = 1e-3  # uv finite-difference step


def build(props, builder):
    from ..scene.build import _build_bsdf
    child = [v for k, v in props.items()
             if isinstance(v, dict) and "type" in v and k != "bumpmap"]
    assert len(child) == 1, "bumpmap needs exactly one nested bsdf"
    return {
        "bumpmap": np.int32(builder.texture(props.get("bumpmap", 0.0))),
        "scale": np.float32(props.get("scale", 1.0)),
        "nested": np.int32(_build_bsdf(builder, child[0])),
        "twosided": builder.twosided_flag(props),
    }


def _height(scene, params, slot, si_uv, wavelengths, active):
    v = texture_eval(scene, _tg(params["bumpmap"], slot), si_uv, wavelengths, active)
    return jnp.mean(v, axis=-1)


def _perturbed_frame(scene, params, slot, si, active):
    scale = _tg(params["scale"], slot)
    h0 = _height(scene, params, slot, si.uv, si.wavelengths, active)
    hu = _height(scene, params, slot,
                 si.uv + jnp.asarray([_EPS, 0.0]), si.wavelengths, active)
    hv = _height(scene, params, slot,
                 si.uv + jnp.asarray([0.0, _EPS]), si.wavelengths, active)
    du = (hu - h0) / _EPS * scale
    dv = (hv - h0) / _EPS * scale
    # local-frame perturbed normal: n' = normalize([-dh/du, -dh/dv, 1])
    n = normalize(jnp.stack([-du, -dv, jnp.ones_like(du)], -1))
    return Frame.from_normal(n)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    from . import dispatch_sample_nested

    frame = _perturbed_frame(scene, params, slot, si, active)
    si_p = si.replace(wi=frame.to_local(si.wi))
    bs, weight = dispatch_sample_nested(scene, _tg(params["nested"], slot), si_p,
                                        s1, s2, active, mode)
    wo = frame.to_world(bs.wo)
    ok = (wo[..., 2] * bs.wo[..., 2]) > 0.0
    bs = bs.replace(wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0))
    return bs, jnp.where((active & ok)[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    from . import dispatch_eval_pdf_nested

    frame = _perturbed_frame(scene, params, slot, si, active)
    si_p = si.replace(wi=frame.to_local(si.wi))
    wo_p = frame.to_local(wo)
    ok = (wo[..., 2] * wo_p[..., 2]) > 0.0
    v, p = dispatch_eval_pdf_nested(scene, _tg(params["nested"], slot), si_p, wo_p,
                                    active & ok, mode)
    return (jnp.where((active & ok)[..., None], v, 0.0),
            jnp.where(active & ok, p, 0.0))
