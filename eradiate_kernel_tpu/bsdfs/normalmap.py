"""Normal-map wrapper (reference: src/bsdfs/normalmap.cpp).

A tangent-space normal map (rgb in [0,1], +z up) perturbs the shading frame;
the nested BSDF is evaluated in the perturbed frame. Row: normalmap (texture
idx, raw rgb), nested (global bsdf idx).
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


def build(props, builder):
    from ..scene.build import _build_bsdf
    child = [v for k, v in props.items()
             if isinstance(v, dict) and v.get("type") not in ("bitmap",)
             and "type" in v]
    assert len(child) == 1, "normalmap needs exactly one nested bsdf"
    tex = props.get("normalmap", [0.5, 0.5, 1.0])
    return {
        "normalmap": np.int32(builder.texture(tex)),
        "nested": np.int32(_build_bsdf(builder, child[0])),
        "twosided": builder.twosided_flag(props),
    }


def _perturbed_frame(scene, params, slot, si, active):
    rgb = texture_eval(scene, _tg(params["normalmap"], slot), si.uv,
                       si.wavelengths, active)
    # pad mono variants to 3 channels
    if rgb.shape[-1] < 3:
        rgb = jnp.concatenate(
            [rgb[..., :1], rgb[..., :1] * 0 + 0.5, rgb[..., :1] * 0 + 1.0], -1)
    n = normalize(2.0 * rgb[..., :3] - 1.0)
    return Frame.from_normal(n)


def _to_perturbed(frame, v):
    return frame.to_local(v)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    from . import dispatch_sample_nested

    frame = _perturbed_frame(scene, params, slot, si, active)
    si_p = si.replace(wi=_to_perturbed(frame, si.wi))
    bs, weight = dispatch_sample_nested(scene, _tg(params["nested"], slot), si_p,
                                        s1, s2, active, mode)
    wo = frame.to_world(bs.wo)
    # reject samples that leak through the true surface
    ok = (wo[..., 2] * bs.wo[..., 2]) > 0.0
    bs = bs.replace(wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0))
    return bs, jnp.where((active & ok)[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    from . import dispatch_eval_pdf_nested

    frame = _perturbed_frame(scene, params, slot, si, active)
    si_p = si.replace(wi=_to_perturbed(frame, si.wi))
    wo_p = _to_perturbed(frame, wo)
    ok = (wo[..., 2] * wo_p[..., 2]) > 0.0
    v, p = dispatch_eval_pdf_nested(scene, _tg(params["nested"], slot), si_p, wo_p,
                                    active & ok, mode)
    return (jnp.where((active & ok)[..., None], v, 0.0),
            jnp.where(active & ok, p, 0.0))
