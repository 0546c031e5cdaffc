"""BSDF and emitter construction — split out of scene/build.py (kept import-compatible via
re-exports there)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.transform import Transform, as_transform
from .build_spectra import _image_data

def _build_bsdf(builder: SceneBuilder, d, twosided=False):
    from .. import bsdfs as bsdf_pkg

    t = d["type"]
    if t == "ref":
        kind, idx = builder.named[d["id"]]
        assert kind == "bsdf"
        return idx
    if t == "twosided":
        child = [v for k, v in d.items() if isinstance(v, dict) and "type" in v]
        assert len(child) == 1, "twosided needs exactly one nested bsdf"
        return _build_bsdf(builder, child[0], twosided=True)
    mod = bsdf_pkg.REGISTRY[t]
    props = dict(d)
    props["_twosided"] = twosided
    row = mod.build(props, builder)
    return builder.add_bsdf_row(t, row, mod.FLAGS)


def _build_emitter_for_shape(builder: SceneBuilder, d, shape_idx):
    assert d["type"] == "area", f"shape emitter must be 'area', got {d['type']}"
    row = {"radiance": np.int32(builder.texture(d.get("radiance", 1.0), emitter=True)),
           "shape": np.int32(shape_idx)}
    return builder.add_emitter_row("area", row)


def _build_scene_emitter(builder: SceneBuilder, d):
    t = d["type"]
    if t == "constant":
        idx = builder.add_emitter_row("constant", {
            "radiance": np.int32(builder.texture(d.get("radiance", 1.0), emitter=True))})
        builder.env_emitter = idx
        return idx
    if t == "point":
        return builder.add_emitter_row("point", {
            "position": np.asarray(d.get("position", [0, 0, 0]), np.float32),
            "intensity": np.int32(builder.texture(d.get("intensity", 1.0), emitter=True))})
    if t == "directional":
        return builder.add_emitter_row("directional", {
            "direction": np.asarray(d.get("direction", [0, 0, -1]), np.float32),
            "irradiance": np.int32(builder.texture(d.get("irradiance", 1.0), emitter=True))})
    if t == "spot":
        tw = as_transform(d.get("to_world"))
        m = np.asarray(tw.m)
        cutoff = float(d.get("cutoff_angle", 20.0))
        beam = float(d.get("beam_width", cutoff * 0.75))
        return builder.add_emitter_row("spot", {
            "position": np.asarray(d.get("position", m[:3, 3]), np.float32),
            "direction": np.asarray(d.get("direction", m[:3, 2]), np.float32),
            "cos_cutoff": np.float32(np.cos(np.deg2rad(cutoff))),
            "cos_beam": np.float32(np.cos(np.deg2rad(beam))),
            "intensity": np.int32(builder.texture(d.get("intensity", 1.0),
                                                  emitter=True))})
    if t == "projector":
        tw = as_transform(d.get("to_world"))
        w2l = tw.inverse()
        fov = float(d.get("fov", 45.0))
        irr = d.get("irradiance", 1.0)
        data = (np.asarray(irr["data"], np.float32)
                if isinstance(irr, dict) and irr.get("type") == "bitmap"
                else None)
        aspect = (data.shape[1] / data.shape[0]) if data is not None else 1.0
        return builder.add_emitter_row("projector", {
            "position": np.asarray(np.asarray(tw.m)[:3, 3], np.float32),
            "w2l_m": np.asarray(w2l.m, np.float32),
            "w2l_it": np.asarray(w2l.inv_t, np.float32),
            "tan_half_fov": np.float32(np.tan(np.deg2rad(fov) / 2)),
            "aspect": np.float32(aspect),
            "irradiance": np.int32(builder.texture(irr, emitter=True))})
    if t == "envmap":
        data = _image_data(d)  # (H, W, 3) lat-long image
        if data.ndim == 2:
            data = data[..., None].repeat(3, -1)
        scale = float(d.get("scale", 1.0))
        tw = as_transform(d.get("to_world"))
        w2l = tw.inverse()
        H, W = data.shape[:2]
        # vertex convention (envmap.cpp:90,233): texels are bilinear vertex
        # samples; row y sits at theta = y/(H-1)*pi (rows 0/H-1 = poles) and
        # a duplicated wrap column closes the azimuth seam
        img_p = np.concatenate([data, data[:, :1]], axis=1)  # (H, W+1, 3)
        lum = (0.212671 * img_p[..., 0] + 0.715160 * img_p[..., 1]
               + 0.072169 * img_p[..., 2]).astype(np.float64)
        theta_v = np.arange(H) / max(H - 1, 1) * np.pi
        vert = lum * np.sin(theta_v)[:, None]  # sampling density vertices
        from ..core.hierarchical2d import build_hierarchical2d
        h2d = build_hierarchical2d(vert)
        row = {
            "image": img_p,
            "scale": np.float32(scale),
            "w2l_m": np.asarray(w2l.m, np.float32),
            "w2l_it": np.asarray(w2l.inv_t, np.float32)}
        row.update({f"h2d_{k}": v[0] for k, v in h2d.items()})
        if builder.variant.is_spectral:
            # per-texel rgb2spec upsampling (envmap.cpp:69-89): the fit
            # reproduces rgb/spec_scale; eval multiplies the scale back
            from ..utils.rgb2spec import fit_srgb_coeff_batch

            sscale = np.maximum(2.0 * img_p.max(-1), 1e-8)
            row["spec_coeff"] = fit_srgb_coeff_batch(
                (img_p / sscale[..., None]).reshape(-1, 3)
            ).reshape(img_p.shape)
            row["spec_scale"] = sscale.astype(np.float32)
        idx = builder.add_emitter_row("envmap", row)
        builder.env_emitter = idx
        return idx
    from ..emitters import CUSTOM as _custom_emitter
    if t in _custom_emitter:
        return builder.add_emitter_row(t, _custom_emitter[t].build(d, builder))
    raise ValueError(f"unknown emitter type {t!r}")


