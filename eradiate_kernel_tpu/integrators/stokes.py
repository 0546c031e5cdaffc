"""Stokes-vector integrator (reference: src/integrators/stokes.cpp).

Outputs the polarization state of the camera ray as AOV channels S1..S3
alongside the S0 radiance. Transport model: the camera ray is walked through
consecutive *polarized optical elements* (polarizer / retarder / circular /
null — all delta-transmissive), composing their Mueller matrices with the
proper Stokes-basis rotations (mueller.h rotate_stokes_basis); the first
non-element event (emitter, environment, or any scattering surface) is
treated as an unpolarized source whose S0 radiance comes from the child
integrator evaluated at that point.

This covers the optical-bench validation geometry of the reference's
polarization tests (emitter -> element stack -> sensor; Malus' law, wave
plates) and Stokes output for arbitrary scenes with unpolarized sources.
Full polarized BSDF transport (pplastic, measured_polarized, polarized
Fresnel chains) extends this by composing Mueller matrices at scattering
events too — tracked for a later round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdfs import POLARIZED_ELEMENT_KINDS, REGISTRY
from ..core import mueller as mu
from ..core.gather import table_gather as _tg
from ..core.ray import Ray
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect

MAX_ELEMENTS = 8  # optical elements traversed per camera ray


def aov_names(cfg):
    return ["s1", "s2", "s3"]


def n_aov(cfg):
    return 3


def _child(cfg):
    from . import REGISTRY as INTEGRATORS
    extra = dict(cfg.integrator.extra)
    return INTEGRATORS[extra.get("child", "path")]


@pytree_dataclass
class _State:
    ray: Ray
    m: jnp.ndarray        # (..., 4, 4) accumulated Mueller (ray frame)
    basis: jnp.ndarray    # (..., 3) current Stokes horizontal basis
    active: jnp.ndarray   # still walking through elements


def _element_mueller(scene, si, active):
    """Mueller matrix of the hit element in the element's own frame, or
    identity for plain 'null' BSDFs; also returns whether the hit IS an
    element (static sweep over the polarized kinds present)."""
    cfg = scene.config
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    kind_id = _tg(scene.bsdf_kind, bsdf_idx)
    slot = _tg(scene.bsdf_slot, bsdf_idx)
    batch = si.t.shape
    m = jnp.broadcast_to(jnp.eye(4), batch + (4, 4))
    is_elem = jnp.zeros(batch, bool)
    for k, kind in enumerate(cfg.bsdf_kinds):
        sel = kind_id == k
        if kind in POLARIZED_ELEMENT_KINDS:
            mk = REGISTRY[kind].mueller(scene, scene.bsdfs[kind], slot, si,
                                        active & sel)
            m = jnp.where(sel[..., None, None], mk, m)
            is_elem = is_elem | sel
        elif kind == "null":
            is_elem = is_elem | sel  # identity element
    return m, is_elem & si.is_valid


def sample_aov(scene, sampler, ray, ray_weight, active=None):
    cfg = scene.config
    batch = ray.o.shape[:-1]
    nc = ray.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels

    basis0 = mu.stokes_basis(ray.d)
    state = _State(ray=ray,
                   m=jnp.broadcast_to(jnp.eye(4), batch + (4, 4)) +
                   0.0 * ray.o[..., 0, None, None],
                   basis=basis0,
                   active=jnp.ones(batch, bool) & (ray.o[..., 0] == ray.o[..., 0]))

    def body(s: _State):
        si = ray_intersect(scene.geo, s.ray)
        m_elem, is_elem = _element_mueller(scene, si, s.active)
        walk = s.active & is_elem

        # element frame: horizontal axis = dp_du projected perpendicular to d
        d = s.ray.d
        h = si.dp_du - d * jnp.sum(si.dp_du * d, -1, keepdims=True)
        h_len = jnp.linalg.norm(h, axis=-1, keepdims=True)
        h = jnp.where(h_len > 1e-8, h / jnp.maximum(h_len, 1e-12), s.basis)
        to_elem = mu.rotate_stokes_basis(d, s.basis, h)
        from_elem = mu.rotate_stokes_basis(d, h, s.basis)
        m_new = from_elem @ m_elem @ to_elem @ s.m
        m_out = jnp.where(walk[..., None, None], m_new, s.m)

        new_ray = si.spawn_ray(s.ray.d)
        ray_out = Ray(
            o=jnp.where(walk[..., None], new_ray.o, s.ray.o),
            d=s.ray.d, mint=s.ray.mint, maxt=s.ray.maxt,
            time=s.ray.time, wavelengths=s.ray.wavelengths)
        return _State(ray=ray_out, m=m_out, basis=s.basis, active=walk)

    final, _ = jax.lax.scan(lambda s, _: (body(s), None), state, None,
                            length=MAX_ELEMENTS)

    # unpolarized source radiance at the stack exit via the child integrator
    spec, valid, sampler = _child(cfg).sample(scene, sampler, final.ray)
    s0_in = jnp.mean(spec * ray_weight, axis=-1)  # luminance-ish scalar
    stokes_in = jnp.zeros(batch + (4,)).at[..., 0].set(s0_in)
    stokes = jnp.einsum("...ij,...j->...i", final.m, stokes_in)

    # spectral output: scale the child's spectrum by the Mueller S0 gain
    gain = jnp.where(s0_in > 1e-12, stokes[..., 0] /
                     jnp.maximum(s0_in, 1e-12), final.m[..., 0, 0])
    out_spec = spec * gain[..., None]
    aovs = stokes[..., 1:4]
    return out_spec, valid, sampler, aovs


def sample(scene, sampler, ray, active=None):
    cfg = scene.config
    spec, valid, sampler, _ = sample_aov(scene, sampler, ray,
                                         jnp.ones_like(ray.o[..., :1]),
                                         active)
    return spec, valid, sampler
