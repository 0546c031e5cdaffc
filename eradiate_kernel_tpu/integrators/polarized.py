"""Polarized wavefront MIS path tracer.

The reference's ``*_polarized`` variants re-instantiate the SAME path tracer
with Spectrum = MuellerMatrix<UnpolarizedSpectrum> (SURVEY §1 variant axis;
path.cpp:100-227 with interaction.h:275 to_world_mueller at every scattering
event). Here the Mueller axis is explicit instead of a template: path
throughput is a per-channel (..., nc, 4, 4) matrix stack composed in the
implicit world-space Stokes bases, and the accumulated result is a
(..., nc, 4) Stokes vector in the basis of the camera ray
(stokes_basis(-ray.d), stokes.cpp:95).

Matrix bookkeeping (radiance transport): at vertex k hit by ray_k, light
leaves toward the camera along world(si.wi) = -ray_k.d; the BSDF's Mueller
matrix maps stokes_basis(-wo_world) -> stokes_basis(-ray_k.d), so the path
throughput composes by right-multiplication and emitted light enters as a
depolarized Stokes vector (emitters are unpolarized sources, as in the
reference where `Emitter::eval` returns `unpolarized<Spectrum>`).

Scattering polarimetry comes from `bsdfs.bsdf_eval_mueller` /
`bsdf_sample_mueller`: pplastic / measured_polarized contribute full pBRDF
matrices, smooth conductors contribute complex-Fresnel matrices, optical
elements (polarizer/retarder/circular) compose their element matrices, and
everything else falls back to a depolarizer (diffuse scatterers fully
depolarize — the approximation the reference's unpolarized-only plugins make
via `unpolarized<Spectrum>()`).

Like the Mueller volpath, the bounce loop is exposed through the
regen-driver hooks (_init_state/_bounce/_knobs): pure-surface
``stokes(path)`` renders run on the regenerating lane pool with the
sensor-basis rotation premultiplied into the initial throughput at lane
refill (linearity — see polarized_vol).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdfs, emitters
from ..bsdfs import common as bsdf_flags
from ..core.gather import table_gather as _tg
from ..core.rng import Sampler
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect
from ..core.ray import Ray
from ..render.records import SurfaceInteraction
from .common import mis_weight, remat_scan_body as common_remat
from .volpath import _cond_any, _ungated, _invalid_si_like, _merge_si


@pytree_dataclass
class _PolPathState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray
    throughput_m: jnp.ndarray      # (..., nc, 4, 4) Mueller toward camera
    stokes: jnp.ndarray            # (..., nc, 4) accumulated Stokes vector
    eta: jnp.ndarray
    emission_weight: jnp.ndarray
    valid_ray: jnp.ndarray
    active: jnp.ndarray
    depth: jnp.ndarray             # (...,) i32 — per-lane non-null bounces
    n_rays: jnp.ndarray            # () f32 — rays traced (bench accounting)

    @property
    def result(self):
        """S0 radiance (..., nc) for the film (basis-invariant)."""
        return self.stokes[..., 0]


def _apply_to_stokes0(m, spec):
    """throughput @ (spec, 0, 0, 0): only the first Mueller column acts on a
    depolarized source. m: (..., nc, 4, 4); spec: (..., nc) -> (..., nc, 4)."""
    return m[..., :, 0] * spec[..., None]


def _n_channels(scene, ray):
    return ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels


# extra bounce kwargs the regenerating driver may add on top of _knobs'
# (gate_sites None = platform policy: off on TPU, on on CPU)
_PRIMAL_BOUNCE_KWARGS = {"gate_sites": None}


def _knobs(scene):
    """(max_iterations, bounce kwargs) — the regen-driver contract. The
    iteration allowance beyond max_depth covers depth-free null/element
    traversals (the optical-bench stack's MAX_ELEMENTS = 8)."""
    cfg = scene.config.integrator
    return cfg.max_depth + 8, dict(max_depth=cfg.max_depth,
                                   rr_depth=cfg.rr_depth)


def _init_state(scene, sampler: Sampler, ray: Ray, active=None,
                premultiply_rotation=True):
    """Fresh per-lane Mueller path state. For the regenerating driver the
    sensor-basis rotation (stokes.cpp:89-100) is premultiplied into the
    initial throughput (see polarized_vol._init_state)."""
    batch = ray.o.shape[:-1]
    nc = _n_channels(scene, ray)
    if active is None:
        active = jnp.ones(batch, bool)
    v0 = 0.0 * ray.o[..., 0]
    if premultiply_rotation:
        from .polarized_vol import _sensor_basis_rotation
        rot = _sensor_basis_rotation(scene, ray)
        tp0 = jnp.broadcast_to(rot[..., None, :, :], batch + (nc, 4, 4)) \
            + v0[..., None, None, None]
    else:
        tp0 = jnp.broadcast_to(jnp.eye(4), batch + (nc, 4, 4)) \
            + v0[..., None, None, None]
    return _PolPathState(
        sampler=sampler, ray=ray,
        si=_invalid_si_like(scene, ray),
        needs_intersection=jnp.ones(batch, bool) & (v0 == 0.0),
        throughput_m=tp0,
        stokes=jnp.zeros(batch + (nc, 4)),
        eta=jnp.ones(batch) + v0,
        emission_weight=jnp.ones(batch) + v0,
        valid_ray=jnp.zeros(batch, bool),
        active=active & (v0 == 0.0),
        depth=jnp.zeros(batch, jnp.int32),
        n_rays=jnp.zeros(()))


def _bounce(scene, s: _PolPathState, *, max_depth, rr_depth,
            gate_sites=True, **_unused):
    """One masked wavefront bounce (path.cpp:100-227 under a polarized
    variant). Fresh lanes (needs_intersection) trace their camera ray at
    entry; every bounce ends with the next-vertex intersection (the MIS
    emission weight needs it), so surviving lanes re-enter with
    needs_intersection already False. RNG draw order is identical between
    the scan and regen drivers."""
    ca = _cond_any if gate_sites else _ungated
    # ---- camera-ray intersection for freshly refilled lanes -----------------
    do_isect = s.needs_intersection & s.active
    si = ca(
        do_isect,
        lambda: _merge_si(ray_intersect(scene.geo, s.ray), s.si, do_isect),
        s.si)
    n_rays = s.n_rays + jnp.sum(do_isect)
    valid_ray = s.valid_ray | (do_isect & si.is_valid & (s.depth == 0))
    active = s.active

    # ---- emitter hit / environment: depolarized source ----------------------
    escaped = ~si.is_valid
    hide = scene.config.integrator.hide_emitters & (s.depth == 0)
    # depth counts scattering events only: optical elements and null
    # interfaces pass through without consuming path budget (the
    # element-stack semantics of the optical-bench scenes; volpath
    # treats null boundaries the same way)
    emit = emitters.eval_emitter_hit(scene, si, active & ~hide)
    emit = emit + emitters.eval_environment(scene, s.ray, escaped,
                                            active & ~hide)
    result = s.stokes + s.emission_weight[..., None, None] * \
        _apply_to_stokes0(s.throughput_m, emit)

    active = active & si.is_valid & (s.depth + 1 < max_depth)

    # ---- russian roulette on the S0 gain (detached) --------------------------
    smp, rr_sample = s.sampler.next_1d()
    tp_s0 = s.throughput_m[..., 0, 0]
    q = jnp.minimum(jnp.max(tp_s0, axis=-1) * s.eta ** 2, 0.95)
    q = jax.lax.stop_gradient(q)
    do_rr = s.depth >= rr_depth
    survive = ~do_rr | (rr_sample < q)
    throughput_m = jnp.where(
        do_rr[..., None, None, None] if jnp.ndim(do_rr) else do_rr,
        s.throughput_m / jnp.maximum(q, 1e-6)[..., None, None, None],
        s.throughput_m)
    active = active & survive

    # ---- next-event estimation -----------------------------------------------
    smp, s_pick = smp.next_1d()
    smp, s1 = smp.next_1d()
    smp, s2 = smp.next_2d()
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    flags = _tg(scene.bsdf_flags, bsdf_idx)
    is_smooth = (flags & bsdf_flags.Smooth) != 0
    nee_active = active & is_smooth & (scene.config.n_emitters > 0)
    ds, emitter_weight = emitters.sample_emitter_direction(
        scene, si, s_pick, s1, s2, nee_active)
    wo_local = si.to_local(ds.d)
    bsdf_m, bsdf_pdf = bsdfs.bsdf_eval_mueller(scene, bsdf_idx, si,
                                               wo_local, nee_active)
    mis_pdf = jnp.where(ds.delta, 0.0, bsdf_pdf)
    mis = jnp.where(ds.pdf > 0, mis_weight(ds.pdf, mis_pdf), 0.0)
    nee_m = jnp.einsum("...ij,...jk->...ik", throughput_m, bsdf_m)
    result = result + jnp.where(
        nee_active[..., None, None],
        mis[..., None, None] * _apply_to_stokes0(nee_m, emitter_weight),
        0.0)

    # ---- BSDF sampling -------------------------------------------------------
    smp, sb1 = smp.next_1d()
    smp, sb2 = smp.next_2d()
    bs, weight_m = bsdfs.bsdf_sample_mueller(scene, bsdf_idx, si, sb1,
                                             sb2, active)
    throughput_m = jnp.einsum("...ij,...jk->...ik", throughput_m,
                              weight_m)
    eta = s.eta * bs.eta
    active = active & (jnp.max(throughput_m[..., 0, 0], axis=-1) > 0) \
        & (bs.pdf > 0)
    null_event = (bs.sampled_type & bsdf_flags.Null) != 0

    wo_world = si.to_world(bs.wo)
    new_ray = si.spawn_ray(wo_world)
    si_next = ca(
        active,
        lambda: _merge_si(ray_intersect(scene.geo, new_ray), si, active),
        si)
    n_rays = n_rays + jnp.sum(active)

    delta_lobe = (bs.sampled_type & bsdf_flags.Delta) != 0
    em_pdf = emitters.pdf_emitter_direction(
        scene, si.p, si_next, ~si_next.is_valid, active & ~delta_lobe,
        d=wo_world)
    em_pdf = jnp.where(delta_lobe, 0.0, em_pdf)
    emission_weight = mis_weight(bs.pdf, em_pdf)

    keep = lambda new, old, m=active: jnp.where(
        m.reshape(m.shape + (1,) * (new.ndim - m.ndim)), new, old)
    ray_out = Ray(o=keep(new_ray.o, s.ray.o), d=keep(new_ray.d, s.ray.d),
                  mint=keep(new_ray.mint, s.ray.mint),
                  maxt=keep(new_ray.maxt, s.ray.maxt),
                  time=s.ray.time, wavelengths=s.ray.wavelengths)
    si_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            active.reshape(active.shape + (1,) * (a.ndim - active.ndim)),
            a, b), si_next, si)

    return _PolPathState(
        sampler=smp, ray=ray_out, si=si_out,
        needs_intersection=s.needs_intersection & ~do_isect,
        throughput_m=keep(throughput_m, s.throughput_m),
        stokes=result, eta=keep(eta, s.eta),
        emission_weight=keep(emission_weight, s.emission_weight),
        valid_ray=valid_ray,
        active=active,
        depth=s.depth + jnp.where(active & ~null_event, 1, 0),
        n_rays=n_rays)


def sample_stokes(scene, sampler: Sampler, ray: Ray, active=None):
    """Full polarized transport (fixed-trip scan driver). Returns (stokes
    (..., nc, 4) in the RAY's implicit basis, valid, sampler);
    stokes[..., 0] is the radiance spectrum. The stokes wrapper applies the
    sensor-basis rotation."""
    max_iterations, bkw = _knobs(scene)
    state = _init_state(scene, sampler, ray, active,
                        premultiply_rotation=False)

    def scan_body(s, _):
        return _bounce(scene, s, **bkw), None

    body_fn = common_remat(scene, scan_body, ray.o.shape[:-1],
                           max_iterations)
    final, _ = jax.lax.scan(body_fn, state, None,
                            length=max_iterations)
    return final.stokes, final.valid_ray, final.sampler
