"""Wavefront MIS path tracer.

Re-design of src/integrators/path.cpp:100-227 as a masked wavefront program:
the bounce loop runs over SoA path state — exactly the masked-lane semantics
the reference's gpu wavefront variants already use (SURVEY §3.2/§3.4), with
XLA fusing everything between intersections.

Structure: the intersection is *deferred to the top of the bounce* (one
`ray_intersect` per iteration serves the hit-processing of this bounce), and
the emitter-hit MIS weight is computed from the previous bounce's carried
(bsdf_pdf, hit point, delta flag) rather than by intersecting ahead
(path.cpp:198-205 moved across the loop edge). Depth is per-lane so the
bounce body can also drive the regenerating lane-pool driver
(integrators.render_wavefront_regen), where lanes sit at different depths.
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
from .volpath import _cond_any, _merge_si, _invalid_si_like


@pytree_dataclass
class _PathState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray  # (...,) bool
    throughput: jnp.ndarray        # (..., nc)
    result: jnp.ndarray            # (..., nc)
    eta: jnp.ndarray               # (...,)
    prev_bsdf_pdf: jnp.ndarray     # (...,) pdf of the bounce that spawned ray
    prev_p: jnp.ndarray            # (..., 3) previous hit point (MIS ref)
    prev_delta: jnp.ndarray        # (...,) bool: last lobe was delta
    valid_ray: jnp.ndarray         # (...,) bool
    depth: jnp.ndarray             # (...,) i32 per lane
    active: jnp.ndarray            # (...,) bool
    n_rays: jnp.ndarray            # () f32 — rays traced (bench accounting)


# path-replay backward support (integrators/replay.py): result/throughput
# carry the analytic cotangents. prev_bsdf_pdf's cross-bounce cotangent is
# dropped — the standard detached-MIS approximation (exact for value-class
# parameters, whose pdfs are parameter-independent).
_REPLAY_OK = True


def _knobs(scene):
    """(max_iterations, bounce kwargs) — the regen-driver contract."""
    cfg = scene.config.integrator
    return cfg.max_depth, dict(max_depth=cfg.max_depth,
                               rr_depth=cfg.rr_depth)


def _init_state(scene, sampler: Sampler, ray: Ray, active=None):
    batch = ray.o.shape[:-1]
    nc = ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    if active is None:
        active = jnp.ones(batch, bool)
    v0 = 0.0 * ray.o[..., 0]
    active = active & (v0 == 0.0)
    return _PathState(
        sampler=sampler, ray=ray,
        si=_invalid_si_like(scene, ray),
        needs_intersection=jnp.ones(batch, bool) & (v0 == 0.0),
        throughput=jnp.ones(batch + (nc,)) + v0[..., None],
        result=jnp.zeros(batch + (nc,)),
        eta=jnp.ones(batch) + v0,
        # prev_delta=True forces em_pdf=0 at the first hit -> weight 1
        # (the emission_weight=1 initialization of path.cpp:118)
        prev_bsdf_pdf=jnp.ones(batch) + v0,
        prev_p=jnp.zeros(batch + (3,)),
        prev_delta=jnp.ones(batch, bool),
        valid_ray=jnp.zeros(batch, bool),
        depth=jnp.zeros(batch, jnp.int32),
        active=active, n_rays=jnp.zeros(()))


def _bounce(scene, s: _PathState, *, max_depth, rr_depth):
    """One masked wavefront bounce (the loop body of path.cpp:100-227)."""
    batch = s.ray.o.shape[:-1]
    nc = s.throughput.shape[-1]
    active = s.active

    # ---- deferred intersection for this bounce's hit ------------------------
    do_isect = s.needs_intersection & active
    si = _cond_any(
        do_isect,
        lambda: _merge_si(ray_intersect(scene.geo, s.ray), s.si, do_isect),
        s.si)
    n_rays = s.n_rays + jnp.sum(do_isect)
    needs_intersection = s.needs_intersection & ~do_isect
    first = do_isect & (s.depth == 0)
    valid_ray = jnp.where(first, si.is_valid, s.valid_ray)

    # ---- emitter hit / environment with carried MIS weight ------------------
    # (path.cpp:128-129 + the :198-205 weight moved across the loop edge)
    escaped = ~si.is_valid
    mis_lanes = active & ~s.prev_delta
    em_pdf = _cond_any(
        mis_lanes,
        lambda: emitters.pdf_emitter_direction(
            scene, s.prev_p, si, escaped, mis_lanes, d=s.ray.d),
        jnp.zeros(batch))
    em_pdf = jnp.where(s.prev_delta, 0.0, em_pdf)
    emission_weight = mis_weight(s.prev_bsdf_pdf, em_pdf)

    hide = scene.config.integrator.hide_emitters & (s.depth == 0)
    hit_emit = active & ~hide
    emit = _cond_any(
        hit_emit,
        lambda: emitters.eval_emitter_hit(scene, si, hit_emit)
        + emitters.eval_environment(scene, s.ray, escaped, hit_emit),
        jnp.zeros(batch + (nc,)))
    result = s.result + emission_weight[..., None] * s.throughput * emit

    active = active & si.is_valid & (s.depth + 1 < max_depth)

    # ---- russian roulette (path.cpp:137-141), detached probability ----------
    smp, rr_sample = s.sampler.next_1d()
    q = jnp.minimum(jnp.max(s.throughput, axis=-1) * s.eta ** 2, 0.95)
    q = jax.lax.stop_gradient(q)
    do_rr = s.depth >= rr_depth
    survive = ~do_rr | (rr_sample < q)
    throughput = jnp.where(do_rr[..., None],
                           s.throughput / jnp.maximum(q, 1e-6)[..., None],
                           s.throughput)
    active = active & survive

    # ---- next-event estimation (path.cpp:151-172) ---------------------------
    smp, s_pick = smp.next_1d()
    smp, s1 = smp.next_1d()
    smp, s2 = smp.next_2d()
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    flags = _tg(scene.bsdf_flags, bsdf_idx)
    is_smooth = (flags & bsdf_flags.Smooth) != 0
    nee_active = active & is_smooth & (scene.config.n_emitters > 0)

    def _nee_block():
        ds, emitter_weight = emitters.sample_emitter_direction(
            scene, si, s_pick, s1, s2, nee_active)
        wo_local = si.to_local(ds.d)
        bsdf_val, bsdf_pdf = bsdfs.bsdf_eval_pdf(scene, bsdf_idx, si,
                                                 wo_local, nee_active)
        mis_pdf = jnp.where(ds.delta, 0.0, bsdf_pdf)
        mis = jnp.where(ds.pdf > 0, mis_weight(ds.pdf, mis_pdf), 0.0)
        return jnp.where(
            nee_active[..., None],
            mis[..., None] * throughput * bsdf_val * emitter_weight, 0.0)

    result = result + _cond_any(nee_active, _nee_block,
                                jnp.zeros(batch + (nc,)))
    n_rays = n_rays + jnp.sum(nee_active)

    # ---- BSDF sampling (path.cpp:177-205) -----------------------------------
    smp, sb1 = smp.next_1d()
    smp, sb2 = smp.next_2d()
    bs, bsdf_weight = _cond_any(
        active,
        lambda: bsdfs.bsdf_sample(scene, bsdf_idx, si, sb1, sb2, active),
        bsdf_flags.zero_bsdf_sample(batch, nc))
    throughput = throughput * jnp.where(active[..., None], bsdf_weight, 1.0)
    eta = jnp.where(active, s.eta * bs.eta, s.eta)
    active = active & jnp.any(throughput > 0, axis=-1) & (bs.pdf > 0)

    wo_world = si.to_world(bs.wo)
    new_ray = si.spawn_ray(wo_world)
    delta_lobe = (bs.sampled_type & bsdf_flags.Delta) != 0

    keep = lambda new, old, m=active: jnp.where(
        m.reshape(m.shape + (1,) * (new.ndim - m.ndim)), new, old)
    ray_out = Ray(o=keep(new_ray.o, s.ray.o), d=keep(new_ray.d, s.ray.d),
                  mint=keep(new_ray.mint, s.ray.mint),
                  maxt=keep(new_ray.maxt, s.ray.maxt),
                  time=s.ray.time, wavelengths=s.ray.wavelengths)
    needs_intersection = needs_intersection | active

    return _PathState(
        sampler=smp, ray=ray_out, si=si,
        needs_intersection=needs_intersection,
        throughput=keep(throughput, s.throughput),
        result=result, eta=eta,
        prev_bsdf_pdf=jnp.where(active, bs.pdf, s.prev_bsdf_pdf),
        prev_p=keep(si.p, s.prev_p),
        prev_delta=jnp.where(active, delta_lobe, s.prev_delta),
        valid_ray=valid_ray,
        depth=s.depth + s.active.astype(jnp.int32),
        active=active, n_rays=n_rays)


def _trace(scene, sampler: Sampler, ray: Ray, active=None):
    """Run the path loop; returns the final state (valid_ray inside)."""
    max_iterations, bkw = _knobs(scene)
    state = _init_state(scene, sampler, ray, active)

    # Static-trip scan instead of while_loop: reverse-differentiable (the
    # backward pass of inverse rendering runs straight through it); dead
    # lanes are masked and all-dead sites are cond-skipped. Rematerialized
    # backward: recompute each bounce from the counter-based RNG keys
    # instead of storing per-bounce residuals — the memory property of the
    # reference's path-replay backprop (SURVEY §5.9) via jax.checkpoint.
    def scan_body(s, _):
        return _bounce(scene, s, **bkw), None

    body = common_remat(scene, scan_body, state.ray.o.shape[:-1],
                        max_iterations)
    final, _ = jax.lax.scan(body, state, None, length=max_iterations)
    return final


def sample(scene, sampler: Sampler, ray: Ray, active=None):
    """Estimate incident radiance along ``ray``. Returns (spec, valid, sampler)."""
    final = _trace(scene, sampler, ray, active)
    return final.result, final.valid_ray, final.sampler


def sample_counted(scene, sampler, ray, active=None):
    """Like sample() but also returns the number of rays traced (bench metric)."""
    final = _trace(scene, sampler, ray, active)
    return final.result, final.valid_ray, final.sampler, final.n_rays
