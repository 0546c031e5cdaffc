"""Wavefront MIS path tracer.

Re-design of src/integrators/path.cpp:100-227 as a masked wavefront program:
the bounce loop is a ``lax.while_loop`` over SoA path state — exactly the
masked-lane semantics the reference's gpu wavefront variants already use
(SURVEY §3.2/§3.4), with XLA fusing everything between intersections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import bsdfs, emitters
from ..bsdfs import common as bsdf_flags
from ..core.gather import index_channel, table_gather as _tg
from ..core.rng import Sampler
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect
from ..core.ray import Ray
from ..render.records import SurfaceInteraction
from .common import mis_weight


@pytree_dataclass
class _PathState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    throughput: jnp.ndarray        # (..., nc)
    result: jnp.ndarray            # (..., nc)
    eta: jnp.ndarray               # (...,)
    emission_weight: jnp.ndarray   # (...,) MIS weight for next emitter hit
    active: jnp.ndarray            # (...,) bool
    depth: jnp.ndarray             # () i32
    n_rays: jnp.ndarray            # (...,) f32 — traced rays per lane (bench)


def _trace(scene, sampler: Sampler, ray: Ray, active=None):
    """Run the path loop; returns (final_state, valid_ray)."""
    cfg = scene.config.integrator
    batch = ray.o.shape[:-1]
    nc = ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    if active is None:
        active = jnp.ones(batch, bool)

    si = ray_intersect(scene.geo, ray)
    valid_ray = si.is_valid

    # tie constant-initialized carries to the (possibly device-varying under
    # shard_map) ray data so while_loop carry types stay consistent
    v0 = 0.0 * ray.o[..., 0]
    state = _PathState(
        sampler=sampler, ray=ray, si=si,
        throughput=jnp.ones(batch + (nc,)),
        result=jnp.zeros(batch + (nc,)),
        eta=jnp.ones(batch),
        emission_weight=jnp.ones(batch) + v0,
        active=active & (v0 == 0.0),
        depth=jnp.zeros((), jnp.int32),
        n_rays=jnp.ones(batch, jnp.float32) + v0)

    max_depth = cfg.max_depth
    rr_depth = cfg.rr_depth

    def body(s: _PathState):
        si = s.si
        active = s.active

        # ---- emitter hit / environment (path.cpp:128-129) -------------------
        escaped = ~si.is_valid
        hide = scene.config.integrator.hide_emitters & (s.depth == 0)
        emit = emitters.eval_emitter_hit(scene, si, active & ~hide)
        emit = emit + emitters.eval_environment(scene, s.ray, escaped,
                                                active & ~hide)
        result = s.result + s.emission_weight[..., None] * s.throughput * emit

        active = active & si.is_valid & (s.depth + 1 < max_depth)

        # ---- russian roulette (path.cpp:137-141), detached probability ------
        smp, rr_sample = s.sampler.next_1d()
        q = jnp.minimum(jnp.max(s.throughput, axis=-1) * s.eta ** 2, 0.95)
        q = jax.lax.stop_gradient(q)
        do_rr = s.depth >= rr_depth
        survive = ~do_rr | (rr_sample < q)
        throughput = jnp.where(do_rr[..., None] if jnp.ndim(do_rr) else do_rr,
                               s.throughput / jnp.maximum(q, 1e-6)[..., None],
                               s.throughput)
        active = active & survive

        # ---- next-event estimation (path.cpp:151-172) -----------------------
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
        bsdf_val, bsdf_pdf = bsdfs.bsdf_eval_pdf(scene, bsdf_idx, si, wo_local,
                                                 nee_active)
        mis_pdf = jnp.where(ds.delta, 0.0, bsdf_pdf)
        mis = jnp.where(ds.pdf > 0, mis_weight(ds.pdf, mis_pdf), 0.0)
        result = result + jnp.where(
            nee_active[..., None],
            mis[..., None] * throughput * bsdf_val * emitter_weight, 0.0)

        # ---- BSDF sampling (path.cpp:177-205) --------------------------------
        smp, sb1 = smp.next_1d()
        smp, sb2 = smp.next_2d()
        bs, bsdf_weight = bsdfs.bsdf_sample(scene, bsdf_idx, si, sb1, sb2, active)
        throughput = throughput * bsdf_weight
        eta = s.eta * bs.eta
        active = active & jnp.any(throughput > 0, axis=-1) & (bs.pdf > 0)

        wo_world = si.to_world(bs.wo)
        new_ray = si.spawn_ray(wo_world)
        si_next = ray_intersect(scene.geo, new_ray)

        # MIS weight for the next emitter hit: emitter pdf of the direction
        # we just sampled (path.cpp:198-205)
        delta_lobe = (bs.sampled_type & bsdf_flags.Delta) != 0
        em_pdf = emitters.pdf_emitter_direction(
            scene, si.p, si_next, ~si_next.is_valid, active & ~delta_lobe,
            d=wo_world)
        em_pdf = jnp.where(delta_lobe, 0.0, em_pdf)
        emission_weight = mis_weight(bs.pdf, em_pdf)

        # keep dead lanes' state stable
        keep = lambda new, old, m=active: jnp.where(
            m[..., None] if new.ndim > m.ndim else m, new, old)
        ray_out = Ray(o=keep(new_ray.o, s.ray.o), d=keep(new_ray.d, s.ray.d),
                      mint=keep(new_ray.mint, s.ray.mint),
                      maxt=keep(new_ray.maxt, s.ray.maxt),
                      time=s.ray.time, wavelengths=s.ray.wavelengths)
        si_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                active.reshape(active.shape + (1,) * (a.ndim - active.ndim)),
                a, b), si_next, si)

        n_rays = (s.n_rays + nee_active.astype(jnp.float32)
                  + active.astype(jnp.float32))

        return _PathState(
            sampler=smp, ray=ray_out, si=si_out,
            throughput=keep(throughput, s.throughput),
            result=result, eta=keep(eta, s.eta),
            emission_weight=keep(emission_weight, s.emission_weight),
            active=active, depth=s.depth + 1, n_rays=n_rays)

    # Static-trip scan instead of while_loop: reverse-differentiable (the
    # backward pass of inverse rendering runs straight through it) and
    # compiles to a fixed-shape XLA loop; dead lanes are masked. The
    # path-replay custom VJP will later replace full-tape differentiation.
    def scan_body(s, _):
        # body is fully masked, so dead iterations are correct (just wasted
        # lanes); running it unconditionally keeps branch types identical
        # under shard_map's varying-axis tracking.
        return body(s), None

    # rematerialized backward: recompute each bounce from the counter-based
    # RNG keys instead of storing per-bounce residuals — the memory property
    # of the reference's path-replay backprop (SURVEY §5.9) realized with
    # jax.checkpoint (per-bounce state is a pure function of its keys)
    final, _ = jax.lax.scan(jax.checkpoint(scan_body), state, None,
                            length=max_depth)
    return final, valid_ray


def sample(scene, sampler: Sampler, ray: Ray, active=None):
    """Estimate incident radiance along ``ray``. Returns (spec, valid, sampler)."""
    final, valid_ray = _trace(scene, sampler, ray, active)
    return final.result, valid_ray, final.sampler


def sample_counted(scene, sampler, ray, active=None):
    """Like sample() but also returns the number of rays traced (bench metric)."""
    final, valid_ray = _trace(scene, sampler, ray, active)
    return final.result, valid_ray, final.sampler, jnp.sum(final.n_rays)
