"""Null-scattering volumetric path tracer with full spectral MIS bookkeeping.

Counterpart of src/integrators/volpathmis.cpp. Instead of dividing by the
hero channel's pdf at every event (volpath's ratio estimator), a *weight
matrix* ``pf[i][j] = (prod of pdfs had channel j driven sampling) / (prod of
f for channel i)`` is carried along the path and updated at every sampling
event (volpathmis.cpp:447-467 ``update_weights``: pf[i][j] *= p[j]/f[i],
non-finite scrubbed). Contributions use the balance heuristic across channel
strategies (volpathmis.cpp:469-499):

    single strategy: w[i] = n / sum_j pf[i][j]
    two strategies:  w[i] = n / sum_j (pf1 + pf2)[i][j]

Event-by-event updates mirror the reference exactly:
  RR                   pf      *= (q, 1)                       (:140)
  free flight          pf, nee *= (ff_pdf, tr)                 (:177-178)
  null collision       pf *= (sigma_n/ce, sigma_n); nee *= (1, sigma_n)  (:203-204)
  real scatter         pf *= (sigma_t/ce, sigma_s); nee reset = pf       (:218,237)
  phase sample         pf *= (p, p); nee *= (1, p)             (:247-248)
  bsdf sample          nee reset = pf (non-null); pf *= (pdf, f);
                       nee *= (1, f)                           (:317-319)
  emitter hit (bsdf)   nee *= (emitter_pdf, 1); contrib =
                       mis(pf) or mis(pf, nee)                 (:272-276)
  NEE walk             seeds nee' = pf, uni' = pf; nee' *= (ds.pdf, 1);
                       walk updates both; at the end
                       nee' *= (1, f); uni' *= (p_competing, f);
                       contrib = mis(nee', uni') * emitted     (:229-233,289-295)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdfs, emitters, media, phase
from ..bsdfs import common as bsdf_flags
from ..core.gather import index_channel, table_gather as _tg
from ..core.math import INVALID_T, RayEpsilon
from ..core.ray import Ray
from ..core.rng import Sampler
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect
from ..render.records import SurfaceInteraction
from .common import remat_scan_body as common_remat
from .volpath import (_cond_any, _eval_null_transmission, _invalid_mi,
                      _invalid_si_like, _is_medium_transition, _medium_phase,
                      _merge_si, _pseudo_si, _target_medium)


def _update(pf, p, f, active):
    """pf[i][j] *= p[j] / f[i] on active lanes (update_weights)."""
    ratio = p[..., None, :] / f[..., :, None]
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
    out = pf * ratio
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return jnp.where(active[..., None, None], out, pf)


def _bcast(x, nc):
    """Scalar-per-lane quantity -> (..., nc) spectrum."""
    return jnp.broadcast_to(x[..., None], x.shape + (nc,))


def _mis1(pf):
    nc = pf.shape[-1]
    s = jnp.sum(pf, axis=-1)
    return jnp.where(s == 0, 0.0, nc / jnp.where(s == 0, 1.0, s))


def _mis2(pf1, pf2):
    nc = pf1.shape[-1]
    s = jnp.sum(pf1 + pf2, axis=-1)
    return jnp.where(s == 0, 0.0, nc / jnp.where(s == 0, 1.0, s))


# =============================================================================
# NEE with matrix-carrying transmittance walk (volpathmis.cpp:332-444)
# =============================================================================

@pytree_dataclass
class _WalkState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    pf_nee: jnp.ndarray
    pf_uni: jnp.ndarray
    total_dist: jnp.ndarray
    active: jnp.ndarray


def _sample_emitter_mis(scene, ref_p, ref_n, is_medium_ref, wavelengths, time,
                        medium_idx, channel, sampler, pf, active, nee_steps):
    """Returns (pf_nee_end, pf_uni_end, emitter_val, ds, sampler)."""
    batch = ref_p.shape[:-1]
    nc = wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels

    sampler, s_pick = sampler.next_1d()
    sampler, s1 = sampler.next_1d()
    sampler, s2 = sampler.next_2d()

    ref_si = _pseudo_si(ref_p, ref_n, wavelengths, time)
    ds, emitter_val = emitters.sample_emitter_direction(
        scene, ref_si, s_pick, s1, s2, active, test_visibility=False)
    active = active & (ds.pdf > 0)
    # the kind samplers return value/pdf; recover the raw emitter value —
    # the pdf enters through the weight matrix instead (sample_emitter :340)
    emitter_val = jnp.where(active[..., None],
                            emitter_val * ds.pdf[..., None], 0.0)
    pf_nee = _update(pf, _bcast(ds.pdf, nc), jnp.ones(batch + (nc,)), active)
    pf_uni = pf

    eps_n = jnp.where(is_medium_ref[..., None], 0.0, 1.0)
    scale = 1.0 + jnp.max(jnp.abs(ref_p), axis=-1)
    sgn = jnp.where(jnp.sum(ref_n * ds.d, -1) >= 0, 1.0, -1.0)
    o = ref_p + eps_n * (RayEpsilon * scale * sgn)[..., None] * ref_n
    ray = Ray(o=o, d=ds.d, mint=jnp.zeros(batch),
              maxt=jnp.full(batch, INVALID_T), time=time,
              wavelengths=wavelengths)

    state = _WalkState(
        sampler=sampler, ray=ray, si=_invalid_si_like(scene, ray),
        needs_intersection=jnp.ones(batch, bool),
        medium_idx=medium_idx, pf_nee=pf_nee, pf_uni=pf_uni,
        total_dist=jnp.zeros(batch), active=active)

    def body(s: _WalkState):
        remaining = jnp.clip(ds.dist * (1.0 - 1e-4) - s.total_dist,
                             0.0, INVALID_T)
        ray = s.ray.replace(maxt=remaining)
        active = s.active & (remaining > 0)

        active_medium = active & (s.medium_idx >= 0)
        active_surface = active & ~active_medium
        smp = s.sampler

        med = jnp.maximum(s.medium_idx, 0)
        smp, xi = smp.next_1d()
        mi = media.sample_interaction(scene, med, ray, xi, channel,
                                      active_medium)
        intersect = s.needs_intersection & active_medium
        si = _merge_si(ray_intersect(scene.geo, ray), s.si, intersect)
        needs_intersection = s.needs_intersection & ~active_medium
        mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t),
                                    INVALID_T, mi.t))

        # free-flight transmittance (volpathmis.cpp:370-381); profile-
        # flight lanes rebuild the exact inhomogeneous optical depth
        tr, ff_pdf = media.eval_tr_and_pdf(mi, jnp.minimum(si.t, remaining))
        pf_nee = _update(s.pf_nee, ff_pdf, tr, active_medium)
        pf_uni = _update(s.pf_uni, ff_pdf, tr, active_medium)

        total_dist = jnp.where(active_medium & (mi.t > remaining)
                               & mi.is_valid, ds.dist, s.total_dist)
        mi = mi.replace(t=jnp.where(active_medium & (mi.t > remaining),
                                    INVALID_T, mi.t))
        escaped_medium = active_medium & ~mi.is_valid
        active_medium = active_medium & mi.is_valid
        total_dist = jnp.where(active_medium, total_dist + mi.t, total_dist)

        # null collision (volpathmis.cpp:400-401)
        pf_nee = _update(pf_nee, jnp.ones_like(mi.sigma_n), mi.sigma_n,
                         active_medium)
        pf_uni = _update(pf_uni,
                         mi.sigma_n / jnp.maximum(mi.combined_extinction,
                                                  1e-20),
                         mi.sigma_n, active_medium)
        ray = ray.replace(
            o=jnp.where(active_medium[..., None], mi.p, ray.o),
            mint=jnp.where(active_medium, 0.0, ray.mint))
        si = si.replace(t=jnp.where(active_medium, si.t - mi.t, si.t))

        intersect2 = active_surface & needs_intersection
        si = _merge_si(ray_intersect(scene.geo, ray), si, intersect2)
        needs_intersection = needs_intersection & ~intersect2
        active_surface = active_surface | escaped_medium
        total_dist = jnp.where(active_surface, total_dist + si.t, total_dist)

        active_surface = active_surface & si.is_valid & active & ~active_medium
        null_tr = _eval_null_transmission(scene, si, ray, active_surface)
        pf_nee = _update(pf_nee, jnp.ones_like(null_tr), null_tr,
                         active_surface)
        pf_uni = _update(pf_uni, jnp.ones_like(null_tr), null_tr,
                         active_surface)

        new_ray = si.spawn_ray(ray.d)
        ray = Ray(o=jnp.where(active_surface[..., None], new_ray.o, ray.o),
                  d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
                  maxt=remaining, time=ray.time, wavelengths=ray.wavelengths)
        needs_intersection = needs_intersection | active_surface

        alive = jnp.any(_mis1(pf_uni) != 0, -1) \
            | jnp.any(jnp.sum(pf_nee, -1) != 0, -1)
        active = (active_medium | active_surface) & alive

        has_trans = active_surface & _is_medium_transition(scene, si)
        medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                               s.medium_idx)
        return _WalkState(sampler=smp, ray=ray, si=si,
                          needs_intersection=needs_intersection,
                          medium_idx=medium_idx, pf_nee=pf_nee,
                          pf_uni=pf_uni, total_dist=total_dist,
                          active=active)

    from .volpath import match_dtypes

    final, _ = jax.lax.scan(lambda s, _: (match_dtypes(body(s), s), None),
                            state, None, length=nee_steps)
    # unconverged lanes contribute nothing (conservative)
    emitter_val = jnp.where(final.active[..., None], 0.0, emitter_val)
    return final.pf_nee, final.pf_uni, emitter_val, ds, final.sampler


# =============================================================================
# main loop (volpathmis.cpp:100-330)
# =============================================================================

@pytree_dataclass
class _State:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    pf: jnp.ndarray        # (..., nc, nc)
    pf_nee: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray
    channel: jnp.ndarray
    specular_chain: jnp.ndarray
    last_scatter_p: jnp.ndarray   # (..., 3) last real scatter vertex
    valid_ray: jnp.ndarray
    active: jnp.ndarray
    n_rays: jnp.ndarray  # () f32 — rays traced (bench accounting)


def _knobs(scene):
    """(max_iterations, bounce kwargs) — the regen-driver contract."""
    cfg = scene.config.integrator
    extra = dict(cfg.extra)
    max_iterations = int(extra.get("max_iterations", cfg.max_depth + 8))
    nee_steps = int(extra.get("nee_steps", 8))
    return max_iterations, dict(nee_steps=nee_steps, max_depth=cfg.max_depth,
                                rr_depth=cfg.rr_depth)


def _init_state(scene, sampler: Sampler, ray: Ray, active=None,
                medium_idx=None):
    """Fresh per-lane path state (the pre-loop section of
    volpathmis.cpp:100-133)."""
    cfg = scene.config.integrator
    batch = ray.o.shape[:-1]
    nc = ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    if active is None:
        active = jnp.ones(batch, bool)
    v0 = 0.0 * ray.o[..., 0]
    active = active & (v0 == 0.0)
    if medium_idx is None:
        medium_idx = jnp.full(batch, scene.config.sensor_medium, jnp.int32)

    # the balance heuristic across channel strategies assumes the driving
    # channel is drawn uniformly (one-sample MIS); hero wavelengths are
    # already exchangeable so spectral mode keeps channel 0
    if scene.config.variant.mode == "rgb":
        sampler, cs = sampler.next_1d()
        channel = jnp.minimum((cs * 3).astype(jnp.int32), 2)
    else:
        channel = jnp.zeros(batch, jnp.int32)

    hide = cfg.hide_emitters
    ones = jnp.ones(batch + (nc, nc)) + v0[..., None, None]
    return _State(
        sampler=sampler, ray=ray, si=_invalid_si_like(scene, ray),
        needs_intersection=jnp.ones(batch, bool) & (v0 == 0.0),
        medium_idx=medium_idx + (0 * v0).astype(jnp.int32),
        pf=ones, pf_nee=ones,
        result=jnp.zeros(batch + (nc,)),
        eta=jnp.ones(batch) + v0,
        depth=jnp.zeros(batch, jnp.int32),
        channel=channel,
        specular_chain=active & (not hide),
        last_scatter_p=ray.o,
        valid_ray=jnp.full(batch, (not hide)
                           and scene.config.env_emitter >= 0) & (v0 == 0.0),
        active=active, n_rays=jnp.zeros(()))


def _bounce(scene, s: _State, *, nee_steps, max_depth, rr_depth):
    """One masked wavefront bounce (volpathmis.cpp:134-330). Module-level
    so both the fixed-trip tracer and the regenerating driver can drive
    it."""
    cfg = scene.config.integrator
    batch = s.ray.o.shape[:-1]
    nc = s.result.shape[-1]
    smp = s.sampler
    active = s.active
    ray = s.ray
    si = s.si
    result = s.result
    pf = s.pf
    pf_nee = s.pf_nee

    # --- russian roulette (:134-146) --------------------------------------
    mis_tp = _mis1(pf)
    q = jax.lax.stop_gradient(
        jnp.clip(jnp.minimum(jnp.max(mis_tp, -1) * s.eta ** 2, 0.95),
                 0.05, 1.0))
    perform_rr = s.depth > rr_depth
    smp, xi_rr = smp.next_1d()
    active = active & ((xi_rr < q) | ~perform_rr)
    pf = _update(pf, _bcast(q, nc), jnp.ones(batch + (nc,)),
                 active & perform_rr)
    active = active & jnp.any(_mis1(pf) != 0, -1)

    active_medium = active & (s.medium_idx >= 0)
    active_surface = active & ~active_medium

    # --- medium sampling (:160-220); ONE cond-gated intersection serves
    # both the (disjoint) medium and surface lane sets, volpath-style -------
    med = jnp.maximum(s.medium_idx, 0)
    smp, xi_m = smp.next_1d()
    mi = _cond_any(
        active_medium,
        lambda: media.sample_interaction(scene, med, ray, xi_m, s.channel,
                                         active_medium),
        _invalid_mi(batch, nc))
    do_isect = s.needs_intersection & (active_medium | active_surface)
    si = _cond_any(
        do_isect,
        lambda: _merge_si(ray_intersect(scene.geo, ray), si, do_isect),
        si)
    needs_intersection = s.needs_intersection & ~do_isect
    n_rays = s.n_rays + jnp.sum(do_isect)
    mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t),
                                INVALID_T, mi.t))

    tr, ff_pdf = media.eval_tr_and_pdf(mi, si.t)
    pf = _update(pf, ff_pdf, tr, active_medium)
    pf_nee = _update(pf_nee, ff_pdf, tr, active_medium)

    escaped_medium = active_medium & ~mi.is_valid
    active_medium = active_medium & mi.is_valid

    smp, xi_n = smp.next_1d()
    p_real_c = jax.lax.stop_gradient(
        index_channel(mi.sigma_t, s.channel)
        / jnp.maximum(index_channel(mi.combined_extinction, s.channel),
                      1e-20))
    null_scatter = xi_n >= p_real_c
    act_null = null_scatter & active_medium
    act_scatter = ~null_scatter & active_medium

    ce = jnp.maximum(mi.combined_extinction, 1e-20)
    pf = _update(pf, mi.sigma_n / ce, mi.sigma_n, act_null)
    pf_nee = _update(pf_nee, jnp.ones_like(mi.sigma_n), mi.sigma_n,
                     act_null)
    pf = _update(pf, mi.sigma_t / ce, mi.sigma_s, act_scatter)

    depth = s.depth + act_scatter.astype(jnp.int32)
    active = active & (depth < max_depth)
    act_scatter = act_scatter & active

    ray = ray.replace(
        o=jnp.where(act_null[..., None], mi.p, ray.o),
        mint=jnp.where(act_null, 0.0, ray.mint))
    si = si.replace(t=jnp.where(act_null, si.t - mi.t, si.t))

    valid_ray = s.valid_ray | act_scatter
    specular_chain = s.specular_chain & ~act_scatter
    last_scatter_p = jnp.where(act_scatter[..., None], mi.p,
                               s.last_scatter_p)

    # real scatter: reset pf_nee (:237)
    pf_nee = jnp.where(act_scatter[..., None, None], pf, pf_nee)

    phase_idx = _medium_phase(scene, s.medium_idx)

    # medium NEE (:226-233)
    pf_nee_end, pf_uni_end, emitted, ds_m, smp = _sample_emitter_mis(
        scene, mi.p, -ray.d, jnp.ones_like(act_scatter), ray.wavelengths,
        ray.time, s.medium_idx, s.channel, smp, pf, act_scatter,
        nee_steps)
    phase_val = phase.phase_eval(scene, phase_idx, -ray.d, ds_m.d,
                                 act_scatter)
    pv = _bcast(phase_val, nc)
    pf_nee_end = _update(pf_nee_end, jnp.ones_like(pv), pv, act_scatter)
    pf_uni_end = _update(
        pf_uni_end, jnp.where(ds_m.delta[..., None], 0.0, pv), pv,
        act_scatter)
    result = result + jnp.where(
        act_scatter[..., None],
        _mis2(pf_nee_end, pf_uni_end) * emitted, 0.0)

    # phase sampling (:240-248)
    smp, xi_p1 = smp.next_1d()
    smp, xi_p2 = smp.next_2d()
    wo_m, ppdf = phase.phase_sample(scene, phase_idx, ray.d, xi_p1,
                                    xi_p2, act_scatter)
    pp = _bcast(ppdf, nc)
    pf = _update(pf, pp, pp, act_scatter)
    pf_nee = _update(pf_nee, jnp.ones_like(pp), pp, act_scatter)
    ray = Ray(
        o=jnp.where(act_scatter[..., None], mi.p, ray.o),
        d=jnp.where(act_scatter[..., None], wo_m, ray.d),
        mint=jnp.where(act_scatter, 0.0, ray.mint),
        maxt=jnp.where(act_scatter, INVALID_T, ray.maxt),
        time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | act_scatter

    # --- surface (:255-330; si fresh from the merged intersect) -------------
    active_surface = active_surface | escaped_medium

    # emitter hits count every iteration; MIS weights absorb the NEE
    # overlap (volpathmis.cpp:262-276). count_direct = camera ray or
    # pure-specular chain -> single-strategy weight.
    em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
    hit_area = active_surface & si.is_valid & (em_idx >= 0)
    hit_env = active_surface & ~si.is_valid \
        & (scene.config.env_emitter >= 0)
    active_e = hit_area | hit_env
    if cfg.hide_emitters:
        active_e = active_e & (s.depth > 0)
    count_direct = (s.depth == 0) | specular_chain
    e_val = emitters.eval_emitter_hit(scene, si, active_e & hit_area) \
        + emitters.eval_environment(scene, ray, ~si.is_valid,
                                    active_e & hit_env)
    epdf = emitters.pdf_emitter_direction(
        scene, last_scatter_p, si, ~si.is_valid,
        active_e & ~count_direct, d=ray.d)
    pf_nee_hit = _update(pf_nee, _bcast(epdf, nc),
                         jnp.ones(batch + (nc,)),
                         active_e & ~count_direct)
    contrib = jnp.where(count_direct[..., None],
                        _mis1(pf) * e_val,
                        _mis2(pf, pf_nee_hit) * e_val)
    result = result + jnp.where(active_e[..., None], contrib, 0.0)

    active_surface = active_surface & si.is_valid
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    flags = _tg(scene.bsdf_flags, bsdf_idx)
    is_smooth = (flags & bsdf_flags.Smooth) != 0

    # surface NEE (:285-295)
    active_ne = active_surface & is_smooth & (depth + 1 < max_depth) & \
        (scene.config.n_emitters > 0)
    pf_nee_e, pf_uni_e, emitted_s, ds_s, smp = _sample_emitter_mis(
        scene, si.p, si.n, jnp.zeros_like(active_ne), ray.wavelengths,
        ray.time, s.medium_idx, s.channel, smp, pf, active_ne, nee_steps)
    wo_local = si.to_local(ds_s.d)
    bsdf_val, bsdf_pdf = bsdfs.bsdf_eval_pdf(scene, bsdf_idx, si,
                                             wo_local, active_ne)
    pf_nee_e = _update(pf_nee_e, jnp.ones_like(bsdf_val), bsdf_val,
                       active_ne)
    pf_uni_e = _update(
        pf_uni_e, jnp.where(ds_s.delta[..., None], 0.0,
                            _bcast(bsdf_pdf, nc)), bsdf_val, active_ne)
    result = result + jnp.where(
        active_ne[..., None], _mis2(pf_nee_e, pf_uni_e) * emitted_s, 0.0)

    # bsdf sampling (:300-319)
    smp, xb1 = smp.next_1d()
    smp, xb2 = smp.next_2d()
    bs, bsdf_weight = bsdfs.bsdf_sample(scene, bsdf_idx, si, xb1, xb2,
                                        active_surface)
    f_bsdf = bsdf_weight * jnp.maximum(bs.pdf[..., None], 1e-20)

    sampled_null = (bs.sampled_type & bsdf_flags.Null) != 0
    sampled_delta = (bs.sampled_type & bsdf_flags.Delta) != 0
    non_null = active_surface & ~sampled_null
    pf_nee = jnp.where(non_null[..., None, None], pf, pf_nee)
    pf = _update(pf, _bcast(bs.pdf, nc), f_bsdf, active_surface)
    pf_nee = _update(pf_nee, jnp.ones(batch + (nc,)), f_bsdf, non_null)

    depth = depth + non_null.astype(jnp.int32)
    valid_ray = valid_ray | non_null
    last_scatter_p = jnp.where(non_null[..., None], si.p, last_scatter_p)
    specular_chain = (specular_chain | (non_null & sampled_delta)) \
        & ~(active_surface & ((bs.sampled_type
                               & bsdf_flags.Smooth) != 0))

    new_ray = si.spawn_ray(si.to_world(bs.wo))
    ray = Ray(o=jnp.where(active_surface[..., None], new_ray.o, ray.o),
              d=jnp.where(active_surface[..., None], new_ray.d, ray.d),
              mint=jnp.where(active_surface, new_ray.mint, ray.mint),
              maxt=jnp.where(active_surface, INVALID_T, ray.maxt),
              time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | active_surface
    eta = jnp.where(active_surface, s.eta * bs.eta, s.eta)

    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_next = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                            s.medium_idx)

    active = active & (active_surface | active_medium)
    active = active & jnp.any(_mis1(pf) != 0, -1)

    return _State(
        sampler=smp, ray=ray, si=si,
        needs_intersection=needs_intersection,
        medium_idx=medium_next,
        pf=pf, pf_nee=pf_nee,
        result=result, eta=eta, depth=depth, channel=s.channel,
        specular_chain=specular_chain, last_scatter_p=last_scatter_p,
        valid_ray=valid_ray, active=active, n_rays=n_rays)



def sample(scene, sampler: Sampler, ray: Ray, active=None, medium_idx=None):
    max_iterations, bkw = _knobs(scene)
    state = _init_state(scene, sampler, ray, active, medium_idx)

    def scan_body(s, _):
        return _bounce(scene, s, **bkw), None

    body = common_remat(scene, scan_body, state.ray.o.shape[:-1],
                        max_iterations)
    final, _ = jax.lax.scan(body, state, None, length=max_iterations)
    return final.result, final.valid_ray, final.sampler
