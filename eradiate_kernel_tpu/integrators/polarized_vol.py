"""Polarized volumetric path tracer (Mueller-matrix volpath).

The reference compiles src/integrators/volpath.cpp under ``*_polarized``
variants where Spectrum = MuellerMatrix<UnpolarizedSpectrum>: every scalar
medium factor (free-flight ratio, sigma_n / sigma_s products, ratio-tracked
transmittance) multiplies the Mueller throughput — polarization-preserving —
and phase values are scalar (phase.h:130-225), while surface BSDFs
contribute full Mueller matrices. This module is that variant with the
Mueller axis explicit: throughput is a (..., nc, 4, 4) stack composed in the
implicit world-space Stokes bases (same convention as integrators.polarized
and bsdfs.bsdf_eval_mueller), and the result is a (..., nc, 4) Stokes vector
in the camera ray's basis.

Beyond the reference: ``rayleigh`` media scatter with the true Rayleigh
Mueller matrix rotated through the scattering plane
(phase.phase_mueller / core.mueller.rayleigh_scatter) — molecular
polarization is the dominant polarimetric signal of Earth atmospheres and
the reference's scalar phase interface cannot express it.

The RNG draw order matches volpath._bounce exactly, so the S0 component of
this integrator equals volpath.sample's radiance *per sample* whenever every
Mueller factor has the correct [0,0] entry — tested in
tests/test_polarization.py.

The bounce loop is exposed through the regen-driver hooks (_init_state /
_bounce / _knobs), so ``stokes(volpath)`` renders run on the regenerating
lane pool (integrators.render_wavefront_regen) like the scalar volpath
does: the lane state carries the full Mueller throughput and the
accumulated Stokes vector, and the sensor-basis rotation (stokes.cpp:89-100)
is PREMULTIPLIED into the initial throughput — the rotation is a constant
per-lane linear map, so rot @ sum(contribs) == sum(rot-premultiplied
contribs) and harvested lanes need no post-pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdfs, emitters, media, phase
from ..bsdfs import common as bsdf_flags
from ..core import mueller as mu
from ..core.gather import table_gather as _tg
from ..core.rng import Sampler
from ..core.ray import Ray
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect
from ..render.records import SurfaceInteraction
from .common import mis_weight, remat_scan_body as common_remat
from ..core.math import INVALID_T
from .volpath import (_all_emitters_delta, _cond_any, _ungated,
                      _evaluate_direct_light, _index_ch,
                      _init_state as _init_state_scalar,
                      _invalid_mi, _is_medium_transition, _knobs, _medium_phase,
                      _merge_si, _nc, _sample_emitter, _target_medium)


@pytree_dataclass
class _PolVolState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    throughput_m: jnp.ndarray   # (..., nc, 4, 4) Mueller toward camera
    stokes: jnp.ndarray         # (..., nc, 4) accumulated Stokes vector
    eta: jnp.ndarray
    depth: jnp.ndarray
    channel: jnp.ndarray
    specular_chain: jnp.ndarray
    valid_ray: jnp.ndarray
    active: jnp.ndarray
    n_rays: jnp.ndarray         # () f32 — rays traced (bench accounting)

    @property
    def result(self):
        """S0 radiance (..., nc) — what the film's XYZ channels splat.
        Basis-invariant: every Stokes rotation has first row (1,0,0,0)."""
        return self.stokes[..., 0]


def _sensor_basis_rotation(scene, ray):
    """Rotation from the ray's implicit Stokes basis to the sensor-aligned
    basis (stokes.cpp:93-100: target basis = cross(ray.d, sensor_up))."""
    tw = scene.sensor["to_world"]
    up = tw.m[:3, 1]  # sensor up (0,1,0) in world
    target = jnp.cross(ray.d, jnp.broadcast_to(up, ray.d.shape))
    t_len = jnp.linalg.norm(target, axis=-1, keepdims=True)
    current = mu.stokes_basis(-ray.d)
    target = jnp.where(t_len > 1e-8, target / jnp.maximum(t_len, 1e-12),
                       current)
    return mu.rotate_stokes_basis(-ray.d, current, target)


def _stokes0(m, spec):
    """Apply a Mueller stack to a depolarized source: m @ (spec, 0, 0, 0).
    m: (..., nc, 4, 4); spec: (..., nc) -> (..., nc, 4)."""
    return m[..., :, 0] * spec[..., None]


def _scale(m, f, mask):
    """Scalar per-channel factor on the Mueller stack where mask
    (polarization-preserving medium events). f: (..., nc)."""
    return jnp.where(mask[..., None, None, None],
                     m * f[..., None, None], m)


def _bounce(scene, s: _PolVolState, *, nee_steps, max_depth, rr_depth,
            while_walks=False, gate_sites=True, gate_walks=None,
            remat_walks=False, prb_walks=False):
    """One masked wavefront Mueller bounce (volpath.cpp:38-258 under a
    polarized variant). Module-level so both the fixed-trip scan tracer
    (sample_stokes) and the regenerating wavefront driver can drive it;
    the scalar-factor / Mueller-product structure mirrors volpath._bounce
    site for site, so the RNG draw order is identical."""
    batch = s.ray.o.shape[:-1]
    nc = s.throughput_m.shape[-3]
    ca = _cond_any if gate_sites else _ungated
    gate_walks = gate_sites if gate_walks is None else gate_walks
    smp = s.sampler
    tp_s0 = s.throughput_m[..., 0, 0]
    active = s.active & jnp.any(tp_s0 != 0.0, -1)
    ray = s.ray
    si = s.si
    result = s.stokes

    # --- russian roulette on the S0 gain (volpath.cpp:79-87) -------------
    q = jnp.minimum(jnp.max(tp_s0, -1) * s.eta ** 2, 0.95)
    q = jax.lax.stop_gradient(jnp.maximum(q, 1e-6))
    perform_rr = s.depth > rr_depth
    smp, xi_rr = smp.next_1d()
    active = active & ((xi_rr < q) | ~perform_rr)
    throughput_m = jnp.where(perform_rr[..., None, None, None],
                             s.throughput_m / q[..., None, None, None],
                             s.throughput_m)

    active_medium = active & (s.medium_idx >= 0)
    active_surface = active & ~active_medium

    # --- medium sampling (volpath.cpp:105-151) ---------------------------
    med = jnp.maximum(s.medium_idx, 0)
    smp, xi_m = smp.next_1d()
    mi = ca(
        active_medium,
        lambda: media.sample_interaction(scene, med, ray, xi_m, s.channel,
                                         active_medium),
        _invalid_mi(batch, nc))
    do_isect = s.needs_intersection & (active_medium | active_surface)
    si = ca(
        do_isect,
        lambda: _merge_si(ray_intersect(scene.geo, ray), si, do_isect),
        si)
    n_rays = s.n_rays + jnp.sum(do_isect)
    needs_intersection = s.needs_intersection & ~do_isect
    mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t), INVALID_T,
                                mi.t))

    tr, ff_pdf = media.eval_tr_and_pdf(mi, si.t)
    tr_pdf = _index_ch(ff_pdf, s.channel)
    ok_pdf = tr_pdf > 1e-15
    den = jnp.where(ok_pdf, tr_pdf, 1.0)[..., None]
    ratio = jnp.where(ok_pdf[..., None], tr / den, 0.0)
    throughput_m = _scale(throughput_m, ratio, active_medium)

    escaped_medium = active_medium & ~mi.is_valid
    active_medium = active_medium & mi.is_valid

    smp, xi_n = smp.next_1d()
    p_real = jax.lax.stop_gradient(
        _index_ch(mi.sigma_t, s.channel)
        / jnp.maximum(_index_ch(mi.combined_extinction, s.channel),
                      1e-30))
    null_scatter = xi_n >= p_real
    act_null = null_scatter & active_medium
    act_scatter = ~null_scatter & active_medium

    sn_ch = _index_ch(mi.sigma_n, s.channel)
    sn_den = jax.lax.stop_gradient(
        jnp.where(act_null & (sn_ch > 1e-15), sn_ch, 1.0))[..., None]
    throughput_m = _scale(
        throughput_m,
        mi.sigma_n * _index_ch(mi.combined_extinction,
                               s.channel)[..., None] / sn_den,
        act_null & (sn_ch > 1e-15))
    depth = s.depth + act_scatter.astype(jnp.int32)
    active = active & (depth < max_depth)
    act_scatter = act_scatter & active

    ray = ray.replace(
        o=jnp.where(act_null[..., None], mi.p, ray.o),
        mint=jnp.where(act_null, 0.0, ray.mint))
    si = si.replace(t=jnp.where(act_null, si.t - mi.t, si.t))

    st_ch = _index_ch(mi.sigma_t, s.channel)
    st_den = jax.lax.stop_gradient(
        jnp.where(act_scatter & (st_ch > 1e-15), st_ch, 1.0))[..., None]
    throughput_m = _scale(
        throughput_m,
        mi.sigma_s * _index_ch(mi.combined_extinction,
                               s.channel)[..., None] / st_den,
        act_scatter & (st_ch > 1e-15))
    valid_ray = s.valid_ray | act_scatter
    specular_chain = s.specular_chain & ~act_scatter

    phase_idx = _medium_phase(scene, s.medium_idx)
    nee_medium_p = mi.p
    nee_medium_d_in = ray.d

    # phase sampling with Mueller importance weight
    smp, xi_p1 = smp.next_1d()
    smp, xi_p2 = smp.next_2d()
    wo_m, _ppdf, phase_w = ca(
        act_scatter,
        lambda: phase.phase_sample_mueller(scene, phase_idx, ray.d,
                                           xi_p1, xi_p2, act_scatter),
        (ray.d, jnp.zeros(batch),
         jnp.broadcast_to(jnp.eye(4), batch + (4, 4))))
    throughput_m = jnp.where(
        act_scatter[..., None, None, None],
        jnp.einsum("...cij,...jk->...cik", throughput_m, phase_w),
        throughput_m)
    ray = Ray(
        o=jnp.where(act_scatter[..., None], mi.p, ray.o),
        d=jnp.where(act_scatter[..., None], wo_m, ray.d),
        mint=jnp.where(act_scatter, 0.0, ray.mint),
        maxt=jnp.where(act_scatter, INVALID_T, ray.maxt),
        time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | act_scatter

    # --- surface interactions -------------------------------------------
    active_surface = active_surface | escaped_medium

    em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
    hit_area = active_surface & si.is_valid & (em_idx >= 0)
    hit_env = active_surface & ~si.is_valid & \
        (scene.config.env_emitter >= 0)
    use_emit = (hit_area | hit_env) & specular_chain
    e_val = ca(
        use_emit,
        lambda: emitters.eval_emitter_hit(scene, si, use_emit & hit_area)
        + emitters.eval_environment(scene, ray, ~si.is_valid,
                                    use_emit & hit_env),
        jnp.zeros(batch + (nc,)))
    result = result + jnp.where(use_emit[..., None, None],
                                _stokes0(throughput_m, e_val), 0.0)

    active_surface = active_surface & si.is_valid
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    flags = _tg(scene.bsdf_flags, bsdf_idx)
    is_smooth = (flags & bsdf_flags.Smooth) != 0

    # merged NEE: the scalar walk supplies (emitted x transmittance);
    # polarimetry enters through the scattering matrix at this vertex
    active_e = active_surface & is_smooth & (depth + 1 < max_depth) & \
        (scene.config.n_emitters > 0)
    nee_ref_p = jnp.where(act_scatter[..., None], nee_medium_p, si.p)
    nee_ref_n = jnp.where(act_scatter[..., None], -nee_medium_d_in, si.n)
    nee_active = act_scatter | active_e

    def _nee_block():
        emitted_s, ds_s, smp2, nr_s = _sample_emitter(
            scene, nee_ref_p, nee_ref_n, act_scatter, ray.wavelengths,
            ray.time, s.medium_idx, s.channel, smp, nee_active, nee_steps,
            use_while=while_walks, gate_sites=gate_walks,
            remat_walks=remat_walks, prb_walks=prb_walks)
        phase_m = phase.phase_mueller(scene, phase_idx, -nee_medium_d_in,
                                      ds_s.d, act_scatter)
        nee_m_med = jnp.einsum("...cij,...jk->...cik", throughput_m,
                               phase_m)
        delta_m = jnp.where(act_scatter[..., None, None],
                            _stokes0(nee_m_med, emitted_s), 0.0)
        wo_local = si.to_local(ds_s.d)
        bsdf_m, bsdf_pdf = bsdfs.bsdf_eval_mueller(scene, bsdf_idx, si,
                                                   wo_local, active_e)
        mis_pdf = jnp.where(ds_s.delta, 0.0, bsdf_pdf)
        w_nee = jnp.where(ds_s.pdf > 0,
                          mis_weight(ds_s.pdf, mis_pdf), 0.0)
        nee_m_srf = jnp.einsum("...cij,...cjk->...cik", throughput_m,
                               bsdf_m)
        delta_s = jnp.where(
            active_e[..., None, None],
            w_nee[..., None, None] * _stokes0(nee_m_srf, emitted_s), 0.0)
        return delta_m + delta_s, smp2, nr_s

    def _nee_skip():
        # keep the RNG stream aligned with the taken branch (3 + nee_steps
        # dims — see volpath._bounce)
        return (jnp.zeros(batch + (nc, 4)),
                smp.replace(dim=smp.dim + jnp.uint32(3 + nee_steps)),
                jnp.zeros(()))

    nee_delta, smp, nr_s = (jax.lax.cond(jnp.any(nee_active), _nee_block,
                                         _nee_skip)
                            if gate_sites else _nee_block())
    result = result + nee_delta
    n_rays = n_rays + nr_s

    # bsdf sampling (Mueller importance weight)
    smp, xb1 = smp.next_1d()
    smp, xb2 = smp.next_2d()

    def _bsdf_block():
        return bsdfs.bsdf_sample_mueller(scene, bsdf_idx, si, xb1, xb2,
                                         active_surface)

    bs0, _w0 = bsdf_flags.zero_bsdf_sample(batch, nc)
    bs, weight_m = ca(
        active_surface, _bsdf_block,
        (bs0, jnp.zeros(batch + (nc, 4, 4))))
    throughput_m = jnp.where(
        active_surface[..., None, None, None],
        jnp.einsum("...cij,...cjk->...cik", throughput_m, weight_m),
        throughput_m)
    eta = jnp.where(active_surface, s.eta * bs.eta, s.eta)

    new_ray = si.spawn_ray(si.to_world(bs.wo))
    ray = Ray(o=jnp.where(active_surface[..., None], new_ray.o, ray.o),
              d=jnp.where(active_surface[..., None], new_ray.d, ray.d),
              mint=jnp.where(active_surface, new_ray.mint, ray.mint),
              maxt=jnp.where(active_surface, INVALID_T, ray.maxt),
              time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | active_surface

    sampled_null = (bs.sampled_type & bsdf_flags.Null) != 0
    sampled_delta = (bs.sampled_type & bsdf_flags.Delta) != 0
    sampled_smooth = (bs.sampled_type & bsdf_flags.Smooth) != 0
    non_null = active_surface & ~sampled_null
    depth = depth + non_null.astype(jnp.int32)
    valid_ray = valid_ray | non_null
    specular_chain = specular_chain | (non_null & sampled_delta)
    specular_chain = specular_chain & ~(active_surface & sampled_smooth)

    add_emitter = active_surface & ~sampled_delta & ~sampled_null & \
        jnp.any(throughput_m[..., 0, 0] != 0, -1) & (depth < max_depth) & \
        (scene.config.n_emitters > 0)
    si_new = ca(
        active_surface,
        lambda: _merge_si(ray_intersect(scene.geo, ray), si,
                          active_surface),
        si)
    n_rays = n_rays + jnp.sum(active_surface)
    needs_intersection = needs_intersection & ~active_surface

    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_next = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                            s.medium_idx)

    if not _all_emitters_delta(scene.config):
        def _direct_block():
            return _evaluate_direct_light(
                scene, si.p, ray, si_new, medium_next, s.channel, smp,
                add_emitter, nee_steps, use_while=while_walks,
                gate_sites=gate_walks, remat_walks=remat_walks,
                prb_walks=prb_walks)

        def _direct_skip():
            return (jnp.zeros(batch + (nc,)), jnp.zeros(batch),
                    smp.replace(dim=smp.dim + jnp.uint32(nee_steps)),
                    jnp.zeros(()))

        emitted_d, emitter_pdf, smp, nr_d = (jax.lax.cond(
            jnp.any(add_emitter), _direct_block, _direct_skip)
            if gate_sites else _direct_block())
        n_rays = n_rays + nr_d
        w_dir = mis_weight(bs.pdf, emitter_pdf)
        result = result + jnp.where(
            (add_emitter & (emitter_pdf > 0))[..., None, None],
            w_dir[..., None, None] * _stokes0(throughput_m, emitted_d),
            0.0)

    si = _merge_si(si_new, si, active_surface)
    active = active & (active_surface | active_medium)

    return _PolVolState(
        sampler=smp, ray=ray, si=si,
        needs_intersection=needs_intersection,
        medium_idx=medium_next,
        throughput_m=throughput_m, stokes=result,
        eta=eta, depth=depth, channel=s.channel,
        specular_chain=specular_chain, valid_ray=valid_ray,
        active=active, n_rays=n_rays)


# extra bounce kwargs the regenerating (primal-only, while_loop) driver
# may add on top of _knobs' — same platform policy as volpath
_PRIMAL_BOUNCE_KWARGS = {"while_walks": True, "gate_sites": None}


def _init_state(scene, sampler: Sampler, ray: Ray, active=None,
                medium_idx=None):
    """Fresh per-lane Mueller path state for the regenerating driver. The
    sensor-basis rotation (stokes.cpp:89-100) is premultiplied into the
    initial throughput so the accumulated Stokes vector is sensor-aligned
    at harvest without carrying the camera ray."""
    base = _init_state_scalar(scene, sampler, ray, active, medium_idx)
    batch = ray.o.shape[:-1]
    nc = _nc(scene, ray)
    rot = _sensor_basis_rotation(scene, ray)
    tp0 = jnp.broadcast_to(rot[..., None, :, :], batch + (nc, 4, 4)) \
        + 0.0 * base.throughput[..., None, None]
    return _PolVolState(
        sampler=base.sampler, ray=base.ray, si=base.si,
        needs_intersection=base.needs_intersection,
        medium_idx=base.medium_idx,
        throughput_m=tp0,
        stokes=jnp.zeros(batch + (nc, 4)),
        eta=base.eta, depth=base.depth, channel=base.channel,
        specular_chain=base.specular_chain, valid_ray=base.valid_ray,
        active=base.active, n_rays=jnp.zeros(()))


def sample_stokes(scene, sampler: Sampler, ray: Ray, active=None,
                  medium_idx=None):
    """Full polarized volumetric transport (fixed-trip scan driver).
    Returns (stokes (..., nc, 4) in the RAY's implicit basis, valid,
    sampler) — the stokes wrapper applies the sensor-basis rotation."""
    max_iterations, bkw = _knobs(scene)

    base = _init_state_scalar(scene, sampler, ray, active, medium_idx)
    batch = ray.o.shape[:-1]
    nc = _nc(scene, ray)
    eye = jnp.broadcast_to(jnp.eye(4), batch + (nc, 4, 4))
    state = _PolVolState(
        sampler=base.sampler, ray=base.ray, si=base.si,
        needs_intersection=base.needs_intersection,
        medium_idx=base.medium_idx,
        throughput_m=eye + 0.0 * base.throughput[..., None, None],
        stokes=jnp.zeros(batch + (nc, 4)),
        eta=base.eta, depth=base.depth, channel=base.channel,
        specular_chain=base.specular_chain, valid_ray=base.valid_ray,
        active=base.active, n_rays=jnp.zeros(()))

    def scan_body(s, _):
        return _bounce(scene, s, **bkw), None

    body_fn = common_remat(scene, scan_body, ray.o.shape[:-1],
                           max_iterations)
    final, _ = jax.lax.scan(body_fn, state, None,
                            length=max_iterations)
    return final.stokes, final.valid_ray, final.sampler
