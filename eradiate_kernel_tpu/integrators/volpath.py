"""Wavefront volumetric path tracer with null-scattering (delta tracking).

Re-design of src/integrators/volpath.cpp as a masked wavefront program:
- spectral single-channel distance sampling w/ channel selection (volpath.cpp:63-67)
- majorant free-flight + null/real event classification (volpath.cpp:105-151)
- NEE from media & surfaces with ratio-tracked transmittance through null
  boundaries (`sample_emitter`, volpath.cpp:261-367)
- BSDF-sampling MIS via `evaluate_direct_light` (volpath.cpp:370-465)

All loops are bounded lax.scan's (static trip counts) so the whole estimator
is reverse-differentiable end to end; the caps (`max_iterations`,
`nee_steps`) bound null-collision chains — set them generously for dense
media. Russian roulette and majorant-ratio decisions use detached
probabilities (volpath.cpp:83 detach discipline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdfs, emitters, media, phase
from ..bsdfs import common as bsdf_flags
from ..core.gather import index_channel, table_gather as _tg
from ..core.rng import Sampler
from ..core.ray import Ray
from ..core.types import pytree_dataclass
from ..render.geometry import ray_intersect
from ..render.records import SurfaceInteraction
from .common import mis_weight, remat_scan_body as common_remat
from ..core.math import INVALID_T


def _nc(scene, ray):
    return ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels


def _index_ch(spec, channel):
    ch = jnp.clip(channel, 0, spec.shape[-1] - 1)
    return index_channel(spec, ch)


def _merge_si(si_new, si_old, mask):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim)), a, b),
        si_new, si_old)


def match_dtypes(out, ref):
    """Cast ``out``'s array leaves to ``ref``'s dtypes (no-op when equal).

    Keeps loop carries dtype-stable: under jax_enable_x64, default-dtype
    intermediates (jnp.zeros, literals) would otherwise promote pieces of an
    f32 carry to f64 mid-loop — and under the double-precision variant the
    f32-seeded pieces (rng uniforms) must be promoted up to the f64 carry."""
    return jax.tree_util.tree_map(
        lambda o, r: o if o.dtype == r.dtype else o.astype(r.dtype),
        out, ref)


def _ungated(mask, fn, fallback):
    """_cond_any with the branch removed: just run ``fn``. The regenerating
    driver keeps occupancy near 100%, so its site masks are almost never
    all-dead — there the cond is pure overhead (every conditional is a
    kernel-graph boundary, and on relay-attached TPUs each extra kernel
    costs launch latency)."""
    return fn()


def _cond_any(mask, fn, fallback):
    """Run ``fn()`` only if any lane of ``mask`` is live, else return
    ``fallback`` (same pytree structure). XLA lowers a scalar-predicate cond
    to a real branch on TPU, so an all-dead site costs one reduction instead
    of the full wavefront — the wavefront analog of the reference's
    ``none(active)`` early-outs (volpath.cpp while-loop guards). Every
    consumer of the result is masked by a subset of ``mask``, so the
    fallback values never reach the estimate. Stays reverse-differentiable
    (unlike a while_loop early exit).

    The fallback is built with default (f32/i32) dtypes; under the double-
    precision variant the live branch promotes to f64/i64, so cast the
    fallback to the live branch's abstract output types (eval_shape is a
    trace, not a compile — free at jit time)."""
    out_avals = jax.eval_shape(fn)
    fallback = jax.tree_util.tree_map(
        lambda f, a: f if f.dtype == a.dtype else f.astype(a.dtype),
        fallback, out_avals)
    return jax.lax.cond(jnp.any(mask), fn, lambda: fallback)


def _invalid_mi(batch, nc):
    """MediumInteraction fallback for skipped medium-sampling sites: invalid
    (t = INVALID_T) with zero coefficients (all consumers are masked)."""
    z = jnp.zeros(batch + (nc,))
    return media.MediumInteraction(
        t=jnp.full(batch, INVALID_T), p=jnp.zeros(batch + (3,)),
        mint=jnp.zeros(batch), sigma_s=z, sigma_n=z, sigma_t=z,
        combined_extinction=z, maxt=jnp.full(batch, INVALID_T),
        ff_mq=jnp.zeros(batch + (media.AXPROF_BINS,)),
        ff_qa=jnp.zeros(batch), ff_qb=jnp.zeros(batch),
        ff_adlz=jnp.ones(batch), ff_on=jnp.zeros(batch, bool))


def _medium_phase(scene, medium_idx):
    if scene.medium_phase.shape[0] == 0:  # medium-free scene
        return jnp.zeros(medium_idx.shape, jnp.int32)
    return _tg(scene.medium_phase, jnp.maximum(medium_idx, 0))


def _target_medium(scene, si, d):
    """Medium on the far side of an interface (shape.h target_medium)."""
    sh = jnp.maximum(si.shape_index, 0)
    outward = jnp.sum(d * si.n, -1) > 0
    return jnp.where(outward, _tg(scene.shape_exterior, sh),
                     _tg(scene.shape_interior, sh))


def _is_medium_transition(scene, si):
    sh = jnp.maximum(si.shape_index, 0)
    return (_tg(scene.shape_interior, sh) >= 0) | (_tg(scene.shape_exterior, sh) >= 0)


def _all_emitters_delta(cfg) -> bool:
    """Static: no emitter can be hit by a sampled ray (delta positions /
    directions only, no environment) -> evaluate_direct_light is dead code."""
    delta_kinds = {"point", "directional", "spot", "projector"}
    return (cfg.env_emitter < 0
            and all(k in delta_kinds for k in cfg.emitter_kinds))


def _eval_null_transmission(scene, si, ray, active):
    """BSDF::eval_null_transmission — only 'null' BSDFs pass light through
    (bsdf.h:408; null.cpp). Returns (..., nc)."""
    nc = _nc(scene, ray)
    cfg = scene.config
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    kind_id = _tg(scene.bsdf_kind, bsdf_idx)
    out = jnp.zeros(si.t.shape + (nc,))
    for k, kind in enumerate(cfg.bsdf_kinds):
        if kind != "null":
            continue
        m = active & (kind_id == k)
        out = jnp.where(m[..., None], 1.0, out)
    return out


# =============================================================================
# NEE with ratio-tracked transmittance (volpath.cpp:261-367)
# =============================================================================

@pytree_dataclass
class _WalkHit:
    """Slim hit record for the NEE transmittance walks: only the fields the
    walk bodies consume. A full SurfaceInteraction in the loop carry keeps
    ~25+nc floats/lane live across every iteration (sh_frame, prim_uv,
    dp_du/dv, wavelengths are never read there); this carries 13."""

    t: jnp.ndarray            # (...,)
    p: jnp.ndarray            # (..., 3)
    n: jnp.ndarray            # (..., 3) geometric normal
    shape_index: jnp.ndarray  # (...,) i32, -1 invalid
    uv: jnp.ndarray           # (..., 2) surface uv (emitter textures)
    wi: jnp.ndarray           # (..., 3) local incident dir (emitter side)

    @property
    def is_valid(self):
        return jnp.isfinite(self.t) & (self.shape_index >= 0)

    def offset_origin(self, d):
        """spawn_ray's origin offset (interaction.h spawn_ray) without
        building a Ray."""
        from ..core.math import RayEpsilon

        scale = 1.0 + jnp.max(jnp.abs(self.p), axis=-1)
        sgn = jnp.where(jnp.sum(self.n * d, -1) >= 0.0, 1.0, -1.0)
        return self.p + (RayEpsilon * scale * sgn)[..., None] * self.n

    def view(self, wavelengths):
        """Duck-typed SurfaceInteraction stand-in for emitter eval/pdf
        call sites (they read t/p/n/uv/wi/wavelengths/shape_index only);
        the wavelengths ride on the walk ray, not the carry."""
        v = _WalkHitView()
        v.t, v.p, v.n = self.t, self.p, self.n
        v.shape_index, v.uv, v.wi = self.shape_index, self.uv, self.wi
        v.wavelengths = wavelengths
        v.is_valid = self.is_valid
        return v


class _WalkHitView:
    __slots__ = ("t", "p", "n", "shape_index", "uv", "wi", "wavelengths",
                 "is_valid")


def _walk_hit(si) -> _WalkHit:
    return _WalkHit(t=si.t, p=si.p, n=si.n, shape_index=si.shape_index,
                    uv=si.uv, wi=si.wi)


def _invalid_walk_hit(batch) -> _WalkHit:
    return _WalkHit(t=jnp.full(batch, INVALID_T),
                    p=jnp.zeros(batch + (3,)),
                    n=jnp.zeros(batch + (3,)).at[..., 2].set(1.0),
                    shape_index=jnp.full(batch, -1, jnp.int32),
                    uv=jnp.zeros(batch + (2,)),
                    wi=jnp.zeros(batch + (3,)).at[..., 2].set(1.0))


@pytree_dataclass
class _WalkState:
    sampler: Sampler
    ray: Ray
    si: _WalkHit
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    transmittance: jnp.ndarray
    total_dist: jnp.ndarray
    active: jnp.ndarray
    n_rays: jnp.ndarray  # () f32 — rays traced (bench accounting)


def _zero_walk_ct(tree):
    """Cotangent pytree of zeros matching ``tree`` (float0 for ints)."""
    import numpy as _np

    def z(x):
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros(x.shape, x.dtype)
        return _np.zeros(x.shape, jax.dtypes.float0)
    return jax.tree_util.tree_map(z, tree)


def _run_walk_prb(body, state, nee_steps, mult_fields, pass_fields):
    """PRB-style walk execution: an early-exiting while_loop wrapped in a
    custom_vjp whose backward REPLAYS the walk forward with per-step local
    vjps instead of transposing a fixed-trip scan.

    The walk's value state factorizes like the path itself: the declared
    ``mult_fields`` (transmittance) are component-wise multiplicative
    chains, so ct(F_s) = ct(F_final) * F_final / F_s at every step, and
    ``pass_fields`` (the direct walk's emitter_val, written once from the
    running transmittance) carry their final cotangent unchanged. With
    those analytic state cotangents, one jax.vjp per *executed* step
    (walks converge in 1-3 of nee_steps) yields exactly the scan
    transpose's theta-gradients for value-class parameters — the same
    argument as integrators/replay.py, one level down. Traced closure
    constants (scene arrays, the emitter sample) become explicit
    custom_vjp inputs via jax.closure_convert, so their cotangents flow
    back into the enclosing bounce transpose.

    Used by the path-replay adjoint sweep (prb_walks bounce kwarg); the
    measured motivation: the adjoint's ungated scan walks pay
    nee_steps full-wavefront steps forward + remat recompute + transpose,
    while this pays ~2x the while-walk's executed steps."""
    dim0 = state.sampler.dim
    # Manual closure conversion hoisting ALL captured constants (not
    # jax.closure_convert, which hoists only *perturbed* floats: integer
    # captures — shape tables, faces — stay baked into the jaxpr, and
    # when the whole render is itself nested under an outer jit/grad
    # those are tracers, which the cond lowering rejects with "No
    # constant handler for DynamicJaxprTracer").
    flat_in, in_tree = jax.tree_util.tree_flatten((state,))
    out_tree_box = []

    def _fflat(*flat):
        st = jax.tree_util.tree_unflatten(in_tree, flat)[0]
        out = body(st)
        out_flat, out_tree = jax.tree_util.tree_flatten(out)
        out_tree_box.append(out_tree)
        return out_flat

    closed = jax.make_jaxpr(_fflat)(*flat_in)
    consts = tuple(closed.consts)
    out_tree = out_tree_box[0]

    def conv(st, *cs):
        flat = jax.tree_util.tree_flatten((st,))[0]
        out_flat = jax.core.eval_jaxpr(closed.jaxpr, list(cs), *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)

    @jax.custom_vjp
    def walk(state, *consts):
        def w_cond(carry):
            s, k = carry
            return jnp.any(s.active) & (k < nee_steps)

        def w_body(carry):
            s, k = carry
            return match_dtypes(conv(s, *consts), s), k + 1

        final, _k = jax.lax.while_loop(w_cond, w_body,
                                       (state, jnp.int32(0)))
        return final

    def fwd(state, *consts):
        final = walk(state, *consts)
        return final, (state, consts, final)

    def bwd(res, ct_final):
        state, consts, final = res
        ct_mult = {f: getattr(ct_final, f) for f in mult_fields}
        ct_pass = {f: getattr(ct_final, f) for f in pass_fields}
        fin_mult = {f: getattr(final, f) for f in mult_fields}
        g0 = tuple(jnp.zeros(jnp.shape(c), jnp.result_type(c))
                   if jnp.issubdtype(jnp.result_type(c), jnp.inexact)
                   else None for c in consts)
        # None placeholders (int consts) are excluded from the carry
        g_idx = [i for i, g in enumerate(g0) if g is not None]
        g_carry0 = tuple(g0[i] for i in g_idx)

        def w_cond(carry):
            s, k, _g = carry
            return jnp.any(s.active) & (k < nee_steps)

        def w_body(carry):
            s, k, g = carry
            s_next, vjp_fn = jax.vjp(lambda st, *cs: conv(st, *cs),
                                     s, *consts)
            ct_step = _zero_walk_ct(s_next)
            reps = {}
            for f in mult_fields:
                nxt = getattr(s_next, f)
                fin = fin_mult[f]
                ok = nxt != 0.0
                reps[f] = jnp.where(ok, ct_mult[f] * fin
                                    / jnp.where(ok, nxt, 1.0), 0.0)
            for f in pass_fields:
                reps[f] = ct_pass[f]
            ct_step = ct_step.replace(**reps)
            ct_all = vjp_fn(ct_step)
            g_new = tuple(g[j] + ct_all[1 + i]
                          for j, i in enumerate(g_idx))
            return match_dtypes(s_next, s), k + 1, g_new

        _s_fin, _k, g_fin = jax.lax.while_loop(
            w_cond, w_body, (state, jnp.int32(0), g_carry0))

        # input-state cotangent: analytic chain rules; everything else 0
        ct_state = _zero_walk_ct(state)
        reps = {}
        for f in mult_fields:
            s0 = getattr(state, f)
            ok = s0 != 0.0
            reps[f] = jnp.where(ok, ct_mult[f] * fin_mult[f]
                                / jnp.where(ok, s0, 1.0), 0.0)
        for f in pass_fields:
            reps[f] = ct_pass[f]
        ct_state = ct_state.replace(**reps)
        out = [ct_state]
        k = 0
        import numpy as _np
        for i, c in enumerate(consts):
            if i in g_idx:
                out.append(g_fin[g_idx.index(i)])
            else:
                out.append(_np.zeros(jnp.shape(c), jax.dtypes.float0))
        return tuple(out)

    walk.defvjp(fwd, bwd)
    final = walk(state, *consts)
    return final.replace(
        sampler=final.sampler.replace(dim=dim0 + jnp.uint32(nee_steps)))


def _run_walk(body, state, nee_steps, use_while, remat=False, prb=False):
    """Run a bounded transmittance walk. ``use_while`` (primal-only paths:
    the regenerating driver) terminates as soon as every lane converges
    instead of always paying ``nee_steps`` full-wavefront steps — most
    connections finish in 1-3 steps while the scan runs all 8 for the
    stragglers. The sampler dimension counter is pinned to the fixed
    scan-equivalent offset afterwards, so results are bitwise identical to
    the scan path (step k draws dim0+k in both; skipped steps were no-ops
    for every lane). The scan variant stays the default because while_loop
    is not reverse-differentiable."""
    if prb and not use_while:
        mult = ("transmittance",)
        pas = ("emitter_val",) if hasattr(state, "emitter_val") else ()
        return _run_walk_prb(body, state, nee_steps, mult, pas)
    dim0 = state.sampler.dim
    if not use_while:
        def scan_body(s, _):
            return match_dtypes(body(s), s), None

        # remat: under reverse AD (the path-replay adjoint sweep), store
        # only the slim per-step carries and recompute step interiors in
        # the transpose — the stacked per-step interior residuals
        # ((nee_steps, lanes, ...) masks and coefficient tensors) were the
        # top HBM-traffic item of the adjoint profile (r5)
        if remat:
            scan_body = jax.checkpoint(scan_body)
        final, _ = jax.lax.scan(scan_body, state, None, length=nee_steps)
    else:
        def w_cond(carry):
            s, k = carry
            return jnp.any(s.active) & (k < nee_steps)

        def w_body(carry):
            s, k = carry
            return match_dtypes(body(s), s), k + 1

        final, _k = jax.lax.while_loop(w_cond, w_body,
                                       (state, jnp.int32(0)))
    # pin the dimension counter to the same post-walk offset in BOTH
    # variants (and for every walk body, including the deterministic ones
    # that draw nothing): step k draws dim0+k wherever it draws at all, so
    # scan, early-exited while, and skipped-site accounting stay bitwise
    # interchangeable downstream
    return final.replace(
        sampler=final.sampler.replace(dim=dim0 + jnp.uint32(nee_steps)))


def _sample_emitter(scene, ref_p, ref_n, is_medium_ref, wavelengths, time,
                    medium_idx, channel, sampler, active, nee_steps,
                    use_while=False, gate_sites=True, remat_walks=False,
                    prb_walks=False):
    """Returns (contribution, ds, sampler): emitter radiance attenuated by
    ratio-tracked transmittance along the connection."""
    batch = ref_p.shape[:-1]
    nc = wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels

    sampler, s_pick = sampler.next_1d()
    sampler, s1 = sampler.next_1d()
    sampler, s2 = sampler.next_2d()

    # pseudo-SI for the reference point (only p/n/wavelengths used)
    ref_si = _pseudo_si(ref_p, ref_n, wavelengths, time)
    ds, emitter_val = emitters.sample_emitter_direction(
        scene, ref_si, s_pick, s1, s2, active, test_visibility=False)
    active = active & (ds.pdf > 0)
    emitter_val = jnp.where(active[..., None], emitter_val, 0.0)

    # connection ray; medium refs start inside the medium (mint = 0)
    eps_n = jnp.where(is_medium_ref[..., None], 0.0, 1.0)
    scale = 1.0 + jnp.max(jnp.abs(ref_p), axis=-1)
    from ..core.math import RayEpsilon
    sgn = jnp.where(jnp.sum(ref_n * ds.d, -1) >= 0, 1.0, -1.0)
    o = ref_p + eps_n * (RayEpsilon * scale * sgn)[..., None] * ref_n
    ray = Ray(o=o, d=ds.d, mint=jnp.zeros(batch),
              maxt=jnp.full(batch, INVALID_T), time=time,
              wavelengths=wavelengths)

    state = _WalkState(
        sampler=sampler, ray=ray,
        si=_invalid_walk_hit(batch),
        needs_intersection=jnp.ones(batch, bool),
        medium_idx=medium_idx,
        transmittance=jnp.where(active[..., None], jnp.ones(batch + (nc,)), 0.0),
        total_dist=jnp.zeros(batch),
        active=active, n_rays=jnp.zeros(()))

    ca = _cond_any if gate_sites else _ungated
    extra = dict(scene.config.integrator.extra)
    nee_mode = extra.get("nee_transmittance", "residual")
    if nee_mode == "residual":
        # Default: residual ratio tracking (Novák et al. 2014) — UNBIASED
        # like the tracked walk, but the closed-form control transmittance
        # absorbs the bulk of the optical depth, so stochastic steps (each a
        # full-wavefront grid gather + intersect on TPU) arrive at the
        # residual rate |sigma - sigma_c| instead of the majorant. For
        # plane-parallel profiles the residual is ZERO: the walk needs only
        # its surface-crossing steps and is exact. 'track' recovers the
        # reference's plain ratio tracking (volpath.cpp:282-365),
        # 'quadrature' the deterministic Gauss-Legendre estimator.
        if scene.config.het_profile1d:
            # trace-time degenerate case: every heterogeneous medium is a
            # plane-parallel profile, so the residual rate is IDENTICALLY
            # zero and the estimator is the exact closed-form optical depth
            # — run the deterministic walk body directly (no per-step rate
            # computation, RNG draw, or collision site at all). Exact, so
            # trivially unbiased here.
            step = lambda s: _walk_step_quadrature(scene, s, ds, channel,
                                                   8, ca=ca)
        else:
            step = lambda s: _walk_step_residual(scene, s, ds, channel,
                                                 ca=ca)
        final = _run_walk(step, state, nee_steps, use_while,
                          remat=remat_walks, prb=prb_walks)
        contrib = jnp.where(final.active[..., None], 0.0,
                            final.transmittance) * emitter_val
        return contrib, ds, final.sampler, final.n_rays
    if nee_mode == "quadrature":
        # Deterministic option (SURVEY §7 perf note; estimator change, so
        # knob-gated): T = exp(-integral of sigma_t) by fixed Gauss-Legendre
        # quadrature per medium segment instead of ratio tracking — one walk
        # step per SURFACE crossing (2-4 for an atmosphere) instead of
        # O(majorant * L) stochastic steps. Consistent (O(K^-2) quadrature
        # bias), not unbiased; Eradiate-style plane-parallel workloads
        # usually accept this trade.
        K = int(extra.get("nee_quad_points", 8))
        final = _run_walk(
            lambda s: _walk_step_quadrature(scene, s, ds, channel, K,
                                            ca=ca),
            state, nee_steps, use_while, remat=remat_walks, prb=prb_walks)
        contrib = jnp.where(final.active[..., None], 0.0,
                            final.transmittance) * emitter_val
        return contrib, ds, final.sampler, final.n_rays

    def body(s: _WalkState):
        # clamp: total_dist accumulates INVALID_T on escaped lanes; a huge
        # negative remaining would turn exp(-t*sigma) into inf (NaN grads)
        remaining = jnp.clip(ds.dist * (1.0 - 1e-4) - s.total_dist,
                             0.0, INVALID_T)
        ray = s.ray.replace(maxt=remaining)
        active = s.active & (remaining > 0)

        active_medium = active & (s.medium_idx >= 0)
        active_surface = active & ~active_medium
        smp = s.sampler

        med = jnp.maximum(s.medium_idx, 0)
        smp, xi = smp.next_1d()
        mi = ca(
            active_medium,
            lambda: media.sample_interaction(scene, med, ray, xi, channel,
                                             active_medium),
            _invalid_mi(batch, nc))

        # ONE intersection per step serves both the medium and the surface
        # lane sets: they are disjoint, and ray state at this point is
        # identical for both (the per-set sites of the reference's
        # while-loops, volpath.cpp:286/330, collapse on a masked wavefront
        # where every lane pays for every intersect site that executes)
        do_isect = s.needs_intersection & (active_medium | active_surface)
        si = ca(
            do_isect,
            lambda: _merge_si(_walk_hit(ray_intersect(scene.geo, ray)),
                              s.si, do_isect),
            s.si)
        needs_intersection = s.needs_intersection & ~do_isect
        n_rays = s.n_rays + jnp.sum(do_isect)

        mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t), INVALID_T, mi.t))

        # transmittance estimator (volpath.cpp:305-312); profile-flight
        # lanes rebuild the exact inhomogeneous optical depth inside
        tr, ff_pdf = media.eval_tr_and_pdf(mi, jnp.minimum(si.t, remaining))
        tr_pdf = _index_ch(ff_pdf, channel)
        # double-where: a max(x, 1e-30) denominator leaves 1e30-scale values
        # in masked lanes whose cotangents overflow to inf*0=NaN in reverse
        ok_pdf = tr_pdf > 1e-15  # pdf^2 appears in the division VJP: keep it representable
        den = jax.lax.stop_gradient(
            jnp.where(ok_pdf, tr_pdf, 1.0))[..., None]
        ratio = jnp.where(ok_pdf[..., None], tr / den, 0.0)
        transmittance = jnp.where(active_medium[..., None],
                                  s.transmittance * ratio, s.transmittance)

        # medium event exceeded remaining distance -> done
        total_dist = jnp.where(active_medium & (mi.t > remaining) & mi.is_valid,
                               ds.dist, s.total_dist)
        mi = mi.replace(t=jnp.where(active_medium & (mi.t > remaining), INVALID_T, mi.t))

        escaped_medium = active_medium & ~mi.is_valid
        active_medium = active_medium & mi.is_valid
        total_dist = jnp.where(active_medium, total_dist + mi.t, total_dist)

        # null collision: advance ray, multiply by sigma_n
        ray = ray.replace(
            o=jnp.where(active_medium[..., None], mi.p, ray.o),
            mint=jnp.where(active_medium, 0.0, ray.mint))
        si = si.replace(t=jnp.where(active_medium, si.t - mi.t, si.t))
        transmittance = jnp.where(active_medium[..., None],
                                  transmittance * mi.sigma_n, transmittance)

        # surface interactions (si already fresh from the merged intersect)
        active_surface = active_surface | escaped_medium
        total_dist = jnp.where(active_surface, total_dist + si.t, total_dist)

        active_surface = active_surface & si.is_valid & active & ~active_medium
        null_tr = _eval_null_transmission(scene, si, ray, active_surface)
        transmittance = jnp.where(active_surface[..., None],
                                  transmittance * null_tr, transmittance)

        # step past the surface
        o_new = si.offset_origin(ray.d)
        ray = Ray(o=jnp.where(active_surface[..., None], o_new, ray.o),
                  d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
                  maxt=remaining, time=ray.time, wavelengths=ray.wavelengths)
        needs_intersection = needs_intersection | active_surface

        nonzero = jnp.any(transmittance > 0, -1)
        active = (active_medium | active_surface) & nonzero

        has_trans = active_surface & _is_medium_transition(scene, si)
        medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                               s.medium_idx)

        return _WalkState(sampler=smp, ray=ray, si=si,
                          needs_intersection=needs_intersection,
                          medium_idx=medium_idx, transmittance=transmittance,
                          total_dist=total_dist, active=active,
                          n_rays=n_rays)

    final = _run_walk(body, state, nee_steps, use_while, remat=remat_walks,
                      prb=prb_walks)
    # lanes still active after the cap contribute nothing (conservative)
    contrib = jnp.where(final.active[..., None], 0.0,
                        final.transmittance) * emitter_val
    return contrib, ds, final.sampler, final.n_rays


def _walk_step_quadrature(scene, s: _WalkState, ds, channel, K,
                          ca=_cond_any):
    """One deterministic NEE-walk step: exact/quadrature transmittance over
    the medium segment up to the next surface, then step through it
    (deterministic variant of the tracked walk below; active only via the
    nee_transmittance='quadrature' integrator extra). The integral itself
    lives in media.medium_tau_segment (closed form for plane-parallel
    profiles, Gauss-Legendre for general grids)."""
    batch = s.ray.o.shape[:-1]
    nc = s.transmittance.shape[-1]
    remaining = jnp.clip(ds.dist * (1.0 - 1e-4) - s.total_dist,
                         0.0, INVALID_T)
    ray = s.ray.replace(maxt=remaining)
    active = s.active & (remaining > 0)

    do_isect = s.needs_intersection & active
    si = ca(
        do_isect,
        lambda: _merge_si(_walk_hit(ray_intersect(scene.geo, ray)),
                          s.si, do_isect),
        s.si)
    needs_intersection = s.needs_intersection & ~do_isect
    n_rays = s.n_rays + jnp.sum(do_isect)

    seg_end = jnp.minimum(jnp.minimum(si.t, remaining), INVALID_T)
    in_medium = active & (s.medium_idx >= 0)

    def quad_tau():
        # medium segment bounds clip seg_end further (exit of the grid AABB)
        med = jnp.maximum(s.medium_idx, 0)
        seg_ok, mint, maxt = media.medium_intersect_bounds(
            scene, med, ray, in_medium)
        a = jnp.where(seg_ok, jnp.clip(mint, 0.0, seg_end), 0.0)
        b = jnp.where(seg_ok, jnp.clip(maxt, 0.0, seg_end), 0.0)
        return media.medium_tau_segment(scene, med, ray, a, b,
                                        ray.wavelengths, quad_points=K)

    tau = ca(in_medium, quad_tau, jnp.zeros(batch + (nc,)))
    transmittance = jnp.where(in_medium[..., None],
                              s.transmittance * jnp.exp(-tau),
                              s.transmittance)

    total_dist = s.total_dist + jnp.where(active, seg_end, 0.0)
    reached = active & (~si.is_valid | (si.t > remaining))
    active_surface = active & si.is_valid & (si.t <= remaining) & ~reached

    null_tr = _eval_null_transmission(scene, si, ray, active_surface)
    transmittance = jnp.where(active_surface[..., None],
                              transmittance * null_tr, transmittance)

    o_new = si.offset_origin(ray.d)
    ray = Ray(o=jnp.where(active_surface[..., None], o_new, ray.o),
              d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
              maxt=remaining, time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | active_surface

    nonzero = jnp.any(transmittance > 0, -1)
    active = active_surface & nonzero
    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                           s.medium_idx)

    return _WalkState(sampler=s.sampler, ray=ray, si=si,
                      needs_intersection=needs_intersection,
                      medium_idx=medium_idx, transmittance=transmittance,
                      total_dist=total_dist, active=active, n_rays=n_rays)


def _walk_step_residual(scene, s: _WalkState, ds, channel, ca=_cond_any):
    """One residual-ratio-tracking NEE-walk step (Novák et al. 2014;
    upgrade of the reference's plain ratio tracking, volpath.cpp:282-365).

    Per step, over the medium segment up to the next surface:
      T_seg = exp(-int sigma_c) * prod_collisions (1 - (sigma - sigma_c)/R)
    with collisions sampled at the detached residual rate
    R >= |sigma - sigma_c| (media.medium_residual_rate). The control
    integral is exact (media.medium_ctrl_tau_segment), so plane-parallel
    profiles produce NO collisions at all and general grids only as many
    grid gathers as the residual heterogeneity warrants. Unbiased for any
    (consistent) control — stale tables after a ParameterMap grid update
    only raise variance. A step either collides (advance inside the
    medium) or crosses the surface bounding the segment (null-transmission
    multiply + medium transition, exactly like the tracked walk)."""
    batch = s.ray.o.shape[:-1]
    nc = s.transmittance.shape[-1]
    remaining = jnp.clip(ds.dist * (1.0 - 1e-4) - s.total_dist,
                         0.0, INVALID_T)
    ray = s.ray.replace(maxt=remaining)
    active = s.active & (remaining > 0)

    do_isect = s.needs_intersection & active
    si = ca(
        do_isect,
        lambda: _merge_si(_walk_hit(ray_intersect(scene.geo, ray)),
                          s.si, do_isect),
        s.si)
    needs_intersection = s.needs_intersection & ~do_isect
    n_rays = s.n_rays + jnp.sum(do_isect)

    seg_end = jnp.minimum(jnp.minimum(si.t, remaining), INVALID_T)
    in_medium = active & (s.medium_idx >= 0)
    med = jnp.maximum(s.medium_idx, 0)
    smp, xi = s.sampler.next_1d()

    # medium segment [a, b] (clipped to the grid AABB and the next surface)
    def med_block():
        seg_ok, mint_m, maxt_m = media.medium_intersect_bounds(
            scene, med, ray, in_medium)
        a = jnp.where(seg_ok, jnp.clip(mint_m, 0.0, seg_end), 0.0)
        b = jnp.where(seg_ok, jnp.clip(maxt_m, 0.0, seg_end), 0.0)
        b = jnp.maximum(a, b)
        # first residual collision from the LOCAL z-profile rate (rate is
        # the rate AT the sampled point — the ratio weight denominator)
        hit_m, dt, rate = media.medium_residual_sample(scene, med, ray,
                                                       a, b, xi)
        hit = in_medium & hit_m
        t1 = jnp.where(hit, dt, b)
        tau_c = media.medium_ctrl_tau_segment(scene, med, ray, a, t1,
                                              ray.wavelengths)
        return hit, jnp.where(hit, dt, 0.0), rate, tau_c

    hit_res, dt, rate, tau_c = ca(
        in_medium, med_block,
        (jnp.zeros(batch, bool), jnp.zeros(batch), jnp.zeros(batch),
         jnp.zeros(batch + (nc,))))
    transmittance = jnp.where(in_medium[..., None],
                              s.transmittance * jnp.exp(-tau_c),
                              s.transmittance)

    # collision weight: 1 - (sigma - sigma_c)/R (can dip epsilon-negative
    # from the f32 safety margin — kept signed, the estimator is unbiased)
    def col_block():
        p_col = ray.at(jnp.where(hit_res, dt, 0.0))
        st = media.medium_sigma_t(scene, med, p_col, ray.wavelengths)
        sc = media.medium_ctrl_sigma(scene, med, p_col, ray.wavelengths)
        den = jax.lax.stop_gradient(jnp.maximum(rate, 1e-20))[..., None]
        return 1.0 - (st - sc) / den

    w_col = ca(hit_res, col_block, jnp.ones(batch + (nc,)))
    transmittance = jnp.where(hit_res[..., None],
                              transmittance * w_col, transmittance)

    # collided lanes advance inside the medium (si stays valid relative)
    total_dist = s.total_dist + jnp.where(
        active, jnp.where(hit_res, dt, seg_end), 0.0)
    ray = ray.replace(
        o=jnp.where(hit_res[..., None],
                    ray.at(jnp.where(hit_res, dt, 0.0)), ray.o),
        mint=jnp.where(hit_res, 0.0, ray.mint))
    si = si.replace(t=jnp.where(hit_res, si.t - dt, si.t))

    # passed lanes reach the segment end: emitter (done) or surface crossing
    passed = active & ~hit_res
    reached = passed & (~si.is_valid | (si.t > remaining))
    active_surface = passed & si.is_valid & (si.t <= remaining) & ~reached

    null_tr = _eval_null_transmission(scene, si, ray, active_surface)
    transmittance = jnp.where(active_surface[..., None],
                              transmittance * null_tr, transmittance)

    o_new = si.offset_origin(ray.d)
    ray = Ray(o=jnp.where(active_surface[..., None], o_new, ray.o),
              d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
              maxt=remaining, time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | active_surface

    nonzero = jnp.any(transmittance != 0.0, -1)
    active = (hit_res | active_surface) & nonzero
    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                           s.medium_idx)

    return _WalkState(sampler=smp, ray=ray, si=si,
                      needs_intersection=needs_intersection,
                      medium_idx=medium_idx, transmittance=transmittance,
                      total_dist=total_dist, active=active, n_rays=n_rays)


def _pseudo_si(p, n, wavelengths, time):
    from ..core.frame import Frame
    from ..render.records import SurfaceInteraction

    batch = p.shape[:-1]
    return SurfaceInteraction(
        t=jnp.zeros(batch), p=p, n=n, sh_frame=Frame.from_normal(n),
        uv=jnp.zeros(batch + (2,)), prim_uv=jnp.zeros(batch + (2,)),
        dp_du=jnp.zeros_like(p),
        dp_dv=jnp.zeros_like(p), wi=jnp.zeros_like(p).at[..., 2].set(1.0),
        wavelengths=wavelengths, time=time,
        prim_index=jnp.zeros(batch, jnp.int32),
        shape_index=jnp.full(batch, -1, jnp.int32))


def _invalid_si_like(scene, ray):
    from ..render.records import invalid_si

    # dtype follows the ray (f64 under the double-precision variant)
    return invalid_si(ray.o.shape[:-1], ray.wavelengths.shape[-1],
                      dtype=ray.o.dtype)


# =============================================================================
# evaluate_direct_light (volpath.cpp:370-465) — walk a BSDF-sampled ray
# through null boundaries/media until an emitter is found
# =============================================================================

@pytree_dataclass
class _DirectState:
    sampler: Sampler
    ray: Ray
    si: _WalkHit
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    transmittance: jnp.ndarray
    emitter_val: jnp.ndarray
    emitter_pdf: jnp.ndarray
    active: jnp.ndarray
    n_rays: jnp.ndarray


def _direct_step_residual(scene, s: _DirectState, ref_p, channel,
                          ca=_cond_any):
    """Residual-ratio-tracking variant of the evaluate_direct_light walk
    body (see _walk_step_residual for the estimator): walk the BSDF-sampled
    ray through media with closed-form control transmittance + sparse
    residual collisions until an emitter (or nothing) is found."""
    batch = s.ray.o.shape[:-1]
    nc = s.transmittance.shape[-1]
    active = s.active
    ray = s.ray

    do_isect = s.needs_intersection & active
    si = ca(
        do_isect,
        lambda: _merge_si(_walk_hit(ray_intersect(scene.geo, ray)),
                          s.si, do_isect),
        s.si)
    needs_intersection = s.needs_intersection & ~do_isect
    n_rays = s.n_rays + jnp.sum(do_isect)

    in_medium = active & (s.medium_idx >= 0)
    med = jnp.maximum(s.medium_idx, 0)
    smp, xi = s.sampler.next_1d()
    seg_end = jnp.minimum(si.t, INVALID_T)

    def med_block():
        seg_ok, mint_m, maxt_m = media.medium_intersect_bounds(
            scene, med, ray, in_medium)
        a = jnp.where(seg_ok, jnp.clip(mint_m, 0.0, seg_end), 0.0)
        b = jnp.where(seg_ok, jnp.clip(maxt_m, 0.0, seg_end), 0.0)
        b = jnp.maximum(a, b)
        hit_m, dt, rate = media.medium_residual_sample(scene, med, ray,
                                                       a, b, xi)
        hit = in_medium & hit_m
        t1 = jnp.where(hit, dt, b)
        tau_c = media.medium_ctrl_tau_segment(scene, med, ray, a, t1,
                                              ray.wavelengths)
        return hit, jnp.where(hit, dt, 0.0), rate, tau_c

    hit_res, dt, rate, tau_c = ca(
        in_medium, med_block,
        (jnp.zeros(batch, bool), jnp.zeros(batch), jnp.zeros(batch),
         jnp.zeros(batch + (nc,))))
    transmittance = jnp.where(in_medium[..., None],
                              s.transmittance * jnp.exp(-tau_c),
                              s.transmittance)

    def col_block():
        p_col = ray.at(dt)
        st = media.medium_sigma_t(scene, med, p_col, ray.wavelengths)
        sc = media.medium_ctrl_sigma(scene, med, p_col, ray.wavelengths)
        den = jax.lax.stop_gradient(jnp.maximum(rate, 1e-20))[..., None]
        return 1.0 - (st - sc) / den

    w_col = ca(hit_res, col_block, jnp.ones(batch + (nc,)))
    transmittance = jnp.where(hit_res[..., None],
                              transmittance * w_col, transmittance)

    ray = ray.replace(
        o=jnp.where(hit_res[..., None],
                    ray.at(jnp.where(hit_res, dt, 0.0)), ray.o),
        mint=jnp.where(hit_res, 0.0, ray.mint))
    si = si.replace(t=jnp.where(hit_res, si.t - dt, si.t))

    # passed lanes reach the segment end: emitter hit / null crossing
    passed = active & ~hit_res
    em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
    hit_area = passed & si.is_valid & (em_idx >= 0)
    hit_env = passed & ~si.is_valid & (scene.config.env_emitter >= 0)
    emitter_hit = hit_area | hit_env

    def _emitter_block():
        si_v = si.view(ray.wavelengths)
        e_area = emitters.eval_emitter_hit(scene, si_v, hit_area)
        e_env = emitters.eval_environment(scene, ray, ~si.is_valid, hit_env)
        e_val = jnp.where(emitter_hit[..., None],
                          transmittance * (e_area + e_env), s.emitter_val)
        epdf = emitters.pdf_emitter_direction(
            scene, ref_p, si_v, ~si.is_valid, emitter_hit, d=ray.d)
        return e_val, jnp.where(emitter_hit, epdf, s.emitter_pdf)

    emitter_val, emitter_pdf = ca(
        emitter_hit, _emitter_block, (s.emitter_val, s.emitter_pdf))
    active = active & ~emitter_hit
    hit_res = hit_res & active

    active_surface = passed & active & si.is_valid
    null_tr = _eval_null_transmission(scene, si, ray, active_surface)
    transmittance = jnp.where(active_surface[..., None],
                              transmittance * null_tr, transmittance)

    o_new = si.offset_origin(ray.d)
    ray = Ray(o=jnp.where(active_surface[..., None], o_new, ray.o),
              d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
              maxt=ray.maxt, time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | active_surface

    nonzero = jnp.any(transmittance != 0.0, -1)
    active = (hit_res | active_surface) & nonzero
    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                           s.medium_idx)
    return _DirectState(sampler=smp, ray=ray, si=si,
                        needs_intersection=needs_intersection,
                        medium_idx=medium_idx, transmittance=transmittance,
                        emitter_val=emitter_val, emitter_pdf=emitter_pdf,
                        active=active, n_rays=n_rays)


def _evaluate_direct_light(scene, ref_p, ray, si_ray, medium_idx, channel,
                           sampler, active, nee_steps, use_while=False,
                           gate_sites=True, remat_walks=False,
                           prb_walks=False):
    batch = ref_p.shape[:-1]
    nc = _nc(scene, ray)

    state = _DirectState(
        sampler=sampler, ray=ray, si=_walk_hit(si_ray),
        needs_intersection=jnp.zeros(batch, bool),
        medium_idx=medium_idx,
        transmittance=jnp.where(active[..., None], jnp.ones(batch + (nc,)), 0.0),
        emitter_val=jnp.zeros(batch + (nc,)),
        emitter_pdf=jnp.zeros(batch),
        active=active, n_rays=jnp.zeros(()))

    ca = _cond_any if gate_sites else _ungated
    extra = dict(scene.config.integrator.extra)
    if extra.get("nee_transmittance", "residual") == "residual":
        # (under het_profile1d the residual tables are identically zero, so
        # this body is the exact closed form with a dead collision site)
        final = _run_walk(
            lambda s: _direct_step_residual(scene, s, ref_p, channel, ca=ca),
            state, nee_steps, use_while, remat=remat_walks, prb=prb_walks)
        return (final.emitter_val, final.emitter_pdf, final.sampler,
                final.n_rays)

    def body(s: _DirectState):
        active = s.active
        active_medium = active & (s.medium_idx >= 0)
        active_surface = active & ~active_medium
        smp = s.sampler
        ray = s.ray

        med = jnp.maximum(s.medium_idx, 0)
        smp, xi = smp.next_1d()
        mi = ca(
            active_medium,
            lambda: media.sample_interaction(scene, med, ray, xi, channel,
                                             active_medium),
            _invalid_mi(batch, nc))
        # merged medium+surface intersection (disjoint lane sets, same ray —
        # see _sample_emitter)
        do_isect = s.needs_intersection & (active_medium | active_surface)
        si = ca(
            do_isect,
            lambda: _merge_si(_walk_hit(ray_intersect(scene.geo, ray)),
                              s.si, do_isect),
            s.si)
        n_rays = s.n_rays + jnp.sum(do_isect)

        mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t), INVALID_T, mi.t))
        tr, ff_pdf = media.eval_tr_and_pdf(mi, si.t)
        tr_pdf = _index_ch(ff_pdf, channel)
        ok_pdf = tr_pdf > 1e-15  # pdf^2 appears in the division VJP: keep it representable
        den = jax.lax.stop_gradient(
            jnp.where(ok_pdf, tr_pdf, 1.0))[..., None]
        ratio = jnp.where(ok_pdf[..., None], tr / den, 0.0)
        transmittance = jnp.where(active_medium[..., None],
                                  s.transmittance * ratio, s.transmittance)

        needs_intersection = s.needs_intersection & ~do_isect
        escaped_medium = active_medium & ~mi.is_valid
        active_medium = active_medium & mi.is_valid

        ray = ray.replace(
            o=jnp.where(active_medium[..., None], mi.p, ray.o),
            mint=jnp.where(active_medium, 0.0, ray.mint))
        si = si.replace(t=jnp.where(active_medium, si.t - mi.t, si.t))
        transmittance = jnp.where(active_medium[..., None],
                                  transmittance * mi.sigma_n, transmittance)

        active_surface = active_surface | escaped_medium

        # emitter hit? (area on valid si, env on escape)
        em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
        hit_area = active_surface & si.is_valid & (em_idx >= 0)
        hit_env = active_surface & ~si.is_valid & (scene.config.env_emitter >= 0)
        emitter_hit = hit_area | hit_env

        def _emitter_block():
            si_v = si.view(ray.wavelengths)
            e_area = emitters.eval_emitter_hit(scene, si_v, hit_area)
            e_env = emitters.eval_environment(scene, ray, ~si.is_valid, hit_env)
            e_val = jnp.where(emitter_hit[..., None],
                              transmittance * (e_area + e_env), s.emitter_val)
            epdf = emitters.pdf_emitter_direction(
                scene, ref_p, si_v, ~si.is_valid, emitter_hit, d=ray.d)
            return e_val, jnp.where(emitter_hit, epdf, s.emitter_pdf)

        emitter_val, emitter_pdf = ca(
            emitter_hit, _emitter_block, (s.emitter_val, s.emitter_pdf))
        active = active & ~emitter_hit
        active_surface = active_surface & active
        active_medium = active_medium & active

        active_surface = active_surface & si.is_valid & ~active_medium
        null_tr = _eval_null_transmission(scene, si, ray, active_surface)
        transmittance = jnp.where(active_surface[..., None],
                                  transmittance * null_tr, transmittance)

        o_new = si.offset_origin(ray.d)
        ray = Ray(o=jnp.where(active_surface[..., None], o_new, ray.o),
                  d=ray.d, mint=jnp.where(active_surface, 0.0, ray.mint),
                  maxt=ray.maxt, time=ray.time, wavelengths=ray.wavelengths)
        needs_intersection = needs_intersection | active_surface

        nonzero = jnp.any(transmittance > 0, -1)
        active = (active_medium | active_surface) & nonzero
        has_trans = active_surface & _is_medium_transition(scene, si)
        medium_idx = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                               s.medium_idx)
        return _DirectState(sampler=smp, ray=ray, si=si,
                            needs_intersection=needs_intersection,
                            medium_idx=medium_idx, transmittance=transmittance,
                            emitter_val=emitter_val, emitter_pdf=emitter_pdf,
                            active=active, n_rays=n_rays)

    final = _run_walk(body, state, nee_steps, use_while, remat=remat_walks,
                      prb=prb_walks)
    return final.emitter_val, final.emitter_pdf, final.sampler, final.n_rays


# =============================================================================
# the main loop (volpath.cpp:38-258)
# =============================================================================

@pytree_dataclass
class _VolPathState:
    sampler: Sampler
    ray: Ray
    si: SurfaceInteraction
    needs_intersection: jnp.ndarray
    medium_idx: jnp.ndarray
    throughput: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray          # (...,) i32 per lane
    channel: jnp.ndarray        # (...,) i32
    specular_chain: jnp.ndarray
    valid_ray: jnp.ndarray
    active: jnp.ndarray
    n_rays: jnp.ndarray  # () f32 — rays traced (bench accounting)


_DEBUG_STATES = []  # populated only under ERT_UNROLL_DEBUG


def _probe(name, x):
    """Debug-only identity that reports NaN cotangents (ERT_UNROLL_DEBUG)."""
    import os as _os
    if not _os.environ.get("ERT_PROBE"):
        return x

    @jax.custom_vjp
    def _id(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, ct):
        bad = jnp.any(jnp.isnan(ct)) | jnp.any(jnp.isinf(ct))
        jax.debug.print(name + " ct bad: {b}", b=bad)
        return (ct,)

    _id.defvjp(_fwd, _bwd)
    return _id(x)


def _bounce(scene, s: _VolPathState, *, nee_steps, max_depth, rr_depth,
            while_walks=False, gate_sites=True, gate_walks=None,
            remat_walks=False, prb_walks=False):
    """One masked wavefront bounce (the loop body of volpath.cpp:38-258).
    Module-level so both the fixed-trip tracer (_trace_full) and the
    regenerating wavefront driver can drive it."""
    batch = s.ray.o.shape[:-1]
    nc = s.throughput.shape[-1]
    ca = _cond_any if gate_sites else _ungated
    # walks may gate independently of the bounce-level sites: in the
    # path-replay adjoint sweep the bounce-level conds are always-taken
    # (regen occupancy ~100%) and their vjp transpose forces whole-lane
    # relayout copies, while the scan-walk STEP gates skip real work
    # (most walks converge in 1-3 of nee_steps steps)
    gate_walks = gate_sites if gate_walks is None else gate_walks
    smp = s.sampler
    active = s.active & jnp.any(s.throughput != 0.0, -1)
    ray = s.ray
    si = s.si
    result = s.result

    # --- russian roulette (volpath.cpp:79-87) ----------------------------
    q = jnp.minimum(jnp.max(s.throughput, -1) * s.eta ** 2, 0.95)
    q = jax.lax.stop_gradient(jnp.maximum(q, 1e-6))
    perform_rr = s.depth > rr_depth
    smp, xi_rr = smp.next_1d()
    active = active & ((xi_rr < q) | ~perform_rr)
    throughput = jnp.where(perform_rr[..., None], s.throughput / q[..., None],
                           s.throughput)

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
    # ONE intersection serves both medium and surface lanes: the sets
    # are disjoint and the ray is identical for both at this point (the
    # later phase-sampling only rewrites medium-lane rays)
    do_isect = s.needs_intersection & (active_medium | active_surface)
    si = ca(
        do_isect,
        lambda: _merge_si(ray_intersect(scene.geo, ray), si, do_isect),
        si)
    n_rays = s.n_rays + jnp.sum(do_isect)
    needs_intersection = s.needs_intersection & ~do_isect
    mi = mi.replace(t=jnp.where(active_medium & (si.t < mi.t), INVALID_T, mi.t))

    tr, ff_pdf = media.eval_tr_and_pdf(mi, si.t)
    tr_pdf = _index_ch(ff_pdf, s.channel)
    ok_pdf = tr_pdf > 1e-15  # pdf^2 appears in the division VJP: keep it representable
    den = jnp.where(ok_pdf, tr_pdf, 1.0)[..., None]
    ratio = _probe("ratio", jnp.where(ok_pdf[..., None], tr / den, 0.0))
    throughput = jnp.where(active_medium[..., None], throughput * ratio,
                           throughput)
    throughput = _probe("tp_after_ratio", throughput)

    escaped_medium = active_medium & ~mi.is_valid
    active_medium = active_medium & mi.is_valid

    # null vs real collision — detached classification probability
    smp, xi_n = smp.next_1d()
    p_real = jax.lax.stop_gradient(
        _index_ch(mi.sigma_t, s.channel)
        / jnp.maximum(_index_ch(mi.combined_extinction, s.channel), 1e-30))
    null_scatter = xi_n >= p_real
    act_null = null_scatter & active_medium
    act_scatter = ~null_scatter & active_medium

    sn_ch = _index_ch(mi.sigma_n, s.channel)
    sn_den = jax.lax.stop_gradient(
        jnp.where(act_null & (sn_ch > 1e-15), sn_ch, 1.0))[..., None]
    throughput = jnp.where(
        (act_null & (sn_ch > 1e-15))[..., None],
        throughput * mi.sigma_n
        * _index_ch(mi.combined_extinction, s.channel)[..., None]
        / sn_den,
        throughput)
    depth = s.depth + act_scatter.astype(jnp.int32)
    active = active & (depth < max_depth)
    act_scatter = act_scatter & active

    # null: advance (volpath.cpp:128-144)
    ray = ray.replace(
        o=jnp.where(act_null[..., None], mi.p, ray.o),
        mint=jnp.where(act_null, 0.0, ray.mint))
    si = si.replace(t=jnp.where(act_null, si.t - mi.t, si.t))

    # real scatter (volpath.cpp:146-175)
    st_ch = _index_ch(mi.sigma_t, s.channel)
    st_den = jax.lax.stop_gradient(
        jnp.where(act_scatter & (st_ch > 1e-15), st_ch, 1.0))[..., None]
    throughput = jnp.where(
        (act_scatter & (st_ch > 1e-15))[..., None],
        throughput * mi.sigma_s
        * _index_ch(mi.combined_extinction, s.channel)[..., None]
        / st_den,
        throughput)
    valid_ray = s.valid_ray | act_scatter
    specular_chain = s.specular_chain & ~act_scatter

    throughput = _probe("tp_after_scatter", throughput)
    phase_idx = _medium_phase(scene, s.medium_idx)
    # medium-NEE context (the walk itself is merged with the surface NEE
    # below — the lane sets are disjoint, so one bounded walk serves both)
    nee_medium_p = mi.p
    nee_medium_d_in = ray.d  # pre-phase-sample direction for phase_eval

    # phase sampling
    smp, xi_p1 = smp.next_1d()
    smp, xi_p2 = smp.next_2d()
    wo_m, _ppdf = ca(
        act_scatter,
        lambda: phase.phase_sample(scene, phase_idx, ray.d, xi_p1, xi_p2,
                                   act_scatter),
        (ray.d, jnp.zeros(batch)))
    wo_m = _probe("wo_m", wo_m)
    scale = 1.0 + jnp.max(jnp.abs(mi.p), -1)
    ray = Ray(
        o=jnp.where(act_scatter[..., None], mi.p, ray.o),
        d=jnp.where(act_scatter[..., None], wo_m, ray.d),
        mint=jnp.where(act_scatter, 0.0, ray.mint),
        maxt=jnp.where(act_scatter, INVALID_T, ray.maxt),
        time=ray.time, wavelengths=ray.wavelengths)
    needs_intersection = needs_intersection | act_scatter
    ray = ray.replace(d=_probe("ray_d_mid", ray.d),
                      o=_probe("ray_o_mid", ray.o))

    # --- surface interactions (volpath.cpp:180-252; si is fresh from the
    # merged intersect above) ----------------------------------------------
    active_surface = active_surface | escaped_medium

    # emitter hits on specular chains only
    em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
    hit_area = active_surface & si.is_valid & (em_idx >= 0)
    hit_env = active_surface & ~si.is_valid & (scene.config.env_emitter >= 0)
    use_emit = (hit_area | hit_env) & specular_chain
    e_val = ca(
        use_emit,
        lambda: emitters.eval_emitter_hit(scene, si, use_emit & hit_area)
        + emitters.eval_environment(scene, ray, ~si.is_valid,
                                    use_emit & hit_env),
        jnp.zeros(batch + (nc,)))
    e_val = _probe("e_val_hit", e_val)
    result = result + jnp.where(use_emit[..., None], throughput * e_val, 0.0)

    active_surface = active_surface & si.is_valid
    bsdf_idx = _tg(scene.shape_bsdf, jnp.maximum(si.shape_index, 0))
    flags = _tg(scene.bsdf_flags, bsdf_idx)
    is_smooth = (flags & bsdf_flags.Smooth) != 0

    # merged NEE: one transmittance walk serves the (disjoint) medium
    # and surface lane sets
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
        # medium lanes: phase x emitted
        phase_val = phase.phase_eval(scene, phase_idx, -nee_medium_d_in,
                                     ds_s.d, act_scatter)
        delta_m = jnp.where(
            act_scatter[..., None],
            throughput * phase_val[..., None] * emitted_s, 0.0)
        wo_local = si.to_local(ds_s.d)
        bsdf_val, bsdf_pdf = bsdfs.bsdf_eval_pdf(scene, bsdf_idx, si,
                                                 wo_local, active_e)
        mis_pdf = jnp.where(ds_s.delta, 0.0, bsdf_pdf)
        w_nee = jnp.where(ds_s.pdf > 0,
                          mis_weight(ds_s.pdf, mis_pdf), 0.0)
        delta_s = jnp.where(
            active_e[..., None],
            throughput * bsdf_val * w_nee[..., None] * emitted_s, 0.0)
        return delta_m + delta_s, smp2, nr_s

    def _nee_skip():
        # keep the RNG stream aligned with the taken branch: the walk
        # consumes exactly 3 + nee_steps dims (pick, s1, s2, then one
        # xi per step)
        return (jnp.zeros(batch + (nc,)),
                smp.replace(dim=smp.dim + jnp.uint32(3 + nee_steps)),
                jnp.zeros(()))

    nee_delta, smp, nr_s = (jax.lax.cond(jnp.any(nee_active), _nee_block,
                                         _nee_skip)
                            if gate_sites else _nee_block())
    result = result + _probe("nee_delta", nee_delta)
    n_rays = n_rays + nr_s

    # bsdf sampling
    smp, xb1 = smp.next_1d()
    smp, xb2 = smp.next_2d()
    bs, bsdf_weight = ca(
        active_surface,
        lambda: bsdfs.bsdf_sample(scene, bsdf_idx, si, xb1, xb2,
                                  active_surface),
        bsdf_flags.zero_bsdf_sample(batch, nc))
    bsdf_weight = _probe("bsdf_weight", bsdf_weight)
    throughput = jnp.where(active_surface[..., None],
                           throughput * bsdf_weight, throughput)
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
        jnp.any(throughput != 0, -1) & (depth < max_depth) & \
        (scene.config.n_emitters > 0)
    si_new = ca(
        active_surface,
        lambda: _merge_si(ray_intersect(scene.geo, ray), si,
                          active_surface),
        si)
    n_rays = n_rays + jnp.sum(active_surface)
    needs_intersection = needs_intersection & ~active_surface

    # medium transition before walking the direct ray
    has_trans = active_surface & _is_medium_transition(scene, si)
    medium_next = jnp.where(has_trans, _target_medium(scene, si, ray.d),
                            s.medium_idx)

    if _all_emitters_delta(scene.config):
        # static shortcut: a BSDF-sampled ray can never land on a
        # delta-position/-direction emitter, so the MIS walk is dead
        # code for such scenes (volpath.cpp's evaluate_direct_light
        # would return 0 every time)
        pass
    else:
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
        emitted_d = _probe("direct_emitted", emitted_d)
        result = result + jnp.where(
            (add_emitter & (emitter_pdf > 0))[..., None],
            throughput * w_dir[..., None] * emitted_d, 0.0)

    si = _merge_si(si_new, si, active_surface)
    si = si.replace(p=_probe("si_p_end", si.p), t=_probe("si_t_end", si.t))
    active = active & (active_surface | active_medium)

    keepf = lambda new, old, m: jnp.where(
        m[..., None] if new.ndim > m.ndim else m, new, old)
    return _VolPathState(
        sampler=smp, ray=ray, si=si,
        needs_intersection=needs_intersection,
        medium_idx=medium_next,
        throughput=throughput, result=result,
        eta=eta, depth=depth, channel=s.channel,
        specular_chain=specular_chain, valid_ray=valid_ray,
        active=active, n_rays=n_rays)



# the regen driver's path-replay backward (integrators/replay.py) may
# differentiate this integrator: its carry exposes the additive `result`
# and multiplicative `throughput` channels the analytic cotangents need,
# and every other float carry field (eta: only feeds the detached RR
# probability; si/ray: theta-independent trajectory for value-class
# parameters) has an exactly-zero cotangent under the detach discipline
_REPLAY_OK = True

# bounce kwargs for the path-replay ADJOINT sweep (integrators/replay.py).
# Measured on the chip (r5 ablations, flagship spp=16): walk-step cond
# gates made the adjoint 4.3x SLOWER (1891 ms vs 444 ms — cond
# transposes relayout the whole lane state per step) and bounce-level
# gates were worse still (2445 ms), so gates are platform-dependent
# (None -> off on TPU, on on CPU). prb_walks runs the NEE walks through
# their own PRB custom_vjp (_run_walk_prb: early-exiting while loops in
# BOTH adjoint passes instead of a fixed-trip scan + transpose) — 441 ms
# -> 198 ms; remat_walks stays on as the fallback configuration's memory
# policy (irrelevant under prb).
_REPLAY_BOUNCE_KWARGS = {"gate_sites": None, "gate_walks": None,
                         "remat_walks": True, "prb_walks": True}

# extra bounce kwargs the regenerating (primal-only, while_loop) driver
# may add on top of _knobs' — see integrators.render_wavefront_regen
# gate_sites None = decided by the driver per backend: on TPU the always-
# taken site conds only add kernel-graph boundaries (launch latency); on CPU
# they skip real work at partially-dead sites
_PRIMAL_BOUNCE_KWARGS = {"while_walks": True, "gate_sites": None}


def _knobs(scene):
    """(max_iterations, bounce kwargs) — the regen-driver contract; defaults
    tuned for TPU (every masked iteration costs real kernels),
    load_dict-overridable via the integrator's extra properties."""
    cfg = scene.config.integrator
    extra = dict(cfg.extra)
    max_iterations = int(extra.get("max_iterations", cfg.max_depth + 8))
    nee_steps = int(extra.get("nee_steps", 8))
    kw = dict(nee_steps=nee_steps, max_depth=cfg.max_depth,
              rr_depth=cfg.rr_depth)
    if "gate_sites" in extra:  # scan-driver gate override (perf knob)
        kw["gate_sites"] = bool(extra["gate_sites"])
    return max_iterations, kw


def _init_state(scene, sampler: Sampler, ray: Ray, active=None,
                medium_idx=None):
    """Fresh per-lane path state for the wavefront (the pre-loop section of
    volpath.cpp:38-77). Used by both _trace_full and the regenerating
    driver's lane refill."""
    batch = ray.o.shape[:-1]
    nc = _nc(scene, ray)
    if active is None:
        active = jnp.ones(batch, bool)
    v0 = 0.0 * ray.o[..., 0]
    active = active & (v0 == 0.0)
    if medium_idx is None:
        medium_idx = jnp.full(batch, scene.config.sensor_medium, jnp.int32)

    # spectral channel selection (volpath.cpp:63-67)
    if scene.config.variant.mode == "rgb":
        sampler, cs = sampler.next_1d()
        channel = jnp.minimum((cs * 3).astype(jnp.int32), 2)
    else:
        channel = jnp.zeros(batch, jnp.int32)

    hide = scene.config.integrator.hide_emitters
    valid_ray = jnp.full(batch, (not hide) and scene.config.env_emitter >= 0)
    valid_ray = valid_ray & (v0 == 0.0) | (v0 != 0.0) & valid_ray

    return _VolPathState(
        sampler=sampler, ray=ray,
        si=_invalid_si_like(scene, ray),
        needs_intersection=jnp.ones(batch, bool) & (v0 == 0.0),
        medium_idx=medium_idx + (0 * v0).astype(jnp.int32),
        throughput=jnp.ones(batch + (nc,)) + v0[..., None],
        result=jnp.zeros(batch + (nc,)),
        eta=jnp.ones(batch) + v0,
        depth=jnp.zeros(batch, jnp.int32),
        channel=channel,
        specular_chain=active & (not hide),
        valid_ray=valid_ray,
        active=active, n_rays=jnp.zeros(()))


def _trace_full(scene, sampler: Sampler, ray: Ray, active=None,
                medium_idx=None):
    max_iterations, bkw = _knobs(scene)
    nee_steps = bkw["nee_steps"]
    max_depth = bkw["max_depth"]
    rr_depth = bkw["rr_depth"]
    state = _init_state(scene, sampler, ray, active, medium_idx)

    def body(s):
        return _bounce(scene, s, nee_steps=nee_steps,
                       max_depth=max_depth, rr_depth=rr_depth)

    def scan_body(s, _):
        return body(s), None

    import os as _os
    if _os.environ.get("ERT_UNROLL_DEBUG"):
        final = state
        _DEBUG_STATES.clear()
        _DEBUG_STATES.append(final)
        for _ in range(max_iterations):
            final = body(final)
            _DEBUG_STATES.append(final)
    else:
        # path-replay-style memory when the wavefront is large: recompute
        # bounces in the backward pass (common.remat_scan_body policy)
        body_fn = common_remat(scene, scan_body, ray.o.shape[:-1],
                               max_iterations)
        final, _ = jax.lax.scan(body_fn, state, None, length=max_iterations)
    return final


def sample(scene, sampler: Sampler, ray: Ray, active=None, medium_idx=None):
    final = _trace_full(scene, sampler, ray, active, medium_idx)
    return final.result, final.valid_ray, final.sampler


def sample_counted(scene, sampler: Sampler, ray: Ray, active=None,
                   medium_idx=None):
    """Like sample() but also returns the number of rays traced (the bench
    metric denominator — counts every masked-lane ray_intersect actually
    issued, including NEE transmittance walks)."""
    final = _trace_full(scene, sampler, ray, active, medium_idx)
    return final.result, final.valid_ray, final.sampler, final.n_rays
