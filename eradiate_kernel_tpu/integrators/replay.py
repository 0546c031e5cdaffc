"""Path-replay backward pass for the regenerating wavefront driver.

The reference differentiates the *same* wavefront program it renders
(src/librender/integrator.cpp:140-172 + the Enoki tape); until round 5 this
framework's fast driver (``render_wavefront_regen``, a ``lax.while_loop``)
was primal-only and gradient renders fell back to the fixed-trip scan
driver at ~1/6.5 of regen throughput. This module closes that gap with the
SURVEY §7 design ("Autodiff = custom_vjp on the whole render with
path-replay backward"): a ``jax.custom_vjp`` whose backward *re-runs* the
regenerating render — same stateless threefry counters, so the replay
retraces the identical paths — and accumulates parameter adjoints
bounce-by-bounce instead of taping (Vicini et al. 2021, "Path Replay
Backpropagation", re-derived for the masked-wavefront lane pool).

Math. Per sample, the radiance estimate factorizes along the path:
L = sum_k Delta_k with Delta_k = tau_k * delta_k(theta), where
tau_k = prod_{j<k} T_j(theta) is the carried ``throughput`` and delta_k the
bounce-local factors (NEE, emitter hits). With the detach discipline
(volpath.cpp:83) and *value-class* parameters (volume grids, textures,
albedos, emitter radiance, spectra — anything that does not move sampled
trajectories), the path geometry is theta-independent, so exact reverse
mode needs only the cotangents of the two value carries:

    ct(result_j)     = delta_pix                   (additive accumulator)
    ct(throughput_j) = delta_pix * R_j / tau_j     (multiplicative chain)

with R_j = L - result_j the per-lane *radiance to go*, computable during a
forward replay from the per-sample totals the primal pass logged
(``render_wavefront_regen(..., sample_log=True)``). Each replay bounce then
runs ONE local ``jax.vjp`` of the bounce body w.r.t. the scene's float
leaves with exactly those output cotangents — O(1) memory in path length,
and *identical* to the scan driver's ``jax.grad`` for value-class
parameters (the dropped cross-bounce trajectory cotangents are zero
there). For trajectory-class parameters (shape vertices, lobe shapes
entering sampled directions, MIS pdfs carried across bounces) this is the
standard detached-sampling approximation — use the scan driver when those
must be attached.

Division caveat (shared with every PRB implementation): ct(throughput) uses
R/tau, undefined where a throughput channel is exactly 0; such lanes
contribute 0 (correct except exactly at parameter values that zero a
factor, e.g. albedo == 0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import Sampler
from ..films import film_gather


# =============================================================================
# scene pytree partition (float leaves are the differentiation targets)
# =============================================================================

_TRAJECTORY_PREFIXES = ("geo",)


def _partition(scene):
    """(floats tuple, rebuild fn): split the scene pytree into its inexact
    (differentiable) leaves and a closure that reassembles the scene from
    them (integer/bool leaves captured as constants).

    Geometry leaves (the ``scene.geo`` subtree: vertices, triangle tiles,
    BVH boxes, analytic shape params, instance transforms) are excluded
    from the differentiation set. Replay gradients are detached-sampling
    (module docstring): trajectory-class cotangents would be incomplete
    anyway, and their transpose machinery dominated the adjoint profile —
    the mesh-intersect matmul transposed into a per-triangle sequential
    loop costing ~half the sweep (measured r5, 21 ms/iteration on a
    12-triangle scene). Their cotangent is an explicit, documented zero."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(scene)
    idx = [i for i, (path, x) in enumerate(leaves)
           if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
           and not (path and getattr(path[0], "name", None)
                    in _TRAJECTORY_PREFIXES)]
    leaves = [x for _p, x in leaves]
    floats = tuple(leaves[i] for i in idx)

    def rebuild(fl):
        out = list(leaves)
        for i, v in zip(idx, fl):
            out[i] = v
        return jax.tree_util.tree_unflatten(treedef, out)

    return floats, idx, leaves, treedef, rebuild


def _zero_ct(tree):
    """Cotangent pytree of zeros matching ``tree``: float leaves get real
    zeros, integer/bool leaves the symbolic float0 zero jax.vjp expects."""
    def z(x):
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros(x.shape, x.dtype)
        return np.zeros(x.shape, jax.dtypes.float0)
    return jax.tree_util.tree_map(z, tree)


def replay_supported(cfg) -> bool:
    from . import REGISTRY
    mod = REGISTRY[cfg.integrator.kind]
    return bool(getattr(mod, "_REPLAY_OK", False))


# =============================================================================
# the adjoint sweep: a regenerating replay that accumulates scene adjoints
# =============================================================================

def _adjoint_sweep(scene, seed, slog, ct_film, n_lanes, spp):
    """Replay the regen render (same seed -> same threefry counters -> same
    paths) while accumulating d(loss)/d(scene float leaves). Mirrors
    ``integrators.render_wavefront_regen``'s lane-pool schedule exactly;
    the bounce body runs through the *differentiable* (scan-walk, gated)
    configuration, and each iteration performs one local jax.vjp with the
    analytic result/throughput cotangents derived in the module docstring.

    Everything per-SAMPLE (the film-cotangent-to-result-cotangent map
    through ray weight, spectral->XYZ and the filter footprint, plus the
    sensor-parameter adjoint d(film)/d(ray_weight)) is hoisted OUT of the
    loop into one vectorized pass over all ``total`` samples — the loop
    body touches the film never and the per-sample tables through exactly
    one packed row gather per iteration (in-loop film scatters and
    repeated narrow gathers are the regen driver's measured top costs)."""
    from . import REGISTRY
    from . import _lane_values
    from .volpath import match_dtypes
    from .. import sensors

    cfg = scene.config
    mod = REGISTRY[cfg.integrator.kind]
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    cx, cy = cfg.crop_offset
    total = ch * cw * spp
    n_buf = (-(-total // spp) + 1) * spp
    rp = dict(cfg.rfilter_params)
    max_iterations, bounce_kwargs = mod._knobs(scene)
    # NOTE: no _PRIMAL_BOUNCE_KWARGS here — the replay bounce must be
    # reverse-differentiable, so NEE walks run as bounded scans
    # (bitwise-equivalent decisions; see _run_walk). The integrator's
    # _REPLAY_BOUNCE_KWARGS tune the differentiable configuration
    # (walk-step gates, per-step remat, platform-dependent block gates).
    bounce_kwargs = dict(bounce_kwargs,
                         **getattr(mod, "_REPLAY_BOUNCE_KWARGS", {}))
    if (bounce_kwargs.get("gate_sites", True) is None
            or bounce_kwargs.get("gate_walks", True) is None):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        for k in ("gate_sites", "gate_walks"):
            if bounce_kwargs.get(k, True) is None:
                bounce_kwargs[k] = platform != "tpu"
    import json as _json
    import os as _os
    env_kw = _os.environ.get("ERT_REPLAY_KW")  # ablation hook (perf work)
    if env_kw:
        bounce_kwargs.update(_json.loads(env_kw))
    # The sweep's lane count is independent of the forward's: trajectories
    # are keyed per SAMPLE (fresh_lanes seeds by sample index), so the
    # adjoint may pick a larger pool to amortize its higher per-iteration
    # fixed cost over fewer iterations. Tunable via the integrator extra
    # 'replay_lanes' or ERT_REPLAY_LANES.
    extra_cfg = dict(cfg.integrator.extra)
    n_lanes = int(_os.environ.get("ERT_REPLAY_LANES",
                                  extra_cfg.get("replay_lanes", n_lanes)))

    floats, _idx, _leaves, _treedef, rebuild = _partition(scene)

    def sensor_stream(sc, lane, n):
        """Exactly render_wavefront_regen.fresh_lanes' sample stream."""
        smp = Sampler.seed(seed, lane, kind=cfg.sampler_kind, spp=spp)
        smp, jitter = smp.next_2d()
        pixel = (lane // jnp.uint32(spp)).astype(jnp.uint32)
        px = (pixel % cw).astype(jnp.float32) + cx
        py = (pixel // cw).astype(jnp.float32) + cy
        pos = jnp.stack([px, py], -1) + jitter
        pos_film = pos / jnp.asarray([W, H], jnp.float32)
        ray, rw, smp = sensors.sample_ray(sc, smp, pos_film, jnp.zeros(n))
        return smp, ray, rw, pos

    def merge_lanes(fresh, old, mask):
        return jax.tree_util.tree_map(
            lambda a, b: b if a.ndim < mask.ndim else jnp.where(
                mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim)), a, b),
            fresh, old)

    # ---- hoisted per-sample pass: delta + sensor adjoints, all samples --
    all_idx = jnp.arange(total, dtype=jnp.uint32)
    _smp_a, _ray_a, _rw_a, pos_all = sensor_stream(scene, all_idx, total)
    ct_rows = film_gather(ct_film,
                          pos_all - jnp.asarray([cx, cy], jnp.float32),
                          cfg.rfilter, rp)
    ct_rows = jax.lax.stop_gradient(ct_rows)
    L_all = slog[:total]

    def samples_val(fl, L_b):
        sc = rebuild(fl)
        _smp, ray_a, rw_a, _pos = sensor_stream(sc, all_idx, total)
        vals = _lane_values(cfg, L_b * rw_a, jnp.ones(total, bool),
                            ray_a.wavelengths)
        return jnp.sum(vals * ct_rows)

    _v_unused, vjp_samples = jax.vjp(samples_val, floats, L_all)
    g_sensor, delta_all = vjp_samples(jnp.ones(()))
    # one packed per-sample table -> ONE row gather per loop iteration
    table = jnp.concatenate([delta_all, slog[:total]], axis=-1)

    smp0, ray0, _rw0, _pos0 = sensor_stream(
        scene, jnp.zeros(n_lanes, jnp.uint32), n_lanes)
    vp0 = mod._init_state(scene, smp0, ray0, jnp.zeros(n_lanes, bool))
    nc = vp0.result.shape[-1]
    grads0 = tuple(jnp.zeros_like(f) for f in g_sensor)
    state0 = (vp0, jnp.zeros(n_lanes, bool), jnp.zeros(n_lanes, jnp.int32),
              jnp.uint32(0), jnp.zeros((n_lanes, nc)),
              jnp.zeros((n_lanes, nc)), grads0, jnp.int32(0))

    total_u = jnp.uint32(total)

    def cond(st):
        occupied, next_sample, it = st[1], st[3], st[7]
        cap = jnp.int32(20 * max_iterations * (1 + total // n_lanes))
        return ((next_sample < total_u) | jnp.any(occupied)) & (it < cap)

    def body(st):
        vp, occupied, its, next_sample, delta, L_bar, grads, it = st

        # 1. harvest: finished lanes free up (their contributions were
        # already counted bounce-by-bounce; nothing to write)
        occupied = occupied & vp.active
        delta = jnp.where(occupied[..., None], delta, 0.0)

        # 2. refill dead lanes with the next unstarted samples; their
        # (delta, L) rows arrive in one packed gather
        dead = ~occupied
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - dead.astype(jnp.uint32)
        new_idx = next_sample + rank
        refill = dead & (new_idx < total_u)

        slot = jnp.minimum(new_idx, jnp.uint32(total - 1)).astype(jnp.int32)
        row = jnp.where(refill[..., None], table[slot], 0.0)
        delta_new = row[..., :nc]
        L_new = row[..., nc:]

        # primal lane refresh (identical to the forward driver's)
        lane = jnp.where(refill, new_idx, 0).astype(jnp.uint32)
        smp_f, ray_f, _rw_f, _pos_f = sensor_stream(scene, lane, n_lanes)
        fresh_vp = mod._init_state(scene, smp_f, ray_f, refill)
        if hasattr(fresh_vp, "si"):
            fresh_vp = fresh_vp.replace(si=vp.si)
        vp = merge_lanes(fresh_vp, vp, refill)
        delta = jnp.where(refill[..., None], delta_new, delta)
        L_bar = jnp.where(refill[..., None], L_new, L_bar)
        occupied = occupied | refill
        its = jnp.where(refill, 0, its)
        next_sample = next_sample + jnp.sum(refill, dtype=jnp.uint32)

        # 3. one bounce + its local vjp with the analytic cotangents
        vp_in = vp.replace(active=vp.active & occupied,
                           n_rays=jnp.zeros(()))

        def bounce_f(fl):
            return mod._bounce(rebuild(fl), vp_in, **bounce_kwargs)

        vp_new, vjp_b = jax.vjp(bounce_f, floats)
        R = L_bar - vp_new.result                    # radiance to go
        tp = vp_new.throughput
        ok = occupied[..., None] & (tp != 0.0)
        ct_tp = jnp.where(ok, delta * R / jnp.where(ok, tp, 1.0), 0.0)
        ct_res = jnp.where(occupied[..., None], delta, 0.0)
        ct_state = _zero_ct(vp_new).replace(result=ct_res, throughput=ct_tp)
        (g_b,) = vjp_b(ct_state)
        grads = tuple(a + b for a, b in zip(grads, g_b))

        its = its + 1
        vp_new = vp_new.replace(active=vp_new.active & (its < max_iterations))
        out = (vp_new, occupied, its, next_sample, delta, L_bar, grads,
               it + 1)
        return match_dtypes(out, st)

    final = jax.lax.while_loop(cond, body, state0)
    grads = tuple(a + b for a, b in zip(final[6], g_sensor))
    return grads, final[7]


# =============================================================================
# the user-facing custom_vjp render
# =============================================================================

@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def render_regen_diff(scene, seed, n_lanes, spp):
    """Differentiable regenerating-driver render -> raw film (ch, cw, C).

    Primal calls run the fast while-loop driver untouched; under
    ``jax.grad``/``jax.vjp`` the backward is the path-replay sweep above.
    """
    from . import render_wavefront_regen
    film, _rays = render_wavefront_regen(scene, n_lanes, seed, spp)
    return film


def _fwd(scene, seed, n_lanes, spp):
    from . import render_wavefront_regen
    film, _rays, slog = render_wavefront_regen(scene, n_lanes, seed, spp,
                                               sample_log=True)
    return film, (scene, seed, slog)


def _bwd(n_lanes, spp, res, ct_film):
    scene, seed, slog = res
    grads, _iters = _adjoint_sweep(scene, seed, slog, ct_film, n_lanes, spp)
    floats, idx, leaves, treedef, _rebuild = _partition(scene)
    out = []
    k = 0
    for i, leaf in enumerate(leaves):
        if i in set(idx):
            out.append(grads[k])
            k += 1
        else:
            out.append(np.zeros(jnp.shape(leaf), jax.dtypes.float0))
    scene_ct = jax.tree_util.tree_unflatten(treedef, out)
    seed_ct = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return scene_ct, seed_ct


render_regen_diff.defvjp(_fwd, _bwd)
