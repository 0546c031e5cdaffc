"""Integrator registry + the wavefront render driver.

Counterpart of SamplingIntegrator::render (src/librender/integrator.cpp):
the GPU wavefront branch (integrator.cpp:140-172) is the design template —
idx -> pixel mapping over the whole film x spp wavefront, multi-pass
accumulation via ``samples_per_pass``, XYZAW film accumulation
(integrator.cpp:233-288).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.rng import Sampler
from .. import sensors
from ..films import N_BASE_CHANNELS, develop, film_put
from . import aov, depth, direct, moment, path, stokes, volpath, volpathmis
from .bins import bins, nbins

REGISTRY = {
    "path": path,
    "direct": direct,
    "depth": depth,
    "volpath": volpath,
    "volpathmis": volpathmis,
    "aov": aov,
    "moment": moment,
    "stokes": stokes,
    "bins": bins,
    "nbins": nbins,
}


def n_aov(cfg):
    mod = REGISTRY[cfg.integrator.kind]
    return mod.n_aov(cfg) if hasattr(mod, "n_aov") else 0


def aov_names(cfg):
    mod = REGISTRY[cfg.integrator.kind]
    return mod.aov_names(cfg) if hasattr(mod, "aov_names") else []


def register_integrator(name, module):
    """User-defined integrators: any module/namespace with
    sample(scene, sampler, ray, active) -> (spec, valid, sampler) — the
    analog of the reference's Python trampoline integrators
    (integrator_v.cpp:24-122)."""
    REGISTRY[name] = module


_HOST_CALLBACKS_OK = None


def _host_callbacks_supported():
    """Whether the active backend can run jax.debug host callbacks. Probed
    once with a trivial program: some experimental PJRT plugins (the axon TPU
    relay) reject host send/recv callbacks at *run* time, which would turn a
    purely diagnostic print into a crash of every jitted render."""
    global _HOST_CALLBACKS_OK
    if _HOST_CALLBACKS_OK is None:
        import numpy as np
        try:
            def f(x):
                jax.debug.callback(lambda _: None, x)
                return x
            # explicit lower+compile+execute: a plain jit *call* here would be
            # staged into the ambient trace (this probe runs while the render
            # itself is being traced), leaking the very callback we are
            # testing for into the render program. block_until_ready, NOT
            # np.asarray: a device-to-host readback here would flip the TPU
            # relay into its degraded per-launch dispatch mode for the whole
            # process (see core/transform.py note)
            compiled = jax.jit(f).lower(np.zeros(())).compile()
            jax.block_until_ready(compiled(np.zeros(())))
            _HOST_CALLBACKS_OK = True
        except Exception:
            _HOST_CALLBACKS_OK = False
    return _HOST_CALLBACKS_OK


def render_wavefront(scene, lane_offset, n_lanes, seed, spp):
    """Render one pass of ``n_lanes`` samples starting at global sample index
    ``lane_offset``; returns the partial film (H, W, C). Lanes beyond the
    total wavefront (pad lanes under sharding) are masked out."""
    cfg = scene.config
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    cx, cy = cfg.crop_offset
    total = ch * cw * spp

    lane = lane_offset + jnp.arange(n_lanes, dtype=jnp.uint32)
    lane_ok = lane < total
    lane = jnp.minimum(lane, total - 1)
    pixel = (lane // spp).astype(jnp.uint32)
    px = (pixel % cw).astype(jnp.float32) + cx
    py = (pixel // cw).astype(jnp.float32) + cy

    sampler = Sampler.seed(seed, lane, kind=cfg.sampler_kind, spp=spp)
    sampler, jitter = sampler.next_2d()
    pos = jnp.stack([px, py], -1) + jitter  # continuous pixel coords
    pos_film = pos / jnp.asarray([W, H], jnp.float32)

    time = jnp.zeros(n_lanes)
    integrator = REGISTRY[cfg.integrator.kind]
    extra = n_aov(cfg)
    # static gate: only AOV specs asking for duv_dx/duv_dy pay for the two
    # offset camera rays (integrator.cpp:257-261 diff_scale = 1/sqrt(spp))
    needs_diff = bool(extra) and getattr(
        integrator, "needs_differentials", lambda _cfg: False)(cfg)
    if needs_diff:
        import math as _math
        ray, ray_diff, ray_weight, sampler = sensors.sample_ray_differential(
            scene, sampler, pos_film, time,
            diff_scale=1.0 / _math.sqrt(spp))
    else:
        ray, ray_weight, sampler = sensors.sample_ray(
            scene, sampler, pos_film, time)
        ray_diff = None
    if extra:
        kw = {"ray_diff": ray_diff} if needs_diff else {}
        spec, valid, sampler, aovs = integrator.sample_aov(
            scene, sampler, ray, ray_weight, **kw)
    else:
        spec, valid, sampler = integrator.sample(scene, sampler, ray)
        aovs = jnp.zeros(spec.shape[:-1] + (0,))
    spec = spec * ray_weight

    if cfg.variant.is_spectral:
        xyz = sp.spectrum_to_xyz(spec, ray.wavelengths)
    elif cfg.variant.is_monochromatic:
        xyz = jnp.repeat(spec, 3, axis=-1)
    else:
        xyz = sp.srgb_to_xyz(spec)

    values = jnp.concatenate([
        xyz,
        jnp.where(valid, 1.0, 0.0)[..., None],
        jnp.ones((n_lanes, 1)),
        aovs,
    ], axis=-1)
    values = jnp.where(lane_ok[..., None], values, 0.0)

    image = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    rp = dict(cfg.rfilter_params)
    image = film_put(image, pos - jnp.asarray([cx, cy], jnp.float32),
                     values, cfg.rfilter, rp)
    return image



def _lane_values(cfg, spec, valid, wavelengths, n_extra=0):
    """XYZ+A+W film row per lane (integrator.cpp:233-288 AOV layout)."""
    if cfg.variant.is_spectral:
        xyz = sp.spectrum_to_xyz(spec, wavelengths)
    elif cfg.variant.is_monochromatic:
        xyz = jnp.repeat(spec, 3, axis=-1)
    else:
        xyz = sp.srgb_to_xyz(spec)
    n = spec.shape[0]
    return jnp.concatenate([
        xyz, jnp.where(valid, 1.0, 0.0)[..., None], jnp.ones((n, 1)),
        jnp.zeros((n, n_extra))], axis=-1)


def render_wavefront_regen(scene, n_lanes, seed, spp, sample_offset=0,
                           total=None, max_total=None, sample_log=False):
    """Regenerating wavefront render: lanes whose path terminates are
    harvested into the film and immediately refilled with the next unstarted
    camera sample, so occupancy stays near 100% regardless of path-length
    variance.

    This is the TPU answer to the reference's work distribution — the CPU
    spiral-block queue (integrator.cpp:99-139) and the gpu wavefront's
    ``none(active)`` early-outs both keep cores busy; a fixed-trip masked
    scan does not (SURVEY 5.7: "compaction + refill from a queue"). Runs as
    a ``lax.while_loop``, so this function itself is not reverse-
    differentiable — gradient renders go through the path-replay
    ``custom_vjp`` wrapper (integrators/replay.py), whose backward replays
    this driver's schedule; ``render(regen=True)`` routes there.

    Harvesting: with a <=0.5-radius filter (the imageblock.cpp single-pixel
    fast path) each sample lands in exactly one pixel, so the film never
    needs in-loop scatters at all: finished lanes are compacted to the
    front with one 32-element-key sort and APPENDED to a sample log via
    ``dynamic_update_slice`` at a running cursor. DUS into a loop carry is
    a true in-place write (the KV-cache-append pattern); an XLA scatter
    into a loop carry instead pays a full copy/rewrite of the target every
    iteration (~0.35 ms for a 256^2 film, ~60% of this render's whole
    budget — measured). The film materializes ONCE at the end: one scatter
    of the log into per-sample slots, then a reshape-sum over the spp axis
    (sample index = pixel * spp + s). Wider filters keep the footprint
    film_put path. ``max_total`` (static) bounds the log when ``total`` is
    traced (the per-shard count under shard_map).

    Returns ``(film, n_rays)`` where film is the (ch, cw, C) partial film
    over samples [sample_offset, sample_offset+total) and n_rays counts
    every masked ray_intersect actually issued.

    ``sample_log=True`` (static) additionally returns a third output: the
    per-sample spectral result log (n_buf, nc) — row s is sample s's
    integrator ``result`` (pre ray-weight, spec space). This is the
    radiance-total table the path-replay backward pass
    (integrators/replay.py) needs to form its radiance-to-go cotangents;
    it is logged through the same sort-compact append machinery as the
    film channels (or, for wide-filter renders where the film takes the
    in-loop ``film_put`` path, through a parallel slot-keyed log).
    """
    cfg = scene.config
    mod = REGISTRY[cfg.integrator.kind]
    # wrapper integrators (aov/moment/bins/nbins) delegate the bounce loop
    # to their child and contribute AOV hooks: _harvest_aov computes the
    # extra film channels from the harvested lane state, _refill_aov
    # (optional) computes camera-hit AOVs at lane refill, carried per lane
    bmod = mod._regen_module(cfg) if hasattr(mod, "_regen_module") else mod
    assert all(hasattr(bmod, h) for h in ("_init_state", "_bounce",
                                          "_knobs")), \
        f"regen driver: integrator '{cfg.integrator.kind}' lacks bounce hooks"
    extra = n_aov(cfg)
    assert extra == 0 or hasattr(mod, "_harvest_aov"), \
        f"regen driver: AOV integrator '{cfg.integrator.kind}' lacks " \
        "_harvest_aov (use the scan driver)"
    has_refill_aov = bool(extra) and hasattr(mod, "_refill_aov")
    n_ac = extra if has_refill_aov else 0
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    cx, cy = cfg.crop_offset
    if total is None:
        total = ch * cw * spp
    if max_total is None:
        max_total = total if isinstance(total, int) else ch * cw * spp
    # scatter-free final placement needs a static sample count at offset 0
    _total_static = total if isinstance(total, int) else None
    _offset_zero = isinstance(sample_offset, int) and sample_offset == 0
    import os as _os
    from ..rfilters import filter_radius
    radius = filter_radius(cfg.rfilter, dict(cfg.rfilter_params))
    use_log = radius <= 0.5 + 1e-6 \
        and _os.environ.get("ERT_REGEN_LOG", "1") != "0"
    # sample slots cover the spp-aligned window [aligned_off, +n_buf)
    n_buf = (-(-max_total // spp) + 1) * spp
    n_log = n_buf + n_lanes  # append slack: one junk tail of lane width
    aligned_off = (jnp.uint32(sample_offset) // jnp.uint32(spp)) \
        * jnp.uint32(spp)
    total = jnp.uint32(sample_offset + total)
    max_iterations, bounce_kwargs = bmod._knobs(scene)
    # primal-only extras (e.g. volpath's early-terminating while-loop NEE
    # walks) — this driver is a while_loop itself, never differentiated
    bounce_kwargs = dict(bounce_kwargs,
                         **getattr(bmod, "_PRIMAL_BOUNCE_KWARGS", {}))
    if bounce_kwargs.get("gate_sites", True) is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        bounce_kwargs["gate_sites"] = platform != "tpu"

    def fresh_lanes(refill, new_idx):
        """Exactly render_wavefront's per-sample stream: seed -> jitter ->
        sensor ray -> integrator init (so regen and non-regen renders of the
        same seed are sample-for-sample identical)."""
        lane = jnp.where(refill, new_idx, 0).astype(jnp.uint32)
        smp = Sampler.seed(seed, lane, kind=cfg.sampler_kind, spp=spp)
        smp, jitter = smp.next_2d()
        pixel = (lane // jnp.uint32(spp)).astype(jnp.uint32)
        px = (pixel % cw).astype(jnp.float32) + cx
        py = (pixel // cw).astype(jnp.float32) + cy
        pos = jnp.stack([px, py], -1) + jitter
        pos_film = pos / jnp.asarray([W, H], jnp.float32)
        ray, rw, smp = sensors.sample_ray(scene, smp, pos_film,
                                          jnp.zeros(n_lanes))
        vp = bmod._init_state(scene, smp, ray, refill)
        ac = (mod._refill_aov(scene, ray, refill) if has_refill_aov
              else jnp.zeros((n_lanes, 0)))
        return vp, pos, rw, ac

    vp0, pos0, rw0, ac0 = fresh_lanes(jnp.zeros(n_lanes, bool),
                                      jnp.zeros(n_lanes, jnp.uint32))
    nc = vp0.result.shape[-1]
    n_logged = 3 + extra + (nc if sample_log else 0)
    rp = dict(cfg.rfilter_params)
    if use_log:
        # (X/Y/Z value logs, packed-slot log, cursor); 1-D logs keep every
        # append/scatter transpose-free (a packed (n, 5) log comes out of
        # the while carry channel-major and the final scatter fuses two
        # transposes — measured 26 ms vs sub-ms). The key packs
        # slot*2 + valid_flag (A is one bit and W is the constant 1, so
        # neither needs a value channel). Unwritten entries hold the trash
        # key 2*n_buf and drop out in the final placement. Under
        # sample_log, nc more value channels ride the same sort: the
        # lane's raw spectral result (pre ray-weight).
        image0 = ((jnp.zeros((n_log,)),) * n_logged,
                  jnp.full((n_log,), 2 * n_buf, jnp.int32), jnp.int32(0))
    elif sample_log:
        # wide-filter film goes through film_put; the per-sample result
        # log runs as a parallel slot-keyed append (trash key n_buf)
        image0 = (jnp.zeros((ch, cw, N_BASE_CHANNELS + extra)),
                  (jnp.zeros((n_log,)),) * nc,
                  jnp.full((n_log,), n_buf, jnp.int32), jnp.int32(0))
    else:
        image0 = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    state0 = (vp0, pos0, rw0, jnp.zeros(n_lanes, bool),
              jnp.zeros(n_lanes, jnp.int32), jnp.uint32(sample_offset),
              jnp.zeros(n_lanes, jnp.uint32),
              image0, jnp.zeros(()), jnp.int32(0), ac0)

    def merge_lanes(fresh, old, mask):
        return jax.tree_util.tree_map(
            lambda a, b: b if a.ndim < mask.ndim else jnp.where(
                mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim)), a, b),
            fresh, old)

    def cond(st):
        occupied, next_sample, it = st[3], st[5], st[9]
        cap = jnp.int32(20 * max_iterations * (1 + (ch * cw * spp) // n_lanes))
        return ((next_sample < total) | jnp.any(occupied)) & (it < cap)

    def body(st):
        (vp, pos, rw, occupied, its, next_sample, lane_sample, image, rays,
         it, ac) = st

        # 1. harvest lanes whose path finished since the last visit
        finished = occupied & ~vp.active
        aov_vals = (mod._harvest_aov(scene, vp, rw, ac) if extra
                    else None)

        def _append(log_v, log_i, cursor, key, cols):
            """Sort-compact append: one sort does compaction AND
            slot-orders the appended run."""
            srt = jax.lax.sort((key,) + cols, num_keys=1)
            log_v = tuple(
                jax.lax.dynamic_update_slice(lv, ch_v, (cursor,))
                for lv, ch_v in zip(log_v, srt[1:]))
            log_i = jax.lax.dynamic_update_slice(log_i, srt[0], (cursor,))
            nf = jnp.sum(finished, dtype=jnp.int32)
            return log_v, log_i, jnp.minimum(cursor + nf, jnp.int32(n_buf))

        slot = (lane_sample - aligned_off).astype(jnp.int32)

        def _harvest_log():
            spec = vp.result * rw
            xyz = _lane_values(cfg, spec, vp.valid_ray,
                               vp.ray.wavelengths)[:, :3]
            log_v, log_i, cursor = image
            packed = jnp.where(
                finished, slot * 2 + vp.valid_ray.astype(jnp.int32),
                jnp.int32(2 * n_buf))
            cols = (xyz[:, 0], xyz[:, 1], xyz[:, 2])
            if extra:
                cols = cols + tuple(aov_vals[:, i] for i in range(extra))
            if sample_log:
                cols = cols + tuple(vp.result[:, i] for i in range(nc))
            return _append(log_v, log_i, cursor, packed, cols)

        def _harvest_film(film):
            spec = vp.result * rw
            values = _lane_values(cfg, spec, vp.valid_ray,
                                  vp.ray.wavelengths, n_extra=0)
            if extra:
                values = jnp.concatenate([values, aov_vals], -1)
            values = jnp.where(finished[..., None], values, 0.0)
            return film_put(film, pos - jnp.asarray([cx, cy], jnp.float32),
                            values, cfg.rfilter, rp)

        if use_log:
            # unconditional: sort+append is cheap, and a lax.cond here would
            # force XLA to copy the whole log through the conditional every
            # iteration (no in-place aliasing across cond boundaries)
            image = _harvest_log()
        elif sample_log:
            film_c, rlog_v, rlog_i, rcur = image
            film_c = jax.lax.cond(jnp.any(finished),
                                  lambda: _harvest_film(film_c),
                                  lambda: film_c)
            key_r = jnp.where(finished, slot, jnp.int32(n_buf))
            rlog_v, rlog_i, rcur = _append(
                rlog_v, rlog_i, rcur, key_r,
                tuple(vp.result[:, i] for i in range(nc)))
            image = (film_c, rlog_v, rlog_i, rcur)
        else:
            image = jax.lax.cond(jnp.any(finished),
                                 lambda: _harvest_film(image),
                                 lambda: image)
        occupied = occupied & vp.active

        # 2. refill dead lanes with the next unstarted samples
        dead = ~occupied
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - dead.astype(jnp.uint32)
        new_idx = next_sample + rank
        refill = dead & (new_idx < total)

        def _refill():
            fresh_vp, fresh_pos, fresh_rw, fresh_ac = fresh_lanes(refill,
                                                                  new_idx)
            # skip the ~30-float/lane si merge: refilled lanes carry
            # needs_intersection=True, so their si is overwritten by the
            # next merged intersect before anything reads it
            if hasattr(fresh_vp, "si"):
                fresh_vp = fresh_vp.replace(si=vp.si)
            return (merge_lanes(fresh_vp, vp, refill),
                    jnp.where(refill[..., None], fresh_pos, pos),
                    jnp.where(refill[..., None], fresh_rw, rw),
                    jnp.where(refill[..., None], fresh_ac, ac))

        if not bounce_kwargs.get("gate_sites", True):
            # TPU: a refill happens nearly every iteration, so the cond is
            # an always-taken kernel boundary that copies the whole lane
            # state (see gate_sites)
            vp, pos, rw, ac = _refill()
        else:
            vp, pos, rw, ac = jax.lax.cond(jnp.any(refill), _refill,
                                           lambda: (vp, pos, rw, ac))
        lane_sample = jnp.where(refill, new_idx, lane_sample)
        occupied = occupied | refill
        its = jnp.where(refill, 0, its)
        next_sample = next_sample + jnp.sum(refill, dtype=jnp.uint32)

        # 3. one bounce over the whole (nearly full) wavefront
        vp = vp.replace(active=vp.active & occupied, n_rays=jnp.zeros(()))
        vp = bmod._bounce(scene, vp, **bounce_kwargs)
        rays = rays + vp.n_rays
        its = its + 1
        # per-lane iteration cap (the scan-trip cap of _trace_full)
        vp = vp.replace(active=vp.active & (its < max_iterations))
        out = (vp, pos, rw, occupied, its, next_sample, lane_sample, image,
               rays, it + 1, ac)
        return volpath.match_dtypes(out, st)

    final = jax.lax.while_loop(cond, body, state0)
    # The iteration cap (cond) is a runaway backstop; hitting it drops
    # still-occupied lanes plus any unstarted samples, which would otherwise
    # just make the film silently dimmer. Surface the truncation.
    occupied_f, next_sample_f = final[3], final[5]
    dropped = jnp.sum(occupied_f, dtype=jnp.uint32) \
        + (total - jnp.minimum(next_sample_f, total))
    # opt-in: a host callback embedded in the program (even one that never
    # fires) forces host round-trips on some PJRT relays; the truncation
    # already shows up as low film weight, so the print is diagnostic sugar
    if _os.environ.get("ERT_REGEN_DIAG") and _host_callbacks_supported():
        jax.lax.cond(
            dropped > 0,
            lambda: jax.debug.print(
                "render_wavefront_regen: iteration cap hit with {d} samples "
                "unharvested — film weight is low; raise max_iterations",
                d=dropped),
            lambda: None)
    image_f, rays_f = final[7], final[8]
    slog = None

    def _slot_scatter(slot_ids, cols):
        """(n_buf, len(cols)) per-slot table from sorted (slot, value)
        columns (trash rows carry slot n_buf and fall off the end)."""
        return jnp.stack(
            [jnp.zeros((n_buf + 1,)).at[slot_ids].set(
                c, indices_are_sorted=True)
             for c in cols], -1)[:n_buf]

    n_film_ch = N_BASE_CHANNELS + extra
    if use_log:
        log_v, log_i, cursor_f = image_f
        srt = jax.lax.sort((log_i,) + tuple(log_v), num_keys=1)
        keys = srt[0]
        real = keys < 2 * n_buf  # trash entries sort last
        a_col = (keys & 1).astype(jnp.float32)          # valid flag
        w_col = jnp.where(real, 1.0, 0.0)               # weight = 1/sample
        film_cols = srt[1:4] + (a_col, w_col) + srt[4:4 + extra]

        def _scattered():
            # sorted-indices scatter (trash-slot duplicates land last and
            # overwrite each other harmlessly; ~100x faster than the
            # random-order scatter, but still ~3 ms/channel at 512k rows)
            slot = jnp.minimum(keys >> 1, jnp.int32(n_buf))
            return _slot_scatter(slot, film_cols).reshape(
                n_buf // spp, spp, n_film_ch).sum(1)

        def _dense():
            # complete render, zero sample offset: the real slots are
            # exactly the permutation 0..total-1, so after the sort row i
            # IS slot i — no scatter at all. The junk tail (trash-slot
            # rows sorted last) fills only the spp-alignment slack group,
            # which lands in the film pad rows and is sliced off below.
            rows_all = jnp.stack(film_cols, -1)[:n_buf]
            return rows_all.reshape(n_buf // spp, spp,
                                    n_film_ch).sum(1)

        if _total_static is not None and _offset_zero:
            rows = jax.lax.cond(
                cursor_f == jnp.int32(_total_static), _dense, _scattered)
        else:
            rows = _scattered()
        pix0 = (aligned_off // jnp.uint32(spp)).astype(jnp.int32)
        flat = jnp.zeros((ch * cw + n_buf // spp, n_film_ch))
        flat = jax.lax.dynamic_update_slice(flat, rows, (pix0, 0))
        if sample_log:
            slog = _slot_scatter(jnp.minimum(keys >> 1, jnp.int32(n_buf)),
                                 srt[4 + extra:])
        image_f = flat[:ch * cw].reshape(ch, cw, n_film_ch)
    elif sample_log:
        image_f, rlog_v, rlog_i, _rcur = image_f
        srt = jax.lax.sort((rlog_i,) + tuple(rlog_v), num_keys=1)
        slog = _slot_scatter(jnp.minimum(srt[0], jnp.int32(n_buf)), srt[1:])
    if sample_log:
        return image_f, rays_f, slog
    if _os.environ.get("ERT_REGEN_STATS"):
        # perf diagnostics: (film, rays) -> (film, rays, loop iterations)
        return image_f, rays_f, final[9]
    return image_f, rays_f


def regen_iter_traffic_nbytes(scene, n_lanes, spp) -> int:
    """Modeled per-iteration memory traffic of the regen while loop (lane
    state read+write plus the log-append write) — the model behind
    bench.py's HBM-utilization lower bound. Computed from eval_shape
    avals; no device work."""
    import math

    cfg = scene.config
    mod = REGISTRY[cfg.integrator.kind]
    bmod = mod._regen_module(cfg) if hasattr(mod, "_regen_module") else mod
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    total = ch * cw * spp
    n_buf = (-(-total // spp) + 1) * spp
    n_log = n_buf + n_lanes

    def f():
        lane = jnp.zeros(n_lanes, jnp.uint32)
        smp = Sampler.seed(jnp.uint32(0), lane, kind=cfg.sampler_kind,
                           spp=spp)
        smp, _ = smp.next_2d()
        ray, rw, smp = sensors.sample_ray(
            scene, smp, jnp.zeros((n_lanes, 2)), jnp.zeros(n_lanes))
        return bmod._init_state(scene, smp, ray, jnp.zeros(n_lanes, bool))

    avals = jax.eval_shape(f)
    vp_bytes = sum(math.prod(a.shape) * a.dtype.itemsize
                   for a in jax.tree_util.tree_leaves(avals))
    nc = avals.result.shape[-1]
    extra = n_aov(cfg)
    # pos/rw/occupied/its/lane_sample + misc scalars (~4B each per lane)
    misc = n_lanes * (2 + nc + 1 + 1 + 1) * 4
    # the sample log is NOT part of the per-iteration stream: its
    # dynamic_update_slice appends alias in place (only ~n_lanes rows are
    # written per iteration), so the per-iteration traffic model is
    # lane-state read+write plus the append write
    append_bytes = n_lanes * (3 + extra + 1) * 4
    return int(vp_bytes + misc) * 2 + append_bytes


def regen_supported(cfg) -> bool:
    """Whether the regenerating driver can run this integrator config:
    the (possibly wrapped) integrator must expose the bounce hooks, and
    AOV wrappers must provide _harvest_aov (aov/moment/bins/nbins do;
    duv_dx/duv_dy AOVs need the differential-ray machinery and keep the
    scan driver)."""
    mod = REGISTRY[cfg.integrator.kind]
    bmod = mod._regen_module(cfg) if hasattr(mod, "_regen_module") else mod
    if not all(hasattr(bmod, h) for h in ("_init_state", "_bounce",
                                          "_knobs")):
        return False
    if n_aov(cfg):
        if not hasattr(mod, "_harvest_aov"):
            return False
        if getattr(mod, "needs_differentials", lambda c: False)(cfg):
            return False
    return True


def render(scene, seed=0, spp=None, samples_per_pass=None, develop_film=True,
           return_aovs=False, regen=False):
    """Full render: multi-pass wavefront accumulation (integrator.cpp:59-65).

    Returns the developed image (H, W, 3|1); with ``return_aovs=True`` also a
    {name: (H, W) array} dict of the integrator's weight-normalized AOV
    channels (aov.cpp/moment.cpp outputs). ``develop_film=False`` returns the
    raw film instead.
    """
    cfg = scene.config
    spp = spp or cfg.spp
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    total = ch * cw * spp
    if samples_per_pass is None:
        samples_per_pass = min(total, 1 << 22)
    n_passes = -(-total // samples_per_pass)

    extra = n_aov(cfg)
    if regen and regen_supported(cfg):
        from . import replay
        if extra == 0 and replay.replay_supported(cfg):
            # differentiable fast path: primal runs the identical while-loop
            # driver; under jax.grad the backward is the path-replay sweep
            # (integrators/replay.py)
            run = jax.jit(replay.render_regen_diff,
                          static_argnums=(2, 3))
            film = run(scene, jnp.uint32(seed),
                       min(total, samples_per_pass), spp)
        else:
            run = jax.jit(render_wavefront_regen,
                          static_argnames=("n_lanes", "spp"))
            film, _ = run(scene, min(total, samples_per_pass), seed, spp)
    else:
        film = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
        run = jax.jit(render_wavefront, static_argnames=("n_lanes", "spp"))
        for p in range(n_passes):
            off = p * samples_per_pass
            n = min(samples_per_pass, total - off)
            film = film + run(scene, jnp.uint32(off), n, seed, spp)
    if not develop_film:
        return film
    mode = "mono" if cfg.variant.is_monochromatic else "rgb"
    img = develop(film[..., :N_BASE_CHANNELS], mode, cfg.pixel_format)
    if not return_aovs:
        return img
    w = jnp.maximum(film[..., 4:5], 1e-12)
    aov_img = film[..., N_BASE_CHANNELS:] / w
    aovs = {name: aov_img[..., i]
            for i, name in enumerate(aov_names(cfg))}
    return img, aovs
