"""Participating media (counterparts of include/mitsuba/render/medium.h,
src/media/{homogeneous,heterogeneous}.cpp).

Medium registry kinds:
  'homogeneous':   sigma_t (spec idx), albedo (spec idx), scale (f32)
  'heterogeneous': sigma_t_vol (volume idx), albedo_vol (volume idx),
                   scale (f32), majorant (f32 = scale * sigma_t_vol.max(),
                   heterogeneous.cpp:29), w2l_m/w2l_it (4,4) local unit-cube
                   bounds for intersect_aabb (medium.h:16-29)

Free-flight sampling is the reference's single-majorant scheme
(medium.cpp:36-77): t = mint - log(1-xi)/majorant[channel]; scattering
coefficients are (sigma_s, sigma_n, sigma_t) with sigma_n = majorant - sigma_t
(heterogeneous.cpp:41-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bbox import ray_intersect_aabb
from ..core.math import INVALID_T
from ..core.transform import Transform
from ..core.types import pytree_dataclass
from ..core.gather import index_channel, table_gather as tg
from ..render.texture import spectrum_eval
from ..textures.volumes import volume_eval


@pytree_dataclass
class MediumInteraction:
    """interaction.h:368-401 MediumInteraction3f (SoA).

    The ff_* fields carry the per-lane PROFILE free-flight parametrization
    (piecewise-constant-in-z majorant along the ray, see
    _flight_profile_setup) so eval_tr_and_pdf can reconstruct the exact
    optical depth Lambda(t) of the inhomogeneous majorant. ff_on lanes use
    the profile math; others fall back to the constant-majorant formulas
    (combined_extinction * t). All ff_* values are detached sampling
    parameters (volpath.cpp:83 discipline)."""

    t: jnp.ndarray        # (...,) inf if no medium interaction
    p: jnp.ndarray        # (..., 3)
    mint: jnp.ndarray     # (...,)
    sigma_s: jnp.ndarray  # (..., nc)
    sigma_n: jnp.ndarray  # (..., nc)
    sigma_t: jnp.ndarray  # (..., nc)
    combined_extinction: jnp.ndarray  # (..., nc) — LOCAL majorant for ff_on
    maxt: jnp.ndarray     # (...,) segment end used for sampling
    ff_mq: jnp.ndarray    # (..., P) travel-coord majorant profile
    ff_qa: jnp.ndarray    # (...,) travel coord of mint
    ff_qb: jnp.ndarray    # (...,) travel coord of maxt
    ff_adlz: jnp.ndarray  # (...,) |d local z| per world t
    ff_on: jnp.ndarray    # (...,) bool — profile-flight lanes

    @property
    def is_valid(self):
        return self.t < 0.5 * INVALID_T


def _spec(scene, spec_idx, wavelengths):
    return spectrum_eval(scene.spectra, tg(scene.spec_kind, spec_idx),
                         tg(scene.spec_slot, spec_idx),
                         scene.config.spectrum_kinds, wavelengths,
                         scene.config.variant.n_channels)


def medium_intersect_bounds(scene, medium_idx, ray, active):
    """(seg_valid, mint, maxt) clipped to the ray bounds (medium.cpp:48-55)."""
    cfg = scene.config
    if not cfg.medium_kinds:  # medium-free scene: no valid segments
        return jnp.zeros(ray.mint.shape, bool), ray.mint, ray.maxt
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    mint = jnp.broadcast_to(ray.mint, ray.mint.shape)
    maxt = jnp.broadcast_to(ray.maxt, ray.maxt.shape)
    ok = jnp.ones(ray.mint.shape, bool)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        if kname == "homogeneous":
            continue  # infinite extent: keep ray bounds
        if kname == "heterogeneous":
            p = scene.media["heterogeneous"]
            w2l = Transform(m=tg(p["w2l_m"], slot), inv_t=tg(p["w2l_it"], slot))
            o_l = w2l.transform_affine_point(ray.o)
            d_l = w2l.transform_vector(ray.d)
            d_rcp = 1.0 / jnp.where(jnp.abs(d_l) < 1e-12,
                                    jnp.where(d_l < 0, -1e-12, 1e-12), d_l)
            hit, near, far = ray_intersect_aabb(
                jnp.zeros(3), jnp.ones(3), o_l, d_rcp, ray.mint, ray.maxt)
            mint = jnp.where(m, jnp.maximum(ray.mint, near), mint)
            maxt = jnp.where(m, jnp.minimum(ray.maxt, far), maxt)
            ok = jnp.where(m, hit, ok)
    return ok & active, mint, maxt


def medium_combined_extinction(scene, medium_idx, p, wavelengths):
    """Majorant (per channel) at/for the medium (get_combined_extinction)."""
    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.ones(medium_idx.shape + (nc,))
    if not cfg.medium_kinds:
        return out
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            v = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
        elif kname == "heterogeneous":
            v = jnp.broadcast_to(tg(params["majorant"], slot)[..., None],
                                 medium_idx.shape + (nc,))
        else:
            raise ValueError(kname)
        out = jnp.where(m[..., None], v, out)
    return jnp.maximum(out, 1e-8)


AXPROF_BINS = 64  # must match scene.build.AXPROF_BINS


def medium_majorant_segment(scene, medium_idx, ray, mint, maxt, wavelengths):
    """Per-lane majorant valid on the ray segment [mint, maxt].

    Heterogeneous media use the precomputed per-axis slab-max profiles
    (scene/build.py:_axis_majorant_profiles, normalized to the grid max):
    for each local axis the profile's range-max over the coordinate
    interval the segment covers bounds sigma_t on the segment, so the min
    over the three axes times the traced 'majorant' magnitude row is a
    (much tighter) spatial majorant than the global max — the loop-free
    TPU analog of super-grid/DDA majorants (SURVEY §7). Raising the
    'majorant' ParameterMap entry scales the whole profile (the
    null-collision-gradient knob). Other media fall back to
    medium_combined_extinction. Detached: majorants are sampling
    parameters, not differentiable quantities (volpath.cpp:83 discipline).
    """
    out = medium_combined_extinction(scene, medium_idx, ray.o, wavelengths)
    cfg = scene.config
    if "heterogeneous" not in cfg.medium_kinds:
        return out
    k_het = cfg.medium_kinds.index("heterogeneous")
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    m = kind == k_het
    params = scene.media["heterogeneous"]
    w2l = Transform(m=tg(params["w2l_m"], slot), inv_t=tg(params["w2l_it"], slot))
    t1 = jnp.minimum(maxt, INVALID_T)
    p0 = jnp.clip(w2l.transform_affine_point(ray.at(mint)), 0.0, 1.0)
    p1 = jnp.clip(w2l.transform_affine_point(ray.at(t1)), 0.0, 1.0)
    seg = _axis_range_max(tg(params["axprof"], slot), p0, p1) \
        * tg(params["majorant"], slot)
    seg = jax.lax.stop_gradient(jnp.maximum(seg, 1e-8))
    return jnp.where(m[..., None], seg[..., None], out)


def _flight_profile_setup(prof3, mag, w2l, ray, a, b):
    """Per-lane piecewise-constant rate profile along the ray segment
    [a, b] for inhomogeneous exponential sampling (the loop-free DDA-
    supergrid analog, SURVEY §7 "Majorant quality").

    prof3: (..., 3, P) per-axis range-max profiles (rows x, y, z); mag:
    (...,) magnitude scale. The z-row evaluated at a point's LOCAL z is a
    pointwise bound on the field (it is the max over all x, y in that z
    bin); it is additionally capped by the min over the x/y rows'
    range-max across the segment (also a pointwise bound on the segment).
    Sampling collisions at this LOCAL rate instead of the segment-global
    range-max cuts event counts by the max/mean ratio of the profile —
    ~14x for the exponential test atmosphere.

    Travel coordinate q runs along the ray: q = z when local dz > 0 else
    1 - z, so q is increasing; the profile is flipped to match. Returns
    (mq (..., P), qa, qb, adlz, m_at_a, is_const) with mq magnitude-scaled
    and detached; horizontal rays (|dlz| ~ 0) set is_const and use the
    constant rate m_at_a (the range-max of the x/y-capped profile over the
    segment's [qa, qb] span — a true bound even when the residual z-drift
    adlz*(b-a) crosses bins on long segments)."""
    P = prof3.shape[-1]
    t1 = jnp.minimum(b, INVALID_T)
    p0 = jnp.clip(w2l.transform_affine_point(ray.at(a)), 0.0, 1.0)
    p1 = jnp.clip(w2l.transform_affine_point(ray.at(t1)), 0.0, 1.0)
    # x/y cap: per-axis range-max over the segment (axes 0, 1)
    lo = jnp.minimum(p0[..., :2], p1[..., :2])
    hi = jnp.maximum(p0[..., :2], p1[..., :2])
    ia = jnp.clip((lo * P).astype(jnp.int32), 0, P - 1)
    ib = jnp.clip((hi * P).astype(jnp.int32), 0, P - 1)
    ar = jnp.arange(P)
    mask = (ar >= ia[..., None]) & (ar <= ib[..., None])   # (..., 2, P)
    mxy = jnp.min(jnp.max(jnp.where(mask, prof3[..., :2, :], 0.0), -1), -1)
    m_eff = jnp.minimum(prof3[..., 2, :], mxy[..., None]) \
        * mag[..., None]                                    # (..., P)

    dlz = w2l.transform_vector(ray.d)[..., 2]
    adlz = jnp.abs(dlz)
    up = dlz >= 0
    zl = p0[..., 2]
    zh = p1[..., 2]
    qa = jnp.where(up, zl, 1.0 - zl)
    qb = jnp.where(up, zh, 1.0 - zh)
    qb = jnp.maximum(qa, qb)
    mq = jnp.where(up[..., None], m_eff, jnp.flip(m_eff, -1))
    # constant fallback rate: the range-max of mq over [qa, qb]. Even with
    # adlz < 1e-7, z drifts adlz*(b-a) over the segment — for long
    # world-space segments that spans several profile bins, and the value
    # at the *start* bin alone would under-bound sigma_t downstream
    # (sigma_n clamps at 0, biasing radiance dark). The range-max is a
    # true majorant for the whole drift; for short segments qa==qb and it
    # degenerates to the start-bin value exactly as before.
    k0 = jnp.clip((qa * P).astype(jnp.int32), 0, P - 1)
    k1 = jnp.clip((qb * P).astype(jnp.int32), 0, P - 1)
    span = (ar >= k0[..., None]) & (ar <= k1[..., None])
    m_at_a = jnp.max(jnp.where(span, mq, 0.0), -1)
    is_const = adlz < 1e-7
    sg = jax.lax.stop_gradient
    return sg(mq), qa, qb, jnp.maximum(adlz, 1e-20), sg(m_at_a), is_const


def _cumsum_tri(x):
    """Inclusive cumsum along the last axis as ONE MXU matmul against an
    upper-triangular ones matrix. On TPU, jnp.cumsum lowers to a
    reduce_window (O(P^2) elementwise sweeps through HBM); the matmul form
    is a single systolic-array pass, and its fixed accumulation order is
    bit-stable across fusion contexts (the regen/scan driver-equivalence
    property)."""
    P = x.shape[-1]
    tri = jnp.triu(jnp.ones((P, P), x.dtype))  # tri[p, q] = 1 for q >= p
    return jnp.einsum("...p,pq->...q", x, tri,
                      precision=jax.lax.Precision.HIGHEST)


def _flight_sample(mq, qa, qb, adlz, a, xi):
    """First-collision sample from the inhomogeneous rate profile:
    Lambda(t) = int_a^t mq(q(s)) ds with q(s) = qa + adlz (s - a).
    Returns (t, m_local, lam_total) where lam_total = Lambda at the
    segment end; t > b (escape) is signaled by t = INVALID_T."""
    P = mq.shape[-1]
    ar = jnp.arange(P)
    e_lo = ar / P
    e_hi = (ar + 1.0) / P
    ov = jnp.clip(jnp.minimum(qb[..., None], e_hi)
                  - jnp.maximum(qa[..., None], e_lo), 0.0, None)
    lam_bins = mq * ov                       # (..., P), z-units
    cum = _cumsum_tri(lam_bins)
    lam_total_z = cum[..., -1]
    target_z = -jnp.log1p(-xi) * adlz
    escaped = target_z >= lam_total_z
    k = jnp.sum((cum < target_z[..., None]).astype(jnp.int32), -1)
    # xi == 0 (target_z == 0, probability ~2^-24 per draw) selects k = 0
    # even when qa lies in a later bin; without a lower bound the returned
    # local rate would be mq[0] — possibly 0 or an unrelated bin — forcing
    # a spurious real scatter at the segment start. Clamp to qa's bin.
    k_qa = (qa * P).astype(jnp.int32)
    kc = jnp.clip(jnp.maximum(k, k_qa), 0, P - 1)
    onehot = ar == kc[..., None]
    cum_k = jnp.sum(jnp.where(onehot, cum, 0.0), -1)
    lam_k = jnp.sum(jnp.where(onehot, lam_bins, 0.0), -1)
    m_k = jnp.sum(jnp.where(onehot, mq, 0.0), -1)
    cum_prev = cum_k - lam_k
    q_k0 = jnp.maximum(qa, kc / P)
    dq = (target_z - cum_prev) / jnp.maximum(m_k, 1e-20)
    q_star = q_k0 + dq
    t = a + (q_star - qa) / adlz
    t = jnp.where(escaped, INVALID_T, t)
    return t, m_k, lam_total_z / adlz


def _flight_tau(mq, qa, qb, adlz, a, t):
    """Lambda(t): optical depth of the profile rate from a to t (flat
    beyond the segment end qb)."""
    P = mq.shape[-1]
    ar = jnp.arange(P)
    e_lo = ar / P
    e_hi = (ar + 1.0) / P
    q_t = jnp.minimum(qa + adlz * jnp.clip(t - a, 0.0, INVALID_T), qb)
    ov = jnp.clip(jnp.minimum(q_t[..., None], e_hi)
                  - jnp.maximum(qa[..., None], e_lo), 0.0, None)
    return jnp.sum(mq * ov, -1) / adlz


def medium_scattering_coefficients(scene, medium_idx, p, wavelengths,
                                   majorant=None):
    """(sigma_s, sigma_n, sigma_t) at world point p. ``majorant`` overrides
    the global combined extinction (per-segment majorants)."""
    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    sigma_s = jnp.zeros(medium_idx.shape + (nc,))
    sigma_t = jnp.zeros(medium_idx.shape + (nc,))
    if majorant is None:
        majorant = medium_combined_extinction(scene, medium_idx, p, wavelengths)
    if not cfg.medium_kinds:
        return sigma_s, majorant, sigma_t
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            st = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
            al = _spec(scene, tg(params["albedo"], slot), wavelengths)
        elif kname == "heterogeneous":
            st = volume_eval(scene, tg(params["sigma_t_vol"], slot), p, wavelengths) \
                * tg(params["scale"], slot)[..., None]
            al = volume_eval(scene, tg(params["albedo_vol"], slot), p, wavelengths)
        else:
            raise ValueError(kname)
        sigma_t = jnp.where(m[..., None], st, sigma_t)
        sigma_s = jnp.where(m[..., None], st * al, sigma_s)
    sigma_n = jnp.maximum(majorant - sigma_t, 0.0)
    return sigma_s, sigma_n, sigma_t


def _profile_lerp_setup(prof, Dn, z):
    """Shared profile-eval preamble: (i0, f, p0, p1) of the piecewise-linear
    vertical profile at local z (trilinear z-axis semantics: g = clip(z) *
    (D-1), cell-center knots)."""
    from ..core.gather import select_along_axis

    g = jnp.clip(z, 0.0, 1.0) * jnp.maximum(Dn - 1, 0)
    i0 = jnp.clip(g.astype(jnp.int32), 0, jnp.maximum(Dn - 2, 0))
    f = g - i0
    p0 = select_along_axis(prof, i0)
    p1 = select_along_axis(prof, jnp.minimum(i0 + 1, Dn - 1))
    return i0, f, p0, p1


def _tau_1d_profile(prof, cum, Dn, o_z, dlz, a, b):
    """Exact optical depth of a piecewise-linear vertical profile over the
    ray segment [a, b] (unscaled): tau = (T(z(b)) - T(z(a))) / dlz with the
    cumulative table T, horizontal rays falling back to sigma(z0)*(b-a).
    prof/cum: (..., Dmax); Dn: (...,) true knot counts; o_z/dlz: local-z
    ray origin/direction components; a/b: world-scale ray parameters."""
    from ..core.gather import select_along_axis

    z0 = o_z + dlz * a
    z1 = o_z + dlz * b

    def T(z):
        i0, f, p0, p1 = _profile_lerp_setup(prof, Dn, z)
        c0 = select_along_axis(cum, i0)
        dz = 1.0 / jnp.maximum(Dn - 1, 1)
        t_multi = c0 + dz * (p0 * f + 0.5 * (p1 - p0) * f * f)
        # D == 1: constant profile, T(z) = p0 * z
        return jnp.where(Dn > 1, t_multi, p0 * jnp.clip(z, 0.0, 1.0))

    straight = jnp.abs(dlz) > 1e-8
    dlz_s = jnp.where(straight, dlz, 1.0)
    # horizontal rays: sigma is constant along the segment
    _i, f0, p0, p1 = _profile_lerp_setup(prof, Dn, z0)
    sig0 = p0 * (1.0 - f0) + p1 * f0
    tau = jnp.where(straight, (T(z1) - T(z0)) / dlz_s,
                    sig0 * jnp.maximum(b - a, 0.0))
    return jnp.maximum(tau, 0.0)


def _axis_range_max(prof3, p0, p1):
    """min over axes of the per-axis range-max of a (..., 3, P) profile set
    over the local-coordinate box [p0, p1] (both (..., 3), clipped to
    [0, 1]) — the loop-free DDA-supergrid bound shared by the segment
    majorant and the residual collision rate."""
    lo = jnp.minimum(p0, p1)
    hi = jnp.maximum(p0, p1)
    P = prof3.shape[-1]
    ia = jnp.clip((lo * P).astype(jnp.int32), 0, P - 1)
    ib = jnp.clip((hi * P).astype(jnp.int32), 0, P - 1)
    ar = jnp.arange(P)
    mask = (ar >= ia[..., None]) & (ar <= ib[..., None])  # (..., 3, P)
    per_axis = jnp.max(jnp.where(mask, prof3, 0.0), axis=-1)  # (..., 3)
    return jnp.min(per_axis, axis=-1)


def medium_ctrl_tau_segment(scene, medium_idx, ray, a, b, wavelengths):
    """CONTROL optical depth over the ray segment [a, b] -> (..., nc): the
    exact integral of the medium's control field sigma_c. Homogeneous media
    use sigma_t itself (full closed form, zero residual); heterogeneous
    media use the horizontal-mean vertical profile built at scene load
    (build_spectra._control_and_residual_profiles). Building block of the
    residual ratio-tracking NEE estimator (Novák et al. 2014; the reference
    only ratio-tracks, volpath.cpp:282-365)."""
    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    batch = jnp.broadcast_shapes(a.shape, b.shape)
    tau = jnp.zeros(batch + (nc,))
    if not cfg.medium_kinds:
        return tau
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    seg = jnp.maximum(b - a, 0.0)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            st = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
            v = st * seg[..., None]
        elif kname == "heterogeneous":
            w2l = Transform(m=tg(params["w2l_m"], slot),
                            inv_t=tg(params["w2l_it"], slot))
            o_z = w2l.transform_affine_point(ray.o)[..., 2]
            dlz = w2l.transform_vector(ray.d)[..., 2]
            t1d = _tau_1d_profile(tg(params["cprof"], slot),
                                  tg(params["ccum"], slot),
                                  tg(params["cD"], slot), o_z, dlz, a, b)
            v = (t1d * tg(params["scale"], slot))[..., None] * jnp.ones((nc,))
        else:
            raise ValueError(kname)
        tau = jnp.where(m[..., None], v, tau)
    return jnp.clip(tau, 0.0, 60.0)


def medium_residual_rate(scene, medium_idx, ray, a, b):
    """Residual collision rate for the segment [a, b] -> (...,): a bound on
    |sigma_t - sigma_c| over the segment (min over the per-axis range-max
    residual profiles, times the medium's scale). Detached — a sampling
    parameter like the majorant. Zero for homogeneous media (their control
    is exact)."""
    batch = jnp.broadcast_shapes(a.shape, b.shape)
    out = jnp.zeros(batch)
    cfg = scene.config
    if "heterogeneous" not in cfg.medium_kinds:
        return out
    k_het = cfg.medium_kinds.index("heterogeneous")
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    m = kind == k_het
    params = scene.media["heterogeneous"]
    w2l = Transform(m=tg(params["w2l_m"], slot), inv_t=tg(params["w2l_it"], slot))
    t1 = jnp.minimum(b, INVALID_T)
    p0 = jnp.clip(w2l.transform_affine_point(ray.at(a)), 0.0, 1.0)
    p1 = jnp.clip(w2l.transform_affine_point(ray.at(t1)), 0.0, 1.0)
    rate = _axis_range_max(tg(params["resprof"], slot), p0, p1) \
        * tg(params["scale"], slot)
    rate = jax.lax.stop_gradient(jnp.maximum(rate, 0.0))
    return jnp.where(m, rate, out)


def medium_residual_sample(scene, medium_idx, ray, a, b, xi):
    """First residual collision on the segment [a, b], sampled from the
    LOCAL z-profile residual rate (x/y-capped piecewise-constant bound on
    |sigma - sigma_c|; _flight_profile_setup/_flight_sample) instead of
    the segment-global range-max — collisions arrive at the local rate,
    ~6x fewer for the test atmosphere's horizontal modulation. Returns
    (hit, dt, R_local) with R_local the rate AT the sampled point (the
    residual-ratio-tracking weight denominator). Homogeneous media have
    zero residual: never a collision. Detached sampling parameters.
    The 'ff_majorant'='segment' ablation knob recovers the segment-global
    scalar rate."""
    batch = jnp.broadcast_shapes(a.shape, b.shape)
    hit = jnp.zeros(batch, bool)
    dt = jnp.zeros(batch)
    r_local = jnp.zeros(batch)
    cfg = scene.config
    if "heterogeneous" not in cfg.medium_kinds:
        return hit, dt, r_local
    try:
        mode = dict(cfg.integrator.extra).get("ff_majorant", "profile")
    except Exception:
        mode = "profile"
    if mode == "segment":
        rate = medium_residual_rate(scene, medium_idx, ray, a, b)
        dts = a - jnp.log1p(-xi) / jnp.maximum(rate, 1e-20)
        h = (dts < b) & (rate > 0)
        return h, jnp.where(h, dts, 0.0), jnp.where(h, rate, 0.0)
    k_het = cfg.medium_kinds.index("heterogeneous")
    m = tg(scene.medium_kind, medium_idx) == k_het
    slot = tg(scene.medium_slot, medium_idx)
    params = scene.media["heterogeneous"]
    w2l = Transform(m=tg(params["w2l_m"], slot),
                    inv_t=tg(params["w2l_it"], slot))
    mq, qa, qb, adlz, r_at_a, is_const = _flight_profile_setup(
        tg(params["resprof"], slot), tg(params["scale"], slot),
        w2l, ray, a, b)
    t_prof, r_k, _lam = _flight_sample(mq, qa, qb, adlz, a, xi)
    # horizontal lanes: constant local rate
    t_const = a - jnp.log1p(-xi) / jnp.maximum(r_at_a, 1e-20)
    t_s = jnp.where(is_const, t_const, t_prof)
    r_s = jnp.where(is_const, r_at_a, r_k)
    h = m & (t_s < b) & (r_s > 0)
    return h, jnp.where(h, t_s, 0.0), jnp.where(h, r_s, 0.0)


def medium_ctrl_sigma(scene, medium_idx, p, wavelengths):
    """Control field sigma_c at world point p -> (..., nc) (scale included;
    the subtrahend of the residual collision weight). Homogeneous: sigma_t
    itself; heterogeneous: the vertical control profile."""
    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    out = jnp.zeros(medium_idx.shape + (nc,))
    if not cfg.medium_kinds:
        return out
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            v = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
        elif kname == "heterogeneous":
            w2l = Transform(m=tg(params["w2l_m"], slot),
                            inv_t=tg(params["w2l_it"], slot))
            z = w2l.transform_affine_point(p)[..., 2]
            prof = tg(params["cprof"], slot)
            Dn = tg(params["cD"], slot)
            _i, f, p0, p1 = _profile_lerp_setup(prof, Dn, z)
            sig = p0 * (1.0 - f) + p1 * f
            v = (sig * tg(params["scale"], slot))[..., None] * jnp.ones((nc,))
        else:
            raise ValueError(kname)
        out = jnp.where(m[..., None], v, out)
    return out


def medium_sigma_t(scene, medium_idx, p, wavelengths):
    """sigma_t alone at world point p -> (..., nc) (the residual-collision
    integrand; skips the albedo volume eval medium_scattering_coefficients
    would pay — on TPU every volume eval is a full-wavefront gather)."""
    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    out = jnp.zeros(medium_idx.shape + (nc,))
    if not cfg.medium_kinds:
        return out
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            v = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
        elif kname == "heterogeneous":
            v = volume_eval(scene, tg(params["sigma_t_vol"], slot), p,
                            wavelengths) * tg(params["scale"], slot)[..., None]
        else:
            raise ValueError(kname)
        out = jnp.where(m[..., None], v, out)
    return out


def medium_tau_segment(scene, medium_idx, ray, a, b, wavelengths,
                       quad_points=8):
    """Optical depth integral of sigma_t over the ray segment [a, b]
    -> (..., nc). Deterministic-transmittance building block (the
    nee_transmittance='quadrature' estimator; no reference counterpart —
    the reference only ratio-tracks, volpath.cpp:282-365).

    - homogeneous media: exact, sigma_t * (b - a)
    - heterogeneous vertical profiles (scene.config.het_profile1d — every
      1-channel clamp grid constant over x/y, the plane-parallel
      atmosphere case): EXACT closed form via the per-medium cumulative
      table T(z) = int_0^z sigma built at scene load; tau =
      scale * (T(z(b)) - T(z(a))) / d_local_z. Replaces the K-point
      quadrature (K trilinear grid evals per segment) with two table
      lookups AND removes its O(K^-2) bias.
    - general heterogeneous grids: Gauss-Legendre quadrature with
      ``quad_points`` nodes (consistent, not unbiased).
    """
    import numpy as _np

    cfg = scene.config
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    batch = jnp.broadcast_shapes(a.shape, b.shape)
    tau = jnp.zeros(batch + (nc,))
    if not cfg.medium_kinds:
        return tau
    kind = tg(scene.medium_kind, medium_idx)
    slot = tg(scene.medium_slot, medium_idx)
    seg = jnp.maximum(b - a, 0.0)
    for k, kname in enumerate(cfg.medium_kinds):
        m = kind == k
        params = scene.media[kname]
        if kname == "homogeneous":
            st = _spec(scene, tg(params["sigma_t"], slot), wavelengths) \
                * tg(params["scale"], slot)[..., None]
            v = st * seg[..., None]
        elif kname == "heterogeneous":
            if cfg.het_profile1d:
                w2l = Transform(m=tg(params["w2l_m"], slot),
                                inv_t=tg(params["w2l_it"], slot))
                o_z = w2l.transform_affine_point(ray.o)[..., 2]
                dlz = w2l.transform_vector(ray.d)[..., 2]
                tau_s = _tau_1d_profile(tg(params["zprof"], slot),
                                        tg(params["zcum"], slot),
                                        tg(params["zD"], slot),
                                        o_z, dlz, a, b)
                v = (tau_s * tg(params["scale"], slot))[..., None] \
                    * jnp.ones((nc,))
            else:
                # Gauss-Legendre over the segment (general 3D grids)
                nodes, weights = _np.polynomial.legendre.leggauss(quad_points)
                ts = (a[..., None] * 0.5 * (1.0 - jnp.asarray(nodes, jnp.float32))
                      + b[..., None] * 0.5 * (1.0 + jnp.asarray(nodes, jnp.float32)))
                p_k = ray.o[..., None, :] + ray.d[..., None, :] * ts[..., None]
                med_k = jnp.broadcast_to(medium_idx[..., None], ts.shape)
                wl_k = jnp.broadcast_to(wavelengths[..., None, :],
                                        ts.shape + (wavelengths.shape[-1],))
                _ss, _sn, sigma_t = medium_scattering_coefficients(
                    scene, med_k, p_k, wl_k)
                w = jnp.asarray(weights, jnp.float32)
                v = 0.5 * seg[..., None] * jnp.sum(
                    w[..., None] * sigma_t, axis=-2)
        else:
            raise ValueError(kname)
        tau = jnp.where(m[..., None], v, tau)
    return jnp.clip(tau, 0.0, 60.0)


def medium_is_homogeneous(scene, medium_idx):
    cfg = scene.config
    kind = tg(scene.medium_kind, medium_idx)
    out = jnp.zeros(medium_idx.shape, bool)
    for k, kname in enumerate(cfg.medium_kinds):
        if kname == "homogeneous":
            out = out | (kind == k)
    return out


def sample_interaction(scene, medium_idx, ray, sample, channel, active,
                       mode=None):
    """Medium::sample_interaction (medium.cpp:36-77). medium_idx: (...,) i32
    (clamped >= 0 by caller; ``active`` must exclude vacuum lanes).

    mode='profile' (default): heterogeneous lanes free-flight against the
    LOCAL z-axis majorant profile (x/y-capped, piecewise constant —
    inverse-transform sampled in closed form, _flight_sample) instead of
    the segment-global range-max. Null collisions then arrive at the local
    rate: ~14x fewer events for the exponential test atmosphere, and for
    true plane-parallel profiles the majorant tracks sigma_t to the bin
    resolution (nearly no nulls at all). Same unbiased delta-tracking
    estimator — only the (detached) majorant field changed shape.
    mode='segment' recovers the round-3 scalar segment majorant; the
    default (None) reads the integrator's 'ff_majorant' extra (ablation
    knob), falling back to 'profile'."""
    if mode is None:
        try:
            mode = dict(scene.config.integrator.extra).get(
                "ff_majorant", "profile")
        except Exception:
            mode = "profile"
    seg_ok, mint, maxt = medium_intersect_bounds(scene, medium_idx, ray, active)
    mint = jnp.where(seg_ok, jnp.maximum(mint, 0.0), 0.0)
    maxt = jnp.where(seg_ok, jnp.minimum(maxt, INVALID_T), INVALID_T)

    cfg = scene.config
    all_het = tuple(cfg.medium_kinds) == ("heterogeneous",)
    if mode == "profile" and all_het:
        # every lane takes the profile path below: skip the (redundant)
        # 3-axis segment range-max pass entirely
        nc = ray.wavelengths.shape[-1] if cfg.variant.is_spectral \
            else cfg.variant.n_channels
        combined = jnp.ones(mint.shape + (nc,))
        m = jnp.ones(mint.shape)
    else:
        combined = medium_majorant_segment(scene, medium_idx, ray, mint,
                                           maxt, ray.wavelengths)
        nc = combined.shape[-1]
        ch = jnp.clip(channel, 0, nc - 1)
        m = index_channel(combined, ch)

    sampled_t = mint - jnp.log1p(-sample) / m
    batch = sampled_t.shape
    P = AXPROF_BINS
    ff_mq = jnp.zeros(batch + (P,))
    ff_qa = jnp.zeros(batch)
    ff_qb = jnp.zeros(batch)
    ff_adlz = jnp.ones(batch)
    ff_on = jnp.zeros(batch, bool)
    cfg = scene.config
    if mode == "profile" and "heterogeneous" in cfg.medium_kinds:
        k_het = cfg.medium_kinds.index("heterogeneous")
        het = (tg(scene.medium_kind, medium_idx) == k_het) & seg_ok
        slot = tg(scene.medium_slot, medium_idx)
        params = scene.media["heterogeneous"]
        w2l = Transform(m=tg(params["w2l_m"], slot),
                        inv_t=tg(params["w2l_it"], slot))
        mq, qa, qb, adlz, m_at_a, is_const = _flight_profile_setup(
            tg(params["axprof"], slot), tg(params["majorant"], slot),
            w2l, ray, mint, maxt)
        t_prof, m_local, _lam_tot = _flight_sample(mq, qa, qb, adlz, mint,
                                                   sample)
        t_prof = jnp.minimum(t_prof, jnp.where(t_prof < 0.5 * INVALID_T,
                                               maxt, INVALID_T))
        # horizontal lanes: constant local rate m_at_a
        t_const = mint - jnp.log1p(-sample) / jnp.maximum(m_at_a, 1e-20)
        use_prof = het & ~is_const
        use_const = het & is_const
        sampled_t = jnp.where(use_prof, t_prof,
                              jnp.where(use_const, t_const, sampled_t))
        m_loc_all = jnp.where(use_prof, m_local,
                              jnp.where(use_const, m_at_a, m))
        m_loc_all = jnp.maximum(m_loc_all, 1e-8)
        combined = jnp.where(het[..., None], m_loc_all[..., None], combined)
        ff_mq = jnp.where(use_prof[..., None], mq, ff_mq)
        ff_qa = jnp.where(use_prof, qa, ff_qa)
        ff_qb = jnp.where(use_prof, qb, ff_qb)
        ff_adlz = jnp.where(use_prof, adlz, ff_adlz)
        ff_on = use_prof

    valid_mi = seg_ok & (sampled_t <= maxt)
    t = jnp.where(valid_mi, sampled_t, INVALID_T)
    p = ray.at(jnp.where(valid_mi, sampled_t, 0.0))
    sigma_s, sigma_n, sigma_t = medium_scattering_coefficients(
        scene, medium_idx, p, ray.wavelengths, majorant=combined)
    return MediumInteraction(
        t=t, p=p, mint=mint, sigma_s=sigma_s, sigma_n=sigma_n,
        sigma_t=sigma_t, combined_extinction=combined, maxt=maxt,
        ff_mq=ff_mq, ff_qa=ff_qa, ff_qb=ff_qb, ff_adlz=ff_adlz, ff_on=ff_on)


def eval_tr_and_pdf(mi: MediumInteraction, si_t):
    """Medium::eval_tr_and_pdf (medium.cpp:80-91).

    Profile-flight lanes (mi.ff_on) rebuild the exact inhomogeneous
    optical depth Lambda(t) from the parametrization stashed on the
    interaction; others use the constant-majorant formula. The optical
    depth is clamped to 60 so tr (and the pdf built from it) never
    underflows to zero/subnormal — the tr/pdf ratio estimator is exact
    under this clamp (extinction is carried by the free-flight event
    probability, not the tr magnitude), and it keeps every division VJP in
    the volumetric integrators finite."""
    t_end = jnp.minimum(mi.t, si_t)
    t = jnp.clip(t_end - mi.mint, 0.0, INVALID_T)
    x_const = t[..., None] * mi.combined_extinction
    lam = _flight_tau(mi.ff_mq, mi.ff_qa, mi.ff_qb, mi.ff_adlz, mi.mint,
                      t_end)
    x = jnp.where(mi.ff_on[..., None], lam[..., None], x_const)
    x = jnp.clip(x, 0.0, 60.0)
    tr = jnp.exp(-x)
    pdf = jnp.where((si_t < mi.t)[..., None], tr,
                    tr * mi.combined_extinction)
    return tr, pdf
