"""Phase functions (counterparts of src/phase/*.cpp).

Conventions follow the reference exactly (hg.cpp:52-80): directions are
sampled in a frame whose +z is the propagation direction ``ray.d``; ``eval``
takes (wi, wo) with wi = -ray.d and returns the pdf (= the phase value; all
phase functions here are normalized pdfs over the sphere).

Registry kinds:
  'isotropic': {}                            (isotropic.cpp)
  'hg':        g (n,)                        (hg.cpp:43-66)
  'rayleigh':  {}                            (rayleigh.cpp:42-67, exact cubic)
  'tabphase':  nodes (n, K), values (n, K), cdf (n, K-1), integral (n,),
               count (n,) — tabulated in cos_theta (tabphase.cpp:17-46)
  'blendphase': weight (n,), phase_a (n,), phase_b (n,) nested indices
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import Frame
from ..core.gather import table_gather as tg
from ..core.math import dot, safe_sqrt

INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)

# User-registered phase kinds (register_phasefunction — the analog of the
# reference's Python trampolines, src/librender/python/phase_v.cpp pattern).
CUSTOM = {}


def register_phasefunction(name, module):
    """Extension hook: register a user-defined azimuthally-symmetric phase
    function. ``module`` is any namespace with three functions:

      build(props, builder) -> row dict      (scene-build time, NumPy)
      eval_cos(params, slot, ct) -> value    (ct = dot(wi, wo), wi = -ray.d;
                                              value = normalized pdf)
      sample_cos(params, slot, s1) -> cos    (inverse CDF of the angle to
                                              +ray.d — the hg convention:
                                              eval receives -sample's cos)

    Rows registered by build() become traced device arrays addressable via
    the ParameterMap like built-in kinds."""
    CUSTOM[name] = module


def _hg(cos_theta, g):
    temp = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_FOUR_PI * (1.0 - g * g) / jnp.maximum(temp * safe_sqrt(temp), 1e-12)


def _rayleigh(cos_theta):
    return (3.0 / 16.0) / jnp.pi * (1.0 + cos_theta * cos_theta)


def _tab_eval(params, slot, cos_theta):
    """Linear interp of the tabulated phase over cos_theta, normalized so the
    sphere integral is 1: value = f(cos)/ (2*pi*integral)."""
    nodes = params["nodes"][slot]   # (..., K)
    vals = params["values"][slot]
    K = vals.shape[-1]
    cnt = params["count"][slot]
    x = cos_theta[..., None]
    idx = jnp.clip(jnp.sum((x >= nodes).astype(jnp.int32), -1) - 1, 0, K - 2)
    idx = jnp.minimum(idx, jnp.maximum(cnt - 2, 0))
    x0 = jnp.take_along_axis(nodes, idx[..., None], -1)[..., 0]
    x1 = jnp.take_along_axis(nodes, (idx + 1)[..., None], -1)[..., 0]
    y0 = jnp.take_along_axis(vals, idx[..., None], -1)[..., 0]
    y1 = jnp.take_along_axis(vals, (idx + 1)[..., None], -1)[..., 0]
    f = jnp.clip((cos_theta - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
    v = y0 * (1 - f) + y1 * f
    return v / jnp.maximum(2.0 * jnp.pi * params["integral"][slot], 1e-12)


def _sample_cos_theta(kind, params, slot, s1):
    """Inverse-CDF sample of cos(theta) between wo and +z(=ray.d) per kind."""
    if kind == "isotropic":
        return 1.0 - 2.0 * s1
    if kind == "hg":
        g = tg(params["g"], slot)
        safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
        sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * s1)
        ct = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * safe_g)
        return jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * s1, ct)
    if kind == "rayleigh":
        z = 2.0 * (2.0 * s1 - 1.0)
        tmp = jnp.sqrt(z * z + 1.0)
        A = jnp.cbrt(z + tmp)
        B = jnp.cbrt(z - tmp)
        return jnp.clip(A + B, -1.0, 1.0)
    if kind == "tabphase":
        # inverse CDF over the tabulated pdf in cos_theta
        cdf = params["cdf"][slot]       # (..., K-1) cumulative, unnormalized
        nodes = params["nodes"][slot]
        vals = params["values"][slot]
        K = nodes.shape[-1]
        total = params["integral"][slot]
        u = s1 * total
        seg = jnp.clip(jnp.sum((u[..., None] >= cdf).astype(jnp.int32), -1),
                       0, K - 2)
        cdf_lo = jnp.where(seg > 0,
                           jnp.take_along_axis(cdf, jnp.maximum(seg - 1, 0)[..., None], -1)[..., 0],
                           0.0)
        u_loc = u - cdf_lo
        x0 = jnp.take_along_axis(nodes, seg[..., None], -1)[..., 0]
        x1 = jnp.take_along_axis(nodes, (seg + 1)[..., None], -1)[..., 0]
        y0 = jnp.take_along_axis(vals, seg[..., None], -1)[..., 0]
        y1 = jnp.take_along_axis(vals, (seg + 1)[..., None], -1)[..., 0]
        dx = jnp.maximum(x1 - x0, 1e-9)
        slope = (y1 - y0) / dx
        disc = jnp.maximum(y0 * y0 + 2.0 * slope * u_loc, 0.0)
        tq = 2.0 * u_loc / jnp.maximum(y0 + jnp.sqrt(disc), 1e-12)
        t_lin = u_loc / jnp.maximum(y0, 1e-12)
        t = jnp.where(jnp.abs(slope) * dx < 1e-9 * jnp.maximum(y0, 1e-9),
                      t_lin, tq)
        return jnp.clip(x0 + jnp.clip(t, 0.0, dx), -1.0, 1.0)
    if kind in CUSTOM:
        return CUSTOM[kind].sample_cos(params, slot, s1)
    raise ValueError(kind)


def phase_eval(scene, phase_idx, wi, wo, active=True):
    """Phase value (= pdf) for (wi, wo) world directions; wi = -ray.d."""
    cfg = scene.config
    ct = dot(wi, wo)  # eval_hg(dot(wi, wo)) convention (hg.cpp:80-86)
    out = jnp.zeros(ct.shape)
    if not cfg.phase_kinds:  # medium-free scene
        return out
    kind = tg(scene.phase_kind, phase_idx)
    slot = tg(scene.phase_slot, phase_idx)
    for k, kname in enumerate(cfg.phase_kinds):
        m = kind == k
        params = scene.phases[kname]
        if kname == "isotropic":
            v = jnp.full(ct.shape, INV_FOUR_PI)
        elif kname == "blendphase":
            # weighted mix (blendphase.cpp): eval = lerp of the children;
            # restricted sweep (children cannot be blendphase themselves)
            w = tg(params["weight"], slot)

            def _eval_child(child_idx):
                ck = tg(scene.phase_kind, child_idx)
                cs = tg(scene.phase_slot, child_idx)
                out_c = jnp.zeros(ct.shape)
                for k2, kn2 in enumerate(cfg.phase_kinds):
                    if kn2 == "blendphase":
                        continue
                    m2 = ck == k2
                    p2 = scene.phases[kn2]
                    if kn2 == "isotropic":
                        v2 = jnp.full(ct.shape, INV_FOUR_PI)
                    elif kn2 == "hg":
                        v2 = _hg(ct, tg(p2["g"], cs))
                    elif kn2 == "rayleigh":
                        v2 = _rayleigh(ct)
                    elif kn2 == "tabphase":
                        v2 = _tab_eval(p2, cs, -ct)
                    elif kn2 in CUSTOM:
                        v2 = CUSTOM[kn2].eval_cos(p2, cs, ct)
                    else:
                        raise ValueError(kn2)
                    out_c = jnp.where(m2, v2, out_c)
                return out_c

            v0 = _eval_child(tg(params["phase0"], slot))
            v1 = _eval_child(tg(params["phase1"], slot))
            v = (1.0 - w) * v0 + w * v1
        elif kname == "hg":
            v = _hg(ct, tg(params["g"], slot))
        elif kname == "rayleigh":
            v = _rayleigh(ct)
        elif kname == "tabphase":
            # tabulated over the scattering angle: cos = dot(ray.d, wo) = -ct
            v = _tab_eval(params, slot, -ct)
        elif kname in CUSTOM:
            v = CUSTOM[kname].eval_cos(params, slot, ct)
        else:
            raise ValueError(kname)
        out = jnp.where(m, v, out)
    return jnp.where(active, out, 0.0)


def phase_sample(scene, phase_idx, ray_d, s1, s2, active=True):
    """Sample wo (world); returns (wo, pdf). Frame +z = ray.d (hg.cpp:57-76)."""
    cfg = scene.config
    ct = jnp.zeros(s1.shape)
    if not cfg.phase_kinds:  # medium-free scene: degenerate sample
        wo = jnp.broadcast_to(ray_d, s2.shape[:-1] + (3,))
        return wo, jnp.zeros(s1.shape)
    kind = tg(scene.phase_kind, phase_idx)
    slot = tg(scene.phase_slot, phase_idx)
    for k, kname in enumerate(cfg.phase_kinds):
        m = kind == k
        params = scene.phases[kname]
        if kname == "blendphase":
            # mixture sampling: pick a child by weight, renormalize s1;
            # pdf (below) evaluates the mixture -> consistent estimator
            w = tg(params["weight"], slot)
            pick1 = s1 < w
            s1r = jnp.where(pick1, s1 / jnp.maximum(w, 1e-12),
                            (s1 - w) / jnp.maximum(1.0 - w, 1e-12))
            child = jnp.where(pick1, tg(params["phase1"], slot),
                              tg(params["phase0"], slot))
            child_kind = tg(scene.phase_kind, child)
            child_slot = tg(scene.phase_slot, child)
            ct_b = jnp.zeros_like(s1)
            for k2, kname2 in enumerate(cfg.phase_kinds):
                if kname2 == "blendphase":
                    continue
                m2 = child_kind == k2
                ct_b = jnp.where(
                    m2, _sample_cos_theta(kname2, scene.phases[kname2],
                                          child_slot, s1r), ct_b)
            ct = jnp.where(m, ct_b, ct)
        else:
            ct = jnp.where(m, _sample_cos_theta(kname, params, slot, s1), ct)
    st = safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * s2[..., 1]
    wo_local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    frame = Frame.from_normal(ray_d)
    wo = frame.to_world(wo_local)
    pdf = phase_eval(scene, phase_idx, -ray_d, wo, active)
    return wo, pdf


def phase_mueller(scene, phase_idx, wi, wo, active=True):
    """Polarized phase eval: (..., 4, 4) Mueller matrix in the implicit
    world-space Stokes bases (same composition convention as
    bsdfs.bsdf_eval_mueller), with M[0,0] equal to ``phase_eval`` so S0
    transport matches the scalar integrator exactly.

    The reference's PhaseFunction interface is scalar (phase.h:130-225), so
    its polarized variants multiply the Mueller throughput by the scalar
    phase value — polarization-preserving. We do the same for every kind
    except ``rayleigh``, which gets the true Rayleigh scattering matrix
    rotated through the scattering plane (molecular-scattering polarization
    is the dominant polarimetric signal of Earth atmospheres).
    """
    from ..core import mueller as mu

    cfg = scene.config
    value = phase_eval(scene, phase_idx, wi, wo, active)
    out = value[..., None, None] * jnp.eye(4)
    if "rayleigh" not in cfg.phase_kinds:
        return out

    # light propagation directions (radiance transport toward the camera):
    # arrives along -wo, leaves along wi
    in_fwd = -wo
    out_fwd = wi
    c = dot(in_fwd, out_fwd)
    m_plane = mu.rayleigh_scatter(c)
    # shared perpendicular of the scattering plane; degenerate (collinear)
    # directions have sin^2 = 0 so the basis choice is immaterial there
    n = jnp.cross(in_fwd, out_fwd)
    n_len = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(n_len > 1e-8, n / jnp.maximum(n_len, 1e-12),
                  mu.stokes_basis(in_fwd))
    m_world = mu.rotate_mueller_basis(
        m_plane, in_fwd, n, mu.stokes_basis(in_fwd),
        out_fwd, n, mu.stokes_basis(out_fwd))

    kind = tg(scene.phase_kind, phase_idx)
    for k, kname in enumerate(cfg.phase_kinds):
        if kname != "rayleigh":
            continue
        m = (kind == k) & active
        out = jnp.where(m[..., None, None], m_world, out)
    return out


def phase_sample_mueller(scene, phase_idx, ray_d, s1, s2, active=True):
    """Polarized analog of phase_sample: importance-samples wo with the
    scalar machinery, then returns the Mueller importance weight
    (matrix / pdf; identity for polarization-preserving kinds since the
    scalar sampling is exact: value == pdf)."""
    wo, pdf = phase_sample(scene, phase_idx, ray_d, s1, s2, active)
    m = phase_mueller(scene, phase_idx, -ray_d, wo, active)
    den = jnp.maximum(pdf, 1e-20)[..., None, None]
    weight = jnp.where((pdf > 0)[..., None, None], m / den, 0.0)
    return wo, pdf, weight
