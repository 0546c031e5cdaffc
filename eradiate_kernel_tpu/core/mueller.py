"""Mueller/Stokes calculus (counterpart of include/mitsuba/render/mueller.h).

Stokes vectors are (..., 4) arrays [S0=intensity, S1=0/90 linear, S2=+-45
linear, S3=circular]; Mueller matrices are (..., 4, 4). The reference's
convention: Stokes bases are defined w.r.t. a propagation direction and a
horizontal axis; ``rotate_stokes_basis`` re-expresses a vector in a rotated
basis, and ``rotated_element`` conjugates an optical element.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import normalize


def depolarizer(value=1.0):
    """Mueller matrix that scales intensity and kills polarization
    (mueller.h depolarizer)."""
    value = jnp.asarray(value)
    m = jnp.zeros(value.shape + (4, 4))
    return m.at[..., 0, 0].set(value)


def absorber(value):
    """Ideal absorber: uniform attenuation (mueller.h absorber)."""
    value = jnp.asarray(value)
    return jnp.eye(4) * value[..., None, None]


def linear_polarizer(value=1.0):
    """Ideal linear polarizer along the horizontal axis
    (mueller.h linear_polarizer); ``value`` is the peak transmittance."""
    value = jnp.asarray(value)
    a = 0.5 * value
    m = jnp.zeros(value.shape + (4, 4))
    m = m.at[..., 0, 0].set(a).at[..., 0, 1].set(a)
    m = m.at[..., 1, 0].set(a).at[..., 1, 1].set(a)
    return m


def linear_retarder(phase):
    """Linear retarder with fast axis horizontal and given phase delay
    (mueller.h linear_retarder); phase = pi -> half-wave plate."""
    phase = jnp.asarray(phase)
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    m = jnp.zeros(phase.shape + (4, 4))
    m = m.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    m = m.at[..., 2, 2].set(c).at[..., 3, 3].set(c)
    m = m.at[..., 2, 3].set(s).at[..., 3, 2].set(-s)
    return m


def right_circular_polarizer():
    """mueller.h right_circular_polarizer."""
    m = jnp.zeros((4, 4))
    m = m.at[0, 0].set(0.5).at[0, 3].set(0.5)
    m = m.at[3, 0].set(0.5).at[3, 3].set(0.5)
    return m


def left_circular_polarizer():
    m = jnp.zeros((4, 4))
    m = m.at[0, 0].set(0.5).at[0, 3].set(-0.5)
    m = m.at[3, 0].set(-0.5).at[3, 3].set(0.5)
    return m


def rotator(theta):
    """Rotation of the Stokes frame by angle theta (mueller.h rotator)."""
    theta = jnp.asarray(theta)
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    m = jnp.zeros(theta.shape + (4, 4))
    m = m.at[..., 0, 0].set(1.0).at[..., 3, 3].set(1.0)
    m = m.at[..., 1, 1].set(c).at[..., 1, 2].set(s)
    m = m.at[..., 2, 1].set(-s).at[..., 2, 2].set(c)
    return m


def rotated_element(theta, m):
    """Conjugate an element by basis rotations: R(theta) M R(-theta)
    (mueller.h rotated_element)."""
    return rotator(theta) @ m @ rotator(-theta)


def specular_reflection(cos_theta_i, eta_c_real, eta_c_imag=None):
    """Mueller matrix of specular reflection off a (possibly conducting)
    interface (mueller.h specular_reflection), unpolarized-Fresnel split
    into s/p amplitudes.

    cos_theta_i: (...,) >= 0; eta: real (+ optional imaginary) relative IOR.
    """
    ci = jnp.clip(jnp.asarray(cos_theta_i), 1e-6, 1.0)
    if eta_c_imag is None:
        eta_c_imag = jnp.zeros_like(jnp.asarray(eta_c_real))
    er = jnp.asarray(eta_c_real)
    ei = jnp.asarray(eta_c_imag)
    # broadcast up-front: cos often carries a keepdim-1 channel axis while
    # eta is per-channel (conductor spectra)
    ci, er, ei = jnp.broadcast_arrays(ci, er, ei)
    si2 = 1.0 - ci * ci
    # complex arithmetic via explicit re/im (complex64 avoided in kernels)
    e2_r = er * er - ei * ei
    e2_i = 2 * er * ei
    # ct = sqrt(eta^2 - sin^2) (complex)
    a_r = e2_r - si2
    a_i = e2_i
    mod = jnp.sqrt(jnp.sqrt(a_r * a_r + a_i * a_i))
    arg = 0.5 * jnp.arctan2(a_i, a_r)
    ct_r = mod * jnp.cos(arg)
    ct_i = mod * jnp.sin(arg)

    def cdiv(ar, ai, br, bi):
        d = br * br + bi * bi
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

    # r_s = (ci - ct) / (ci + ct);  r_p = (eta^2 ci - ct) / (eta^2 ci + ct)
    rs_r, rs_i = cdiv(ci - ct_r, -ct_i, ci + ct_r, ct_i)
    rp_r, rp_i = cdiv(e2_r * ci - ct_r, e2_i * ci - ct_i,
                      e2_r * ci + ct_r, e2_i * ci + ct_i)
    Rs = rs_r * rs_r + rs_i * rs_i
    Rp = rp_r * rp_r + rp_i * rp_i
    # relative phase between s and p
    cos_delta = (rs_r * rp_r + rs_i * rp_i) / jnp.maximum(
        jnp.sqrt(Rs * Rp), 1e-20)
    sin_delta = (rs_i * rp_r - rs_r * rp_i) / jnp.maximum(
        jnp.sqrt(Rs * Rp), 1e-20)
    a = 0.5 * (Rs + Rp)
    b = 0.5 * (Rs - Rp)
    c = jnp.sqrt(Rs * Rp) * cos_delta
    s = jnp.sqrt(Rs * Rp) * sin_delta
    m = jnp.zeros(ci.shape + (4, 4))
    m = m.at[..., 0, 0].set(a).at[..., 1, 1].set(a)
    m = m.at[..., 0, 1].set(b).at[..., 1, 0].set(b)
    m = m.at[..., 2, 2].set(c).at[..., 3, 3].set(c)
    m = m.at[..., 2, 3].set(s).at[..., 3, 2].set(-s)
    return m


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a dielectric
    (mueller.h specular_transmission); total internal reflection -> zero."""
    ci = jnp.clip(jnp.asarray(cos_theta_i), 1e-6, 1.0)
    eta = jnp.asarray(eta)
    si2 = 1.0 - ci * ci
    ct2 = 1.0 - si2 / (eta * eta)
    valid = ct2 > 0
    ct = jnp.sqrt(jnp.maximum(ct2, 1e-12))
    ts = 2.0 * ci / (ci + eta * ct)
    tp = 2.0 * ci / (eta * ci + ct)
    factor = eta * ct / ci  # radiance/irradiance geometry factor
    Ts = ts * ts * factor
    Tp = tp * tp * factor
    a = 0.5 * (Ts + Tp)
    b = 0.5 * (Ts - Tp)
    c = jnp.sqrt(Ts * Tp)
    m = jnp.zeros(ci.shape + (4, 4))
    m = m.at[..., 0, 0].set(a).at[..., 1, 1].set(a)
    m = m.at[..., 0, 1].set(b).at[..., 1, 0].set(b)
    m = m.at[..., 2, 2].set(c).at[..., 3, 3].set(c)
    return jnp.where(valid[..., None, None], m, 0.0)


def rayleigh_scatter(cos_theta):
    """Rayleigh scattering Mueller matrix (Hansen & Travis 1974 eq. 2.15,
    Chandrasekhar) in the scattering-plane frame whose horizontal Stokes
    axis is PERPENDICULAR to the scattering plane for both directions;
    ``cos_theta`` is the scattering angle between the in/out propagation
    directions. M[0,0] equals the scalar Rayleigh phase value
    3/(16 pi) (1 + cos^2) (phase/rayleigh), so S0 transport matches the
    unpolarized integrator exactly. The reference's phase functions are
    scalar-only (phase.h:130-225) — this matrix is a beyond-reference
    capability for polarized atmospheres."""
    c = jnp.asarray(cos_theta)
    k = 3.0 / (16.0 * jnp.pi)
    s2 = 1.0 - c * c
    m = jnp.zeros(c.shape + (4, 4))
    m = m.at[..., 0, 0].set(k * (1.0 + c * c))
    m = m.at[..., 1, 1].set(k * (1.0 + c * c))
    m = m.at[..., 0, 1].set(k * s2)
    m = m.at[..., 1, 0].set(k * s2)
    m = m.at[..., 2, 2].set(k * 2.0 * c)
    m = m.at[..., 3, 3].set(k * 2.0 * c)
    return m


def stokes_basis(d):
    """Canonical horizontal basis vector perpendicular to propagation d
    (mueller.h stokes_basis): any stable perpendicular."""
    from .math import coordinate_system
    s, _t = coordinate_system(d)
    return s


def rotate_stokes_basis(d, basis_current, basis_target):
    """Mueller rotator re-expressing Stokes vectors from basis_current to
    basis_target, both perpendicular to d (mueller.h rotate_stokes_basis)."""
    x = jnp.sum(basis_current * basis_target, axis=-1)
    y = jnp.sum(jnp.cross(basis_current, basis_target) * d, axis=-1)
    theta = jnp.arctan2(y, x)
    return rotator(theta)


def rotate_mueller_basis(m, in_d, in_basis_current, in_basis_target,
                         out_d, out_basis_current, out_basis_target):
    """Re-express a Mueller matrix under new incident/outgoing Stokes frames
    (mueller.h rotate_mueller_basis:324-334): R_out @ M @ R_in^T."""
    r_in = rotate_stokes_basis(in_d, in_basis_current, in_basis_target)
    r_out = rotate_stokes_basis(out_d, out_basis_current, out_basis_target)
    return r_out @ m @ jnp.swapaxes(r_in, -1, -2)


def rotate_mueller_basis_collinear(m, d, basis_current, basis_target):
    """Same-frame variant (mueller.h:363-369): R @ M @ R^T."""
    r = rotate_stokes_basis(d, basis_current, basis_target)
    return r @ m @ jnp.swapaxes(r, -1, -2)


def to_world_mueller(sh_frame, m, in_forward_local, out_forward_local):
    """Re-express a Mueller matrix given on local-frame directions in the
    implicit world-space Stokes bases (interaction.h:275-296
    to_world_mueller): after this, matrices from consecutive path vertices
    compose by plain matmul.

    m: (..., nc, 4, 4) per-channel stack (or (..., 4, 4));
    in/out_forward_local: (..., 3) light-propagation directions in the
    shading frame.
    """
    in_w = sh_frame.to_world(in_forward_local)
    out_w = sh_frame.to_world(out_forward_local)
    in_cur = sh_frame.to_world(stokes_basis(in_forward_local))
    out_cur = sh_frame.to_world(stokes_basis(out_forward_local))
    if m.ndim == in_w.ndim + 2:  # extra channel axis between batch and 4x4
        exp = lambda v: v[..., None, :]
    else:
        exp = lambda v: v
    return rotate_mueller_basis(
        m, exp(in_w), exp(in_cur), exp(stokes_basis(in_w)),
        exp(out_w), exp(out_cur), exp(stokes_basis(out_w)))
