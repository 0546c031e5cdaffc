"""3D volume textures (counterparts of src/textures/{constant3d,grid3d}.cpp).

Volume registry kinds:
  'constvolume': value (n, nc_store)
  'gridvolume':  grid (n, D, H, W, C) padded, world_to_local (n, 4, 4) pair,
                 vmax (n,) — precomputed max for majorants (grid3d.cpp:88)

Evaluation is XLA gather-based trilinear interpolation (grid3d.cpp:254-295).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.gather import table_gather as tg
from ..core.transform import Transform


def _axis_weights(g, n_axis):
    """(..., n_axis) linear-interpolation weight vector along one grid axis:
    (1 - f) at i0 and f at i0 + 1 — the factorized form of a trilinear
    one-hot."""
    i0 = jnp.clip(g.astype(jnp.int32), 0, max(n_axis - 2, 0))
    f = (g - i0)[..., None]
    ar = jnp.arange(n_axis)
    w = jnp.where(ar == i0[..., None], 1.0 - f, 0.0)
    i1 = jnp.minimum(i0 + 1, n_axis - 1)
    return jnp.where(ar == i1[..., None], w + f, w)


# Voxel-count threshold between the einsum path (O(D*H*W) MACs/lane, wins
# for tiny grids where everything stays in registers/VMEM and lands on the
# MXU) and the 8-corner gather path (grid3d.cpp:254-295 analog, O(8)
# loads/lane, the only viable scheme at production grid sizes like 64^3+).
EINSUM_MAX_VOXELS = 4096


def _trilinear(grid, vslot, pl):
    """Trilinear interpolation with a static grid-size policy (see
    EINSUM_MAX_VOXELS). grid: (S, D, H, W, C); pl: (..., 3) in [0,1]^3
    local coordinates; vslot: (...,) volume slot. Returns (..., C)."""
    S, D, H, W, C = grid.shape
    if D * H * W > EINSUM_MAX_VOXELS:
        return _trilinear_gather(grid, vslot, pl)
    return _trilinear_einsum(grid, vslot, pl)


def _corner_setup(grid_shape, vslot, pl):
    """Shared trilinear-gather preamble: flat indices of the 8 corner voxels
    (in zyx-binary order c000..c111 with bits = (z, y, x)) and the three
    fractional weights. grid_shape: (S, D, H, W)."""
    S, D, H, W = grid_shape
    gx = jnp.clip(pl[..., 0], 0.0, 1.0) * (W - 1)
    gy = jnp.clip(pl[..., 1], 0.0, 1.0) * (H - 1)
    gz = jnp.clip(pl[..., 2], 0.0, 1.0) * (D - 1)
    x0 = jnp.clip(gx.astype(jnp.int32), 0, max(W - 2, 0))
    y0 = jnp.clip(gy.astype(jnp.int32), 0, max(H - 2, 0))
    z0 = jnp.clip(gz.astype(jnp.int32), 0, max(D - 2, 0))
    fx = (gx - x0)[..., None]
    fy = (gy - y0)[..., None]
    fz = (gz - z0)[..., None]
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    base = vslot * (D * H * W)
    idx = [base + (z * H + y) * W + x
           for z in (z0, z1) for y in (y0, y1) for x in (x0, x1)]
    return idx, fx, fy, fz


def _lerp8(c, fx, fy, fz):
    """Trilinear combine of 8 corner values in _corner_setup order."""
    c00 = c[0] * (1 - fx) + c[1] * fx
    c01 = c[2] * (1 - fx) + c[3] * fx
    c10 = c[4] * (1 - fx) + c[5] * fx
    c11 = c[6] * (1 - fx) + c[7] * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _packed_corners(grid):
    """(S, D, H, W, C) -> (S*D*H*W, 8*C): every voxel's full trilinear
    neighborhood in one row (c000..c111 in _corner_setup's zyx-bit order,
    +1 neighbors edge-clamped exactly like min(i+1, n-1)).

    An XLA TPU gather costs ~50 ns PER INDEX regardless of the slice width
    (measured: the 8 separate corner gathers were 84% of the 64^3-grid
    volpath's device time), so fetching the 8 corners as ONE 8C-wide row
    gather is ~8x cheaper. The packed table is pure shifted copies of the
    grid — computed in-graph so gradients still flow to the original grid
    array (ParameterMap updates stay valid), and hoisted out of render
    loops as loop-invariant."""
    S, D, H, W, C = grid.shape

    def shift(dz, dy, dx):
        g = grid
        if dz:
            g = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
        if dy:
            g = jnp.concatenate([g[:, :, 1:], g[:, :, -1:]], axis=2)
        if dx:
            g = jnp.concatenate([g[:, :, :, 1:], g[:, :, :, -1:]], axis=3)
        return g

    corners = [shift(z, y, x) for z in (0, 1) for y in (0, 1) for x in (0, 1)]
    return jnp.stack(corners, -2).reshape(S * D * H * W, 8 * C)


# above this many voxels the one-row-gather path pays for the 8x packed
# table; tiny grids keep the one-hot einsum (see EINSUM_MAX_VOXELS)
PACKED_GATHER_MIN_VOXELS = 4096


def _trilinear_gather(grid, vslot, pl):
    """Packed-neighborhood gather + lerp (the grid3d.cpp:254-295 analog).
    Scales to arbitrary grid sizes: per lane it loads one 8C-wide row (its
    8 corner voxels) from the packed table."""
    S, D, H, W, C = grid.shape
    idx, fx, fy, fz = _corner_setup((S, D, H, W), vslot, pl)
    packed = _packed_corners(grid)
    rows = packed[idx[0]]  # (..., 8C) — idx[0] is the c000 corner
    return _lerp8([rows[..., k * C:(k + 1) * C] for k in range(8)],
                  fx, fy, fz)


def _trilinear_gather_srgb(grid, vslot, pl, wavelengths):
    """Spectrally-upsampled trilinear eval (grid3d.cpp:300-341
    `uses_srgb_model`): corners store [rgb2spec coeff (3), scale (1)]; the
    sigmoid model is evaluated AT EACH CORNER for the ray's wavelengths and
    the resulting spectra are interpolated, with the brightness scale
    interpolated separately — exactly the reference's scheme (interpolating
    raw coefficients instead would bend the sigmoid nonlinearly between
    voxels)."""
    from ..render.texture import srgb_model_eval

    S, D, H, W, C = grid.shape
    idx, fx, fy, fz = _corner_setup((S, D, H, W), vslot, pl)
    packed = _packed_corners(grid)
    rows = packed[idx[0]]  # (..., 8*4): one row gather, see _packed_corners
    corners = [rows[..., k * C:(k + 1) * C] for k in range(8)]
    spectra = [srgb_model_eval(c[..., :3], wavelengths) for c in corners]
    scales = [c[..., 3:4] for c in corners]
    return _lerp8(spectra, fx, fy, fz) * _lerp8(scales, fx, fy, fz)


def _trilinear_einsum(grid, vslot, pl):
    """Factorized trilinear interpolation: three tiny per-axis weight
    vectors contracted against the grid in one dense einsum (MXU work)
    instead of 8 voxel-count-wide one-hot gathers — the compare cost drops
    from 8 x n_voxels to W + H + D per lane and the MACs land on the
    systolic array. Only viable for small grids (see EINSUM_MAX_VOXELS)."""
    S, D, H, W, C = grid.shape
    wx = _axis_weights(jnp.clip(pl[..., 0], 0.0, 1.0) * (W - 1), W)
    wy = _axis_weights(jnp.clip(pl[..., 1], 0.0, 1.0) * (H - 1), H)
    wz = _axis_weights(jnp.clip(pl[..., 2], 0.0, 1.0) * (D - 1), D)
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("...d,...h,...w,sdhwc->...sc", wz, wy, wx, grid,
                     precision=hi)
    ws = (jnp.arange(S) == vslot[..., None]).astype(grid.dtype)
    return jnp.einsum("...s,...sc->...c", ws, tmp, precision=hi)


def _nearest_gather(grid, vslot, pl):
    """Nearest-voxel lookup (grid3d.cpp FilterType::Nearest: scale to the
    volume resolution with no half-texel shift, floor). Voxel i covers
    [i/W, (i+1)/W) — the reference's cell-centered nearest semantics."""
    S, D, H, W, C = grid.shape
    x = jnp.clip((pl[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((pl[..., 1] * H).astype(jnp.int32), 0, H - 1)
    z = jnp.clip((pl[..., 2] * D).astype(jnp.int32), 0, D - 1)
    flat = grid.reshape(S * D * H * W, C)
    return flat[vslot * (D * H * W) + (z * H + y) * W + x]


def _apply_wrap(params, vslot, pl):
    """Per-slot wrap mode (grid3d.cpp:234-250): 0 = clamp (out-of-domain
    lookups masked to zero, the medium never queries outside its bbox),
    1 = repeat (periodic tiling), 2 = mirror. Returns (wrapped local
    coords, inside mask) — repeat/mirror map every point into [0, 1], so
    their inside mask is all-true."""
    wrap = tg(params["wrap"], vslot)[..., None]
    rep = pl - jnp.floor(pl)
    half = 0.5 * pl - jnp.floor(0.5 * pl)
    mir = 1.0 - jnp.abs(2.0 * half - 1.0)
    pl_w = jnp.where(wrap == 1, rep, jnp.where(wrap == 2, mir, pl))
    inside = jnp.all((pl_w >= 0.0) & (pl_w <= 1.0), axis=-1)
    return pl_w, inside


def volume_eval(scene, vol_idx, p, wavelengths, active=True):
    """Evaluate volume objects per lane at world position p -> (..., nc)."""
    cfg = scene.config
    kinds = cfg.volume_kinds
    vkind = tg(scene.vol_kind, vol_idx)
    vslot = tg(scene.vol_slot, vol_idx)
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(vkind.shape + (nc,))
    for k, kind in enumerate(kinds):
        m = vkind == k
        params = scene.volumes[kind]
        if kind == "constvolume":
            v = tg(params["value"], vslot)
            if v.shape[-1] == 1:
                v = jnp.broadcast_to(v, v.shape[:-1] + (nc,))
            elif v.shape[-1] != nc:
                v = jnp.broadcast_to(jnp.mean(v, -1, keepdims=True),
                                     v.shape[:-1] + (nc,))
        elif kind in ("gridvolume", "gridvolume_nearest"):
            tw = Transform(m=tg(params["w2l_m"], vslot),
                           inv_t=tg(params["w2l_it"], vslot))
            pl = tw.transform_affine_point(p)  # local in [0,1]^3
            pl, inside = _apply_wrap(params, vslot, pl)
            grid = params["grid"]  # (n, D, H, W, C)
            C = grid.shape[-1]
            if kind == "gridvolume_nearest":
                c = _nearest_gather(grid, vslot, pl)
            else:
                c = _trilinear(grid, vslot, pl)
            c = jnp.where(inside[..., None], c, 0.0)
            if cfg.variant.is_spectral and C == 4:
                # srgb-packed (nearest filter): single-voxel sigmoid eval
                from ..render.texture import srgb_model_eval
                v = srgb_model_eval(c[..., :3], wavelengths) * c[..., 3:4]
                v = jnp.where(inside[..., None], v, 0.0)
            elif C == 1:
                v = jnp.broadcast_to(c, c.shape[:-1] + (nc,))
            elif C == nc:
                v = c
            else:
                v = jnp.broadcast_to(jnp.mean(c, -1, keepdims=True),
                                     c.shape[:-1] + (nc,))
        elif kind == "gridvolume_srgb":
            # spectral variants, 3-channel grids: per-voxel rgb2spec
            # coefficients + scale baked at scene build (grid3d.cpp:69-89),
            # sigmoid evaluated per corner at the hero wavelengths
            tw = Transform(m=tg(params["w2l_m"], vslot),
                           inv_t=tg(params["w2l_it"], vslot))
            pl = tw.transform_affine_point(p)
            pl, inside = _apply_wrap(params, vslot, pl)
            v = _trilinear_gather_srgb(params["grid"], vslot, pl, wavelengths)
            v = jnp.where(inside[..., None], v, 0.0)
        elif kind == "gridvolume_spectral":
            tw = Transform(m=tg(params["w2l_m"], vslot),
                           inv_t=tg(params["w2l_it"], vslot))
            pl = tw.transform_affine_point(p)
            grid = params["grid"]          # (n, D, H, W, S)
            S = grid.shape[-1]
            spec = _trilinear(grid, vslot, pl)     # (..., S)
            inside = jnp.all((pl >= 0.0) & (pl <= 1.0), axis=-1)
            spec = jnp.where(inside[..., None], spec, 0.0)
            if cfg.variant.is_spectral:
                # linear interp along the wavelength axis per hero lambda
                lo = tg(params["wl_lo"], vslot)[..., None]
                hi = tg(params["wl_hi"], vslot)[..., None]
                t_ = jnp.clip((wavelengths - lo)
                              / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0) * (S - 1)
                i0 = jnp.clip(t_.astype(jnp.int32), 0, max(S - 2, 0))
                f_ = t_ - i0
                v0 = jnp.take_along_axis(spec, i0, axis=-1)
                v1 = jnp.take_along_axis(spec, jnp.minimum(i0 + 1, S - 1),
                                         axis=-1)
                v = v0 * (1 - f_) + v1 * f_
            else:
                # color modes: spectral mean (the loader normally pre-bakes;
                # runtime fallback keeps the kind usable everywhere)
                v = jnp.broadcast_to(jnp.mean(spec, -1, keepdims=True),
                                     spec.shape[:-1] + (nc,))
        else:
            raise ValueError(f"unknown volume kind {kind}")
        out = jnp.where(m[..., None], v, out)
    return out


def volume_max(scene, vol_idx):
    """Per-lane maximum value of the volume (majorant source, grid3d.cpp:88)."""
    kinds = scene.config.volume_kinds
    vkind = tg(scene.vol_kind, vol_idx)
    vslot = tg(scene.vol_slot, vol_idx)
    out = jnp.zeros(vkind.shape)
    for k, kind in enumerate(kinds):
        m = vkind == k
        params = scene.volumes[kind]
        if kind == "constvolume":
            v = jnp.max(tg(params["value"], vslot), axis=-1)
        else:
            v = tg(params["vmax"], vslot)
        out = jnp.where(m, v, out)
    return out


def volume_eval_gradient(scene, vol_idx, p, wavelengths, active=True):
    """Spatial gradient of the volume w.r.t. the world position
    (Volume::eval_gradient, texture.h:210-263). Three forward-mode JVPs of
    the interpolant — exact for the trilinear model, zero for constvolume.
    Returns (..., nc, 3)."""
    import jax

    def f(pp):
        return volume_eval(scene, vol_idx, pp, wavelengths, active)

    cols = []
    for a in range(3):
        tangent = jnp.zeros_like(p).at[..., a].set(1.0)
        cols.append(jax.jvp(f, (p,), (tangent,))[1])
    return jnp.stack(cols, axis=-1)
