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
        elif kind == "gridvolume":
            tw = Transform(m=tg(params["w2l_m"], vslot),
                           inv_t=tg(params["w2l_it"], vslot))
            pl = tw.transform_affine_point(p)  # local in [0,1]^3
            grid = params["grid"]  # (n, D, H, W, C)
            D, H, W, C = grid.shape[1:]
            gx = jnp.clip(pl[..., 0], 0.0, 1.0) * (W - 1)
            gy = jnp.clip(pl[..., 1], 0.0, 1.0) * (H - 1)
            gz = jnp.clip(pl[..., 2], 0.0, 1.0) * (D - 1)
            x0 = jnp.clip(gx.astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(gx, jnp.int32)
            y0 = jnp.clip(gy.astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(gy, jnp.int32)
            z0 = jnp.clip(gz.astype(jnp.int32), 0, D - 2) if D > 1 else jnp.zeros_like(gz, jnp.int32)
            fx = (gx - x0)[..., None]
            fy = (gy - y0)[..., None]
            fz = (gz - z0)[..., None]
            x1 = jnp.minimum(x0 + 1, W - 1)
            y1 = jnp.minimum(y0 + 1, H - 1)
            z1 = jnp.minimum(z0 + 1, D - 1)
            s = vslot
            # flat one-hot taps: 4-D advanced-indexing gathers are ~10-20x
            # slower on TPU than a one-hot select over the flattened grid
            flat = grid.reshape(-1, C)

            def g(zi, yi, xi):
                idx = ((s * D + zi) * H + yi) * W + xi
                return tg(flat, idx,
                          max_rows=max(512, 0 if flat.shape[0] > 4096
                                       else flat.shape[0]))

            c = (g(z0, y0, x0) * (1 - fx) * (1 - fy) * (1 - fz)
                 + g(z0, y0, x1) * fx * (1 - fy) * (1 - fz)
                 + g(z0, y1, x0) * (1 - fx) * fy * (1 - fz)
                 + g(z0, y1, x1) * fx * fy * (1 - fz)
                 + g(z1, y0, x0) * (1 - fx) * (1 - fy) * fz
                 + g(z1, y0, x1) * fx * (1 - fy) * fz
                 + g(z1, y1, x0) * (1 - fx) * fy * fz
                 + g(z1, y1, x1) * fx * fy * fz)
            inside = jnp.all((pl >= 0.0) & (pl <= 1.0), axis=-1)
            c = jnp.where(inside[..., None], c, 0.0)
            if C == 1:
                v = jnp.broadcast_to(c, c.shape[:-1] + (nc,))
            elif C == nc:
                v = c
            else:
                v = jnp.broadcast_to(jnp.mean(c, -1, keepdims=True),
                                     c.shape[:-1] + (nc,))
        elif kind == "gridvolume_spectral":
            tw = Transform(m=tg(params["w2l_m"], vslot),
                           inv_t=tg(params["w2l_it"], vslot))
            pl = tw.transform_affine_point(p)
            grid = params["grid"]          # (n, D, H, W, S)
            D, H, W, S = grid.shape[1:]
            flat = grid.reshape(-1, S)
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
            sI = vslot

            def g(zi, yi, xi):
                idx = ((sI * D + zi) * H + yi) * W + xi
                return tg(flat, idx,
                          max_rows=max(512, 0 if flat.shape[0] > 4096
                                       else flat.shape[0]))

            spec = (g(z0, y0, x0) * (1 - fx) * (1 - fy) * (1 - fz)
                    + g(z0, y0, x1) * fx * (1 - fy) * (1 - fz)
                    + g(z0, y1, x0) * (1 - fx) * fy * (1 - fz)
                    + g(z0, y1, x1) * fx * fy * (1 - fz)
                    + g(z1, y0, x0) * (1 - fx) * (1 - fy) * fz
                    + g(z1, y0, x1) * fx * (1 - fy) * fz
                    + g(z1, y1, x0) * (1 - fx) * fy * fz
                    + g(z1, y1, x1) * fx * fy * fz)   # (..., S)
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
