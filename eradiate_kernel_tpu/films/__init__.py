"""Film and image-block accumulation.

Counterparts of include/mitsuba/render/{film,imageblock}.h and
src/films/hdrfilm.cpp. The film is an (H, W, C) array with channels
[X, Y, Z, A, W] (+ AOVs later); ``film_put`` splats sample values into the
reconstruction-filter footprint with a deterministic scatter-add
(imageblock.cpp:80-170 — the GPU path's scatter_add, :159), and ``develop``
divides out the accumulated filter weight and converts XYZ to the output
color space (hdrfilm.cpp:97-160).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..rfilters import eval_filter, filter_radius

N_BASE_CHANNELS = 5  # X, Y, Z, A, W


def film_put(image, pos, values, rfilter_kind: str, rfilter_params=None):
    """Splat samples into the film.

    image: (H, W, C); pos: (N, 2) continuous pixel coords (x, y) in
    [0,W)x[0,H); values: (N, C). Returns updated image. The filter footprint
    is static: ceil(2*radius) taps per axis (imageblock.cpp border logic).
    """
    H, W, C = image.shape
    radius = filter_radius(rfilter_kind, rfilter_params)
    if radius <= 0.5 + 1e-6:
        # single-pixel fast path (imageblock.cpp <=0.5-radius special case)
        px = jnp.clip(pos[:, 0].astype(jnp.int32), 0, W - 1)
        py = jnp.clip(pos[:, 1].astype(jnp.int32), 0, H - 1)
        return image.at[py, px].add(values)

    n = int(2 * radius + 0.999) + 1
    # lowest tap index: floor(pos - radius + 0.5) in pixel-index space
    base_x = jnp.floor(pos[:, 0] - radius + 0.5).astype(jnp.int32)
    base_y = jnp.floor(pos[:, 1] - radius + 0.5).astype(jnp.int32)
    # one batched (N, n, n) scatter-add instead of n^2 sequential sweeps:
    # the separable weights evaluate as (N, n) per axis and outer-product;
    # a single flattened scatter lets XLA sort/accumulate once
    taps = jnp.arange(n, dtype=jnp.int32)
    tap_y = base_y[:, None] + taps                     # (N, n)
    tap_x = base_x[:, None] + taps
    wy = eval_filter(rfilter_kind,
                     (tap_y.astype(jnp.float32) + 0.5) - pos[:, 1:2],
                     rfilter_params)
    wx = eval_filter(rfilter_kind,
                     (tap_x.astype(jnp.float32) + 0.5) - pos[:, 0:1],
                     rfilter_params)
    wy = jnp.where((tap_y >= 0) & (tap_y < H), wy, 0.0)
    wx = jnp.where((tap_x >= 0) & (tap_x < W), wx, 0.0)
    iy = jnp.clip(tap_y, 0, H - 1)
    ix = jnp.clip(tap_x, 0, W - 1)
    N = pos.shape[0]
    flat = image.reshape(H * W, C)
    if N * n * n <= (1 << 22):
        # one batched scatter: the (N, n, n, C) update tensor stays small
        w = wy[:, :, None] * wx[:, None, :]                # (N, n, n)
        lin = iy[:, :, None] * W + ix[:, None, :]          # (N, n, n)
        contrib = values[:, None, None, :] * w[..., None]  # (N, n, n, C)
        flat = flat.at[lin.reshape(-1)].add(contrib.reshape(-1, C))
    else:
        # huge single-pass wavefronts: n scatters of (N*n, C) rows keeps
        # the materialized update tensor bounded
        for r in range(n):
            w = wy[:, r:r + 1] * wx                        # (N, n)
            lin = iy[:, r:r + 1] * W + ix                  # (N, n)
            contrib = values[:, None, :] * w[..., None]    # (N, n, C)
            flat = flat.at[lin.reshape(-1)].add(contrib.reshape(-1, C))
    return flat.reshape(H, W, C)


def film_gather(image, pos, rfilter_kind: str, rfilter_params=None):
    """Adjoint of ``film_put``: filter-weighted gather of an (H, W, C)
    cotangent image at continuous sample positions -> (N, C).

    film_put is linear in ``values`` (a scatter with fixed weights A);
    this computes A^T ct with the identical tap enumeration and weights,
    so <film_put(0, pos, v), ct> == <v, film_gather(ct, pos)> exactly.
    Used by the path-replay backward (integrators/replay.py) to route film
    cotangents to per-sample result cotangents without materializing any
    film inside a loop."""
    H, W, C = image.shape
    radius = filter_radius(rfilter_kind, rfilter_params)
    if radius <= 0.5 + 1e-6:
        px = jnp.clip(pos[:, 0].astype(jnp.int32), 0, W - 1)
        py = jnp.clip(pos[:, 1].astype(jnp.int32), 0, H - 1)
        return image[py, px]
    n = int(2 * radius + 0.999) + 1
    base_x = jnp.floor(pos[:, 0] - radius + 0.5).astype(jnp.int32)
    base_y = jnp.floor(pos[:, 1] - radius + 0.5).astype(jnp.int32)
    taps = jnp.arange(n, dtype=jnp.int32)
    tap_y = base_y[:, None] + taps                     # (N, n)
    tap_x = base_x[:, None] + taps
    wy = eval_filter(rfilter_kind,
                     (tap_y.astype(jnp.float32) + 0.5) - pos[:, 1:2],
                     rfilter_params)
    wx = eval_filter(rfilter_kind,
                     (tap_x.astype(jnp.float32) + 0.5) - pos[:, 0:1],
                     rfilter_params)
    wy = jnp.where((tap_y >= 0) & (tap_y < H), wy, 0.0)
    wx = jnp.where((tap_x >= 0) & (tap_x < W), wx, 0.0)
    iy = jnp.clip(tap_y, 0, H - 1)
    ix = jnp.clip(tap_x, 0, W - 1)
    N = pos.shape[0]
    flat = image.reshape(H * W, C)
    lin = iy[:, :, None] * W + ix[:, None, :]          # (N, n, n)
    rows = flat[lin.reshape(-1)].reshape(N, n, n, C)
    w = wy[:, :, None] * wx[:, None, :]
    return jnp.sum(rows * w[..., None], axis=(1, 2))


def develop(image, mode: str = "rgb", pixel_format: str = "rgb"):
    """Weight-divide and convert (hdrfilm.cpp develop :97-160).

    pixel_format: 'rgb' (linear sRGB, default), 'rgba' (+alpha from the
    valid-sample channel), 'xyz', or 'luminance' (Y). Mono variants always
    return (H, W, 1) luminance."""
    from ..core.spectrum import xyz_to_srgb

    w = jnp.maximum(image[..., 4:5], 1e-12)
    xyz = image[..., 0:3] / w
    if mode == "mono" or pixel_format == "luminance":
        return xyz[..., 1:2]
    if pixel_format == "xyz":
        return xyz
    rgb = xyz_to_srgb(xyz)
    if pixel_format == "rgba":
        alpha = image[..., 3:4] / w
        return jnp.concatenate([rgb, alpha], -1)
    return rgb


def save(path: str, image, mode: str = "rgb", pixel_format: str = "rgb",
         aovs: dict | None = None):
    """Develop + write to disk (hdrfilm develop-to-file). '.exr' gets the
    native float codec (+ AOV channels); anything else goes through PNG
    with the sRGB transfer."""
    import numpy as np

    from ..utils import bitmap

    img = np.asarray(develop(image, mode, pixel_format))
    if path.lower().endswith(".exr"):
        names = {1: ["Y"], 3: ["R", "G", "B"],
                 4: ["R", "G", "B", "A"]}[img.shape[-1]]
        if aovs:
            extra = np.stack([np.asarray(v) for v in aovs.values()], -1)
            img = np.concatenate([img, extra], -1)
            names = names + list(aovs.keys())
        bitmap.write_exr(path, img, names)
    elif path.lower().endswith(".pfm"):
        bitmap.write_pfm(path, img)
    elif path.lower().endswith(".ppm"):
        bitmap.write_ppm(path, img)
    elif path.lower().endswith((".hdr", ".rgbe")):
        bitmap.write_rgbe(path, img)
    else:
        bitmap.write_png(path, img)
