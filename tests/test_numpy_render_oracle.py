"""Independent NumPy renderer oracle for the Cornell-box direct lighting.

VERDICT weak #3: the z-test regression harness renders its own references,
so a frozen bias would never be caught. This test re-renders the canned
Cornell box (direct illumination, max_depth=2) with a fully independent
NumPy implementation — its own camera model (built from the reference's
math: look_at basis include/mitsuba/core/transform.h:241-257, perspective
sample mapping include/mitsuba/render/sensor.h:196-230 + core/transform.h
perspective, which reduce for a square film to
d_cam ~ (tan(fov/2)(1-2sx), tan(fov/2)(1-2sy), 1)), its own hand-derived
rectangle geometry, its own numpy RNG, and the textbook area-sampled
direct-lighting estimator — then compares mean images pixel by pixel with
a statistical gate.

What this pins absolutely (shared-code-free): the perspective ray
conventions (orientation! a left/right flip would pass every furnace and
chi2 test), rectangle intersection + transforms, diffuse BRDF
normalization, one-sided area-emitter semantics, NEE solid-angle
conversion, film box-filter averaging, and the path integrator's
max_depth accounting (reference: path.cpp MIS loop — MIS reweighting
does not change the expectation this oracle computes).
"""

import numpy as np
import pytest

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.utils.scenes import cornell_box

# --- independent scene model (hand-derived world-space rectangles) --------
# Each rect: (center, edge_u (half), edge_v (half), normal) — one-sided
# normals facing the box interior, derived by hand from the dict's
# translate/rotate/scale chain (comments in utils/scenes.py).
WHITE = np.array([0.885, 0.698, 0.666])
RED = np.array([0.57, 0.04, 0.04])
GREEN = np.array([0.105, 0.37, 0.067])
LE = np.array([18.387, 13.9873, 6.75357])

RECTS = [
    # center, u half-edge, v half-edge, normal, albedo rgb, emission rgb
    ([0, -1, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0], WHITE, None),   # floor
    ([0, 1, 0], [1, 0, 0], [0, 0, 1], [0, -1, 0], WHITE, None),   # ceiling
    ([0, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, -1], WHITE, None),   # back
    ([-1, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0], GREEN, None),   # x=-1
    ([1, 0, 0], [0, 0, 1], [0, 1, 0], [-1, 0, 0], RED, None),     # x=+1
    ([0, 0.99, 0], [0.23, 0, 0], [0, 0, 0.19], [0, -1, 0],
     np.zeros(3), LE),                                            # light
]
LIGHT = 5
LIGHT_AREA = (2 * 0.23) * (2 * 0.19)


def _intersect(o, d):
    """Nearest-hit over the rect list. o, d: (N, 3). Returns (t, idx) with
    idx = -1 for misses."""
    n_rays = o.shape[0]
    best_t = np.full(n_rays, np.inf)
    best_i = np.full(n_rays, -1, np.int64)
    for i, (c, eu, ev, n, _alb, _em) in enumerate(RECTS):
        c = np.asarray(c, np.float64)
        eu = np.asarray(eu, np.float64)
        ev = np.asarray(ev, np.float64)
        n = np.asarray(n, np.float64)
        denom = d @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((c - o) @ n) / denom
        p = o + t[:, None] * d
        lu = (p - c) @ eu / (eu @ eu)
        lv = (p - c) @ ev / (ev @ ev)
        hit = (np.abs(denom) > 1e-12) & (t > 1e-6) & \
            (np.abs(lu) <= 1.0) & (np.abs(lv) <= 1.0) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_i = np.where(hit, i, best_i)
    return best_t, best_i


def _camera_rays(W, H, rng, spp):
    """Reference-convention perspective rays: origin [0,0,-3.9], look_at
    [0,0,0], up [0,1,0], fov_x 39.3077, square film."""
    origin = np.array([0.0, 0.0, -3.9])
    dir_ = np.array([0.0, 0.0, 1.0])
    up = np.array([0.0, 1.0, 0.0])
    left = np.cross(up, dir_)
    left /= np.linalg.norm(left)
    new_up = np.cross(dir_, left)
    tan = np.tan(np.deg2rad(39.3077) / 2.0)

    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = np.repeat(ii.reshape(-1), spp).astype(np.float64)
    py = np.repeat(jj.reshape(-1), spp).astype(np.float64)
    sx = (px + rng.random(px.shape)) / W
    sy = (py + rng.random(py.shape)) / H
    d_cam = np.stack([tan * (1 - 2 * sx), tan * (1 - 2 * sy),
                      np.ones_like(sx)], -1)
    d = d_cam[:, 0:1] * left + d_cam[:, 1:2] * new_up + d_cam[:, 2:3] * dir_
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(origin, d.shape).copy()
    return o, d


def _oracle_render(W, H, spp, seed=0):
    """Direct lighting (camera hit emission + one NEE bounce) — the
    expectation of path/max_depth=2."""
    rng = np.random.default_rng(seed)
    o, d = _camera_rays(W, H, rng, spp)
    n_rays = o.shape[0]
    t, idx = _intersect(o, d)
    result = np.zeros((n_rays, 3))

    albedo = np.array([r[4] for r in RECTS])
    normals = np.array([r[3] for r in RECTS], np.float64)

    hit = idx >= 0
    p = o + t[:, None] * d
    n = normals[np.maximum(idx, 0)]
    front = (np.einsum("ij,ij->i", -d, n) > 0) & hit

    # camera ray hits the light head-on
    result[(idx == LIGHT) & front] += LE

    # NEE: uniform area sample on the light
    c, eu, ev, nl = (np.asarray(RECTS[LIGHT][k], np.float64)
                     for k in range(4))
    y = (c + (2 * rng.random(n_rays) - 1)[:, None] * eu
         + (2 * rng.random(n_rays) - 1)[:, None] * ev)
    to_l = y - p
    r2 = np.einsum("ij,ij->i", to_l, to_l)
    wl = to_l / np.sqrt(np.maximum(r2, 1e-30))[:, None]
    cos_x = np.einsum("ij,ij->i", n, wl)
    cos_l = np.einsum("j,ij->i", nl, -wl)
    # visibility: the shadow ray must reach the light first
    ts, is_ = _intersect(p + 1e-6 * n, wl)
    vis = (is_ == LIGHT)
    valid = hit & front & (idx != LIGHT) & (cos_x > 0) & (cos_l > 0) & vis
    g = np.where(valid, cos_x * np.maximum(cos_l, 0) / r2, 0.0)
    f = albedo[np.maximum(idx, 0)] / np.pi
    result += np.where(valid[:, None], f * LE * (g * LIGHT_AREA)[:, None],
                       0.0)
    img = result.reshape(H, W, spp, 3).mean(axis=2)
    # per-pixel stderr of the mean (for the statistical gate)
    var = result.reshape(H, W, spp, 3).var(axis=2)
    return img, np.sqrt(var / spp)


@pytest.mark.slow
def test_cbox_direct_lighting_vs_numpy_oracle():
    W = H = 16
    spp_oracle = 8192
    img_o, se_o = _oracle_render(W, H, spp_oracle, seed=7)

    scene = load_dict(cornell_box(width=W, height=H, spp=512, max_depth=2))
    imgs = [np.asarray(integrators.render(scene, seed=s)) for s in range(4)]
    img_r = np.mean(imgs, axis=0)
    se_r = np.std(imgs, axis=0, ddof=1) / 2.0

    se = np.sqrt(se_o ** 2 + se_r ** 2)
    z = np.abs(img_r - img_o) / np.maximum(se, 1e-4)
    # gate: 99% of pixel-channels within 4 sigma, none beyond 8 sigma +
    # small absolute slack (float32 render vs float64 oracle)
    frac_ok = float((z < 4.0).mean())
    assert frac_ok > 0.99, (
        f"{(1 - frac_ok) * 100:.1f}% of pixels beyond 4 sigma; "
        f"max |render - oracle| = {np.abs(img_r - img_o).max():.4f}")
    bad = np.abs(img_r - img_o) > 8.0 * se + 0.01
    assert not bad.any(), (
        f"outliers at {np.argwhere(bad)[:5]}; "
        f"render {img_r[bad][:5]} vs oracle {img_o[bad][:5]}")
    # orientation canary: the render and the oracle must agree on which
    # image half is redder/greener (a flipped camera x-axis could pass a
    # symmetric statistical gate; the per-pixel z gate above would catch
    # it, but this failure reads better)
    lh, rh = img_r[:, : W // 2], img_r[:, W // 2:]
    lo, ro = img_o[:, : W // 2], img_o[:, W // 2:]
    assert (lo[..., 0].mean() > ro[..., 0].mean()) == \
        (lh[..., 0].mean() > rh[..., 0].mean())
    assert (lo[..., 1].mean() > ro[..., 1].mean()) == \
        (lh[..., 1].mean() > rh[..., 1].mean())
