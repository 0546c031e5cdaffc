"""Host-side simulation of the Pallas block-BVH traversal: exact node-pop /
leaf-visit counts per 512-ray block, to attribute kernel time between scalar
traversal overhead and leaf Moller-Trumbore work. Not a test — a perf probe.
"""

import sys
import numpy as np

sys.path.insert(0, ".")
from bench_mesh import terrain, make_rays  # noqa: E402
from eradiate_kernel_tpu.ops import accel  # noqa: E402
from eradiate_kernel_tpu.ops.bvh import build_tile_bvh  # noqa: E402

RAY_BLOCK = 512


def simulate_block(rays, nbox, nmeta, tiles):
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    mint = rays[:, 6]
    maxt = rays[:, 7]
    inv = np.sign(d) / np.maximum(np.abs(d), 1e-30)
    best_t = maxt.copy()
    bt_ub = maxt.max()
    v0, e1, e2 = tiles["v0"], tiles["e1"], tiles["e2"]
    prim = tiles["prim"]

    stack = [0]
    pops = leaves = 0
    while stack:
        node = stack.pop()
        pops += 1
        left, right, tile, inst = nmeta[node]
        if tile >= 0:
            leaves += 1
            # dense MT batch
            tv0, te1, te2 = v0[tile], e1[tile], e2[tile]  # (K, 3)
            p = np.cross(d[:, None, :], te2[None])
            det = np.einsum("kc,nkc->nk", te1, p)
            invd = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
            tv = o[:, None, :] - tv0[None]
            u = np.einsum("nkc,nkc->nk", tv, p) * invd
            q = np.cross(tv, te1[None])
            vv = np.einsum("nc,nkc->nk", d, q) * invd
            t = np.einsum("kc,nkc->nk", te2, q) * invd
            ok = ((np.abs(det) >= 1e-12) & (u >= 0) & (vv >= 0)
                  & (u + vv <= 1) & (prim[tile][None] >= 0)
                  & (t >= mint[:, None]) & (t < best_t[:, None]))
            t = np.where(ok, t, np.inf)
            tmin = t.min(1)
            best_t = np.minimum(best_t, tmin)
            bt_ub = best_t.max()
            continue

        def slab(j):
            lo = nbox[j, 0, 0:3]
            hi = nbox[j, 0, 3:6]
            t0 = (lo[None] - o) * inv
            t1 = (hi[None] - o) * inv
            near = np.maximum(np.minimum(t0, t1).max(1), mint)
            far = np.minimum(np.maximum(t0, t1).min(1),
                             np.minimum(maxt, bt_ub))
            ok = near <= far
            return ok.any(), near[ok].min() if ok.any() else np.inf

        hl, nl = slab(left)
        hr, nr = slab(right)
        first, second = (left, right) if nl <= nr else (right, left)
        pf, ps = (hl, hr) if nl <= nr else (hr, hl)
        if ps:
            stack.append(second)
        if pf:
            stack.append(first)
    return pops, leaves


def main():
    V, F = terrain(256)
    tiles = accel.pack_tiles(V, None, F, np.zeros(len(F), np.int32))
    nbox, nmeta, depth = build_tile_bvh(tiles["lo"], tiles["hi"])
    n_rays = 1 << 16  # 128 blocks is a good sample
    for kind in ("primary", "incoherent"):
        o, d = make_rays(n_rays, kind)
        rays = np.concatenate([o, d, np.zeros((n_rays, 1), np.float32),
                               np.full((n_rays, 1), np.inf, np.float32)], 1)
        P = L = 0
        nb = n_rays // RAY_BLOCK
        for b in range(nb):
            p, l = simulate_block(rays[b * RAY_BLOCK:(b + 1) * RAY_BLOCK],
                                  nbox, nmeta, tiles)
            P += p
            L += l
        print(f"{kind}: avg pops/block {P/nb:.1f}  avg leaves/block {L/nb:.1f}"
              f"  (T={tiles['lo'].shape[0]} tiles, depth={depth})")


if __name__ == "__main__":
    main()
