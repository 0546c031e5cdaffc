"""Mitsuba .vol codec + gridvolume filter_type / wrap_mode / use_grid_bbox
(volume_data.h:44-104, grid3d.cpp:58-61,152-154,234-250,343+)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.textures.volumes import volume_eval
from eradiate_kernel_tpu.utils.volfile import read_vol, write_vol


def _scene(grid_dict, mode="rgb"):
    return load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "bound": {"type": "cube",
                  "bsdf": {"type": "null"},
                  "interior": {"type": "heterogeneous",
                               "sigma_t": grid_dict, "albedo": 0.5}},
    }, Variant(mode))


def _slot(scene, kind):
    kinds = scene.config.volume_kinds
    vk = np.asarray(scene.vol_kind)
    idx = [i for i, k in enumerate(vk) if kinds[k] == kind]
    assert idx, f"no {kind} built (kinds: {kinds})"
    return idx[0]


def _eval(scene, gi, pts, nc=3):
    n = len(pts)
    return np.asarray(volume_eval(scene, jnp.full(n, gi, jnp.int32),
                                  jnp.asarray(pts, jnp.float32),
                                  jnp.zeros((n, 0))))


def test_vol_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 3, (5, 4, 3, 1)).astype(np.float32)
    path = str(tmp_path / "t.vol")
    write_vol(path, data, bbox=((-1, 0, 2), (3, 5, 7)))
    back, bbox = read_vol(path)
    assert np.array_equal(back, data)
    assert np.array_equal(bbox, [[-1, 0, 2], [3, 5, 7]])
    # spec guards
    with open(path, "r+b") as f:
        f.seek(3)
        f.write(b"\x02")
    with pytest.raises(ValueError, match="version"):
        read_vol(path)


def test_vol_layout_x_fastest(tmp_path):
    """The file stores x varying fastest (volume_data.h loop order) — a
    hand-packed file must land in (D=z, H=y, W=x) order."""
    import struct
    path = str(tmp_path / "axis.vol")
    # shape x=2, y=1, z=1: values [10, 20] along x
    payload = struct.pack("<3sB5i6f", b"VOL", 3, 1, 2, 1, 1, 1,
                          0, 0, 0, 1, 1, 1) + struct.pack("<2f", 10.0, 20.0)
    open(path, "wb").write(payload)
    data, _ = read_vol(path)
    assert data.shape == (1, 1, 2, 1)
    assert data[0, 0, 0, 0] == 10.0 and data[0, 0, 1, 0] == 20.0


def test_gridvolume_from_file_use_grid_bbox(tmp_path):
    """filename loading + use_grid_bbox: the file bbox -> unit transform
    premultiplies world_to_local (grid3d.cpp:152-154), so a grid whose
    bbox is [1,3]^3 evaluates its center value at world (2,2,2)."""
    z = np.linspace(0.0, 1.0, 5, dtype=np.float32)
    data = np.broadcast_to(z[:, None, None], (5, 5, 5)).copy()
    path = str(tmp_path / "g.vol")
    write_vol(path, data, bbox=((1, 1, 1), (3, 3, 3)))
    scene = _scene({"type": "gridvolume", "filename": path,
                    "use_grid_bbox": True})
    gi = _slot(scene, "gridvolume")
    out = _eval(scene, gi, [[2.0, 2.0, 2.0], [2.0, 2.0, 1.0],
                            [2.0, 2.0, 3.0]])
    assert np.allclose(out[:, 0], [0.5, 0.0, 1.0], atol=1e-6), out[:, 0]


def test_nearest_filter():
    """filter_type='nearest': cell-centered single-voxel lookups, exact
    voxel values and a hard edge at the voxel boundary."""
    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    scene = _scene({"type": "gridvolume", "data": data,
                    "filter_type": "nearest"})
    gi = _slot(scene, "gridvolume_nearest")
    # voxel (z, y, x) covers [x/2,(x+1)/2) etc.; value = (z*2+y)*2+x
    out = _eval(scene, gi, [[0.25, 0.25, 0.25],   # voxel 0,0,0 -> 0
                            [0.75, 0.25, 0.25],   # x=1 -> 1
                            [0.25, 0.75, 0.75],   # y=1,z=1 -> 6
                            [0.49, 0.25, 0.25],   # still voxel 0
                            [0.51, 0.25, 0.25]])  # hard edge -> 1
    assert np.allclose(out[:, 0], [0, 1, 6, 0, 1]), out[:, 0]


def test_wrap_modes():
    """repeat tiles the unit domain; mirror reflects; clamp masks outside
    to zero (the medium never queries outside its bbox)."""
    z = np.linspace(0.0, 1.0, 3, dtype=np.float32)
    data = np.broadcast_to(z[None, None, :], (1, 1, 3)).copy()  # ramp in x
    # grid spans local=world [0,1]; probes beyond x=1 exercise wrapping
    pts = [[0.5, 0.1, 0.1], [1.5, 0.1, 0.1], [2.5, 0.1, 0.1]]

    s_rep = _scene({"type": "gridvolume", "data": data,
                    "wrap_mode": "repeat"})
    o = _eval(s_rep, _slot(s_rep, "gridvolume"), pts)[:, 0]
    assert np.allclose(o, [0.5, 0.5, 0.5], atol=1e-6), o  # frac = 0.5 always

    s_mir = _scene({"type": "gridvolume", "data": data,
                    "wrap_mode": "mirror"})
    o = _eval(s_mir, _slot(s_mir, "gridvolume"), pts)[:, 0]
    # mirror of 1.5 is 0.5; 2.5 has period-2 phase 0.5 -> 0.5
    assert np.allclose(o, [0.5, 0.5, 0.5], atol=1e-6), o
    # asymmetric probes: 1.25 reflects to 0.75; 2.25 wraps to 0.25
    o2 = _eval(s_mir, _slot(s_mir, "gridvolume"),
               [[1.25, 0.1, 0.1], [2.25, 0.1, 0.1]])[:, 0]
    assert np.allclose(o2, [0.75, 0.25], atol=1e-6), o2

    s_cl = _scene({"type": "gridvolume", "data": data,
                   "wrap_mode": "clamp"})
    o = _eval(s_cl, _slot(s_cl, "gridvolume"), pts)[:, 0]
    assert np.allclose(o, [0.5, 0.0, 0.0], atol=1e-6), o  # outside -> 0

    with pytest.raises(ValueError, match="wrap"):
        _scene({"type": "gridvolume", "data": data, "wrap_mode": "bogus"})


def test_nearest_spectral_srgb_packed():
    """Spectral + rgb data + nearest filter: single-voxel sigmoid eval,
    constant across a voxel."""
    rgb = np.array([0.7, 0.2, 0.1], np.float32)
    data = np.broadcast_to(rgb, (2, 2, 2, 3)).copy()
    scene = _scene({"type": "gridvolume", "data": data,
                    "filter_type": "nearest"}, mode="spectral")
    gi = _slot(scene, "gridvolume_nearest")
    wl = jnp.broadcast_to(jnp.asarray([450.0, 550.0, 650.0]), (2, 3))
    out = np.asarray(volume_eval(
        scene, jnp.full(2, gi, jnp.int32),
        jnp.asarray([[0.2, 0.2, 0.2], [0.3, 0.3, 0.3]], jnp.float32), wl))
    assert np.allclose(out[0], out[1])          # same voxel -> same value
    assert out[0, 2] > out[0, 0]                # red-heavy reflectance
    assert np.all(out >= 0) and np.all(out <= 2 * rgb.max() + 1e-6)
