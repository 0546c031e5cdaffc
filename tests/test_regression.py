"""Statistical render regression (z-test harness, test_renders.py analog)
+ EXR/bitmap IO tests."""

import numpy as np
import pytest

from eradiate_kernel_tpu.utils import bitmap, ztest
from eradiate_kernel_tpu.utils.scenes import cornell_box, atmosphere


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.exr")
    bitmap.write_exr(p, img)
    back, names = bitmap.read_exr(p)
    assert names == ["R", "G", "B"]
    assert np.array_equal(back, img)


def test_exr_single_channel(tmp_path):
    img = np.random.default_rng(1).random((4, 6)).astype(np.float32)
    p = str(tmp_path / "y.exr")
    bitmap.write_exr(p, img)
    back, names = bitmap.read_exr(p)
    assert back.shape == (4, 6, 1) and names == ["Y"]
    assert np.array_equal(back[..., 0], img)


def test_png_write_read(tmp_path):
    img = np.random.default_rng(2).random((8, 8, 3)).astype(np.float32) * 0.8
    p = str(tmp_path / "z.png")
    bitmap.write_png(p, img)
    back = bitmap.read_image(p)
    assert np.allclose(back, img, atol=0.01)  # 8-bit quantization


def test_ztest_self_consistency(tmp_path):
    """Same scene, independent seeds: the z-test must pass."""
    d = cornell_box(width=24, height=24, spp=32, max_depth=3)
    ok, frac, _ = ztest.check_scene(d, str(tmp_path), "cbox",
                                    spp=64, ref_spp=256)
    assert ok, f"only {frac:.4f} of pixels passed"


def test_ztest_detects_regression(tmp_path):
    """A perturbed scene must FAIL against the stored reference."""
    d = cornell_box(width=24, height=24, spp=32, max_depth=3)
    ztest.check_scene(d, str(tmp_path), "cbox2", spp=64, ref_spp=256)
    bad = cornell_box(width=24, height=24, spp=32, max_depth=3)
    bad["white_bsdf"]["reflectance"]["value"] = [0.6, 0.698, 0.666]
    ok, frac, _ = ztest.check_scene(bad, str(tmp_path), "cbox2", spp=64)
    assert not ok, f"{frac:.4f} of pixels passed a perturbed scene"


def test_ztest_atmosphere(tmp_path):
    """The flagship volpath atmosphere scene under the z-test."""
    d = atmosphere(width=16, height=16, spp=16, max_depth=8)
    ok, frac, _ = ztest.check_scene(d, str(tmp_path), "atmo",
                                    spp=48, ref_spp=192)
    assert ok, f"only {frac:.4f} of pixels passed"
