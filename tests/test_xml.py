"""XML loader/writer tests (analog of src/libcore/tests/test_xml.py)."""

import numpy as np
import pytest

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.scene import xml as sxml

CBOX_XML = """
<scene version="2.0.0">
    <default name="spp" value="8"/>
    <integrator type="path">
        <integer name="max_depth" value="3"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="to_world">
            <lookat origin="0 0 -4" target="0 0 0" up="0 1 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="8"/>
            <integer name="height" value="8"/>
            <rfilter type="box"/>
        </film>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.6 0.6 0.6"/>
    </bsdf>
    <shape type="sphere">
        <float name="radius" value="1.0"/>
        <ref id="white"/>
    </shape>
    <emitter type="constant">
        <rgb name="radiance" value="1.0 1.0 1.0"/>
    </emitter>
</scene>
"""


def test_load_string_renders():
    scene = sxml.load_string(CBOX_XML)
    assert scene.config.film_width == 8
    assert scene.config.spp == 8
    assert scene.config.integrator.kind == "path"
    assert scene.config.integrator.max_depth == 3
    img = np.asarray(integrators.render(scene, seed=1))
    assert np.all(np.isfinite(img))
    # background = env 1.0; center = furnace sphere with albedo .6
    assert img[0, 0, 0] == pytest.approx(1.0, abs=0.02)


def test_param_substitution():
    scene = sxml.load_string(CBOX_XML, parameters={"spp": 32})
    assert scene.config.spp == 32


def test_param_undefined_raises():
    bad = CBOX_XML.replace('<default name="spp" value="8"/>', "")
    with pytest.raises(KeyError):
        sxml.load_string(bad)


def test_spectrum_inline_pairs():
    s = sxml.load_string("""
<scene version="2.0.0">
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="4"/>
            <integer name="height" value="4"/>
        </film>
    </sensor>
    <emitter type="constant">
        <spectrum name="radiance" value="400:0.5, 600:1.0, 800:0.5"/>
    </emitter>
</scene>""")
    img = np.asarray(integrators.render(s, seed=0, spp=4))
    assert np.all(np.isfinite(img)) and img.mean() > 0.01


def test_transform_composition():
    s = sxml.load_string("""
<scene version="2.0.0">
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="4"/>
            <integer name="height" value="4"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="to_world">
            <scale value="2"/>
            <translate x="0" y="0" z="1"/>
        </transform>
    </shape>
</scene>""")
    import numpy as np
    m = np.asarray(s.geo.rect_to_world.m[0])
    assert m[2, 3] == pytest.approx(1.0)   # translate applied after scale
    assert m[0, 0] == pytest.approx(2.0)


def test_roundtrip_dict_to_xml():
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    d = cornell_box(width=8, height=8, spp=4, max_depth=3)
    xml_str = sxml.dict_to_xml(d)
    assert "<scene" in xml_str and 'type="path"' in xml_str
    scene2 = sxml.load_string(xml_str)
    from eradiate_kernel_tpu.scene import load_dict
    ref = np.asarray(integrators.render(load_dict(d), seed=4))
    img = np.asarray(integrators.render(scene2, seed=4))
    assert np.allclose(img, ref, atol=5e-2), np.abs(img - ref).max()
