"""Generate docs/PLUGIN_REFERENCE.md from the scene-builder sources.

The reference auto-extracts its plugin documentation from RST blocks in
each plugin .cpp (docs/generate_plugin_doc.py); here the plugin "classes"
are branches of the SoA scene compiler, so the reference is extracted from
the builder code itself: for every registered type string, the parameter
keys read from its config dict (``d.get("k", default)`` / ``d["k"]``
patterns in its branch) plus the docstring line of its dispatch site.

Run:  python tools/gen_plugin_docs.py   (rewrites docs/PLUGIN_REFERENCE.md)
"""

import os
import re
import sys
from collections import OrderedDict

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

# plugin kind -> (registry source file(s) to scan)
SOURCES = [
    "eradiate_kernel_tpu/scene/build.py",
    "eradiate_kernel_tpu/scene/build_shapes.py",
    "eradiate_kernel_tpu/scene/build_emitters.py",
    "eradiate_kernel_tpu/scene/build_sensors.py",
    "eradiate_kernel_tpu/scene/build_spectra.py",
    "eradiate_kernel_tpu/scene/build_bsdfs.py",
    "eradiate_kernel_tpu/scene/build_media.py",
]

# the full registry (SURVEY appendix; 'blender' justified-absent)
REGISTRY = {
    "bsdfs": ["bilambertian", "blendbsdf", "bumpmap", "circular",
              "conductor", "dielectric", "diffuse", "mask", "measured",
              "measured_polarized", "normalmap", "null", "plastic",
              "polarizer", "pplastic", "retarder", "roughconductor",
              "roughdielectric", "roughplastic", "rpv", "thindielectric",
              "twosided"],
    "emitters": ["area", "constant", "directional", "envmap", "point",
                 "projector", "spot"],
    "films": ["hdrfilm"],
    "integrators": ["aov", "bins", "depth", "direct", "moment", "nbins",
                    "path", "stokes", "volpath", "volpathmis"],
    "media": ["heterogeneous", "homogeneous"],
    "phase": ["blendphase", "hg", "isotropic", "rayleigh", "tabphase"],
    "rfilters": ["box", "catmullrom", "gaussian", "lanczos", "mitchell",
                 "tent"],
    "samplers": ["independent", "ldsampler", "multijitter", "orthogonal",
                 "stratified"],
    "sensors": ["distant", "distantflux", "irradiancemeter", "mdistant",
                "mradiancemeter", "perspective", "radiancemeter",
                "thinlens"],
    "shapes": ["cone", "cube", "cylinder", "disk", "instance", "obj",
               "ply", "rectangle", "serialized", "shapegroup", "sphere",
               "mesh"],
    "spectra": ["blackbody", "d65", "discrete", "irregular", "regular",
                "srgb", "srgb_d65", "uniform"],
    "textures": ["bitmap", "checkerboard", "constvolume", "gridvolume",
                 "gridvolume_spectral", "mesh_attribute"],
}

GET_RE = re.compile(r"""(?:\bd|\bprops|\bval|\bmed|\bcfg_d)
                        (?:\.get\(\s*"([a-zA-Z0-9_]+)"
                        |\[\s*"([a-zA-Z0-9_]+)"\s*\])""", re.X)
BRANCH_RE = re.compile(
    r"""^(\s*)(?:el)?if\s+(?:t|kind|k)\s*(?:==\s*"([a-zA-Z0-9_]+)"
        |in\s*\(([^)]*)\))""", re.X)

SKIP_KEYS = {"type", "to_world"}  # universal keys, listed once up front


def extract_params():
    """{type string: ordered key list} by scanning builder branch bodies."""
    params = {}
    for rel in SOURCES:
        path = os.path.join(ROOT, rel)
        if not os.path.exists(path):
            continue
        lines = open(path).read().splitlines()
        i = 0
        while i < len(lines):
            m = BRANCH_RE.match(lines[i])
            if not m:
                i += 1
                continue
            indent = len(m.group(1))
            types = []
            if m.group(2):
                types = [m.group(2)]
            else:
                types = re.findall(r'"([a-zA-Z0-9_]+)"', m.group(3) or "")
            body = []
            j = i + 1
            while j < len(lines):
                ln = lines[j]
                if ln.strip() and (len(ln) - len(ln.lstrip())) <= indent \
                        and not ln.lstrip().startswith(("#", '"')):
                    break
                body.append(ln)
                j += 1
            keys = OrderedDict()
            for ln in body:
                for g1, g2 in GET_RE.findall(ln):
                    k = g1 or g2
                    if k and k not in SKIP_KEYS:
                        keys[k] = None
            for t in types:
                if keys:
                    cur = params.setdefault(t, OrderedDict())
                    cur.update(keys)
            i = j if j > i else i + 1
    return params


def extract_module_params(params):
    """Per-module plugins (bsdfs/<name>.py): keys from build(props, ...)
    plus the module docstring's first line as a description."""
    descs = {}
    bdir = os.path.join(ROOT, "eradiate_kernel_tpu", "bsdfs")
    for fn in os.listdir(bdir):
        if not fn.endswith(".py") or fn.startswith("_"):
            continue
        name = fn[:-3]
        src = open(os.path.join(bdir, fn)).read()
        keys = OrderedDict(
            (k, None) for k in re.findall(r'props\.get\(\s*"([a-zA-Z0-9_]+)"',
                                          src)
            if k not in SKIP_KEYS)
        if keys:
            cur = params.setdefault(name, OrderedDict())
            cur.update(keys)
        mdoc = re.match(r'\s*"""(.+?)(?:\n|""")', src)
        if mdoc:
            descs[name] = mdoc.group(1).strip().rstrip(".")
    return descs


# curated keys for plugins whose parameters are parsed outside a
# recognizable builder branch (kept small and verified against the code)
HINTS = {
    "area": ["radiance"],
    "hdrfilm": ["width", "height", "pixel_format", "component_format",
                "rfilter", "crop_offset_x", "crop_offset_y",
                "crop_width", "crop_height"],
    "independent": ["sample_count", "seed"],
    "stratified": ["sample_count", "seed"],
    "multijitter": ["sample_count", "seed"],
    "orthogonal": ["sample_count", "seed"],
    "ldsampler": ["sample_count", "seed"],
    "box": [], "tent": [],
    "gaussian": ["stddev"],
    "mitchell": ["B", "C"],
    "catmullrom": [],
    "lanczos": ["lobes"],
    "twosided": ["(nested bsdf)"],
    "path": ["max_depth", "rr_depth", "hide_emitters"],
    "volpath": ["max_depth", "rr_depth", "max_iterations", "nee_steps",
                "nee_transmittance", "nee_quad_points", "ff_majorant"],
    "volpathmis": ["max_depth", "rr_depth", "max_iterations", "nee_steps"],
    "direct": ["emitter_samples", "bsdf_samples"],
    "depth": [],
    "aov": ["aovs", "(nested integrator)"],
    "moment": ["(nested integrator)"],
    "bins": ["bins", "(nested integrator)"],
    "nbins": ["bins", "tolerance", "(nested integrator)"],
    "stokes": ["(nested integrator)"],
    "isotropic": [],
    "hg": ["g"],
    "rayleigh": [],
    "tabphase": ["values"],
    "blendphase": ["weight", "(two nested phases)"],
    "cube": ["bsdf", "interior", "exterior"],
    "mesh": ["vertices", "faces", "normals", "uvs", "attributes", "bsdf"],
    "perspective": ["fov", "fov_axis", "focal_length", "srf",
                    "shutter_open", "shutter_close"],
    "thinlens": ["fov", "fov_axis"],
    "radiancemeter": ["origin", "direction"],
    "distant": ["ray_target", "ray_origin"],
}


def main():
    params = extract_params()
    descs = extract_module_params(params)
    for t, keys in HINTS.items():
        cur = params.setdefault(t, OrderedDict())
        for k in keys:
            cur.setdefault(k, None)
    out = []
    out.append("# Plugin reference — supported `type` strings\n")
    out.append(
        "Auto-generated by `tools/gen_plugin_docs.py` from the scene-builder\n"
        "sources (the analog of the reference's plugin-doc extraction,\n"
        "docs/generate_plugin_doc.py). Every object takes `type`; shapes,\n"
        "sensors, emitters and volumes also accept `to_world` (matrix,\n"
        "`look_at`, or a transform list). Parameter keys below are\n"
        "extracted from each type's builder branch; see docs/PLUGINS.md\n"
        "for user-defined plugins and tests/ for worked configurations.\n")
    total = 0
    for cat in sorted(REGISTRY):
        names = REGISTRY[cat]
        out.append(f"\n## {cat} ({len(names)})\n")
        for t in names:
            keys = params.get(t)
            extra = f": `{'`, `'.join(list(keys)[:14])}`" if keys else ""
            desc = descs.get(t)
            tail = f" — {desc}" if desc else ""
            out.append(f"- **`{t}`**{extra}{tail}")
            total += 1
    out.append(f"\n\n*{total} plugin type strings; the reference's `blender`"
               " shape (zero-copy Blender pointers) is n/a outside"
               " Blender.*\n")
    dst = os.path.join(ROOT, "docs", "PLUGIN_REFERENCE.md")
    with open(dst, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dst}: {total} plugins,"
          f" {sum(1 for t in params if params[t])} with extracted params")


if __name__ == "__main__":
    main()
