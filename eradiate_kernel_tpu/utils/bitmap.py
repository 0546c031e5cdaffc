"""Image IO — the Bitmap analog (reference: src/libcore/bitmap.cpp).

The reference links OpenEXR/libpng/libjpeg; this environment has no EXR
backend, so HDR output uses a self-contained OpenEXR codec (uncompressed
scanline float32 — readable by every EXR consumer; reading supports the
same subset, which covers files we wrote and most reference dumps once
decompressed). LDR paths go through PIL with sRGB gamma.
"""

from __future__ import annotations

import struct

import numpy as np

_EXR_MAGIC = 20000630
_PIXEL_FLOAT = 2  # OpenEXR FLOAT (f32)


def _attr(name: str, type_: str, payload: bytes) -> bytes:
    return (name.encode() + b"\x00" + type_.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload)


def write_exr(path: str, img, channel_names=None):
    """Write (H, W) or (H, W, C) float data as an uncompressed f32 EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    if channel_names is None:
        channel_names = {1: ["Y"], 2: ["R", "G"], 3: ["R", "G", "B"],
                         4: ["R", "G", "B", "A"]}.get(C) or \
            [f"ch{i}" for i in range(C)]
    assert len(channel_names) == C
    # EXR stores channels sorted alphabetically within each scanline
    order = sorted(range(C), key=lambda i: channel_names[i])

    chan_payload = b""
    for i in order:
        chan_payload += (channel_names[i].encode() + b"\x00"
                         + struct.pack("<iiii", _PIXEL_FLOAT, 0, 1, 1))
    chan_payload += b"\x00"

    header = b""
    header += _attr("channels", "chlist", chan_payload)
    header += _attr("compression", "compression", b"\x00")  # NO_COMPRESSION
    header += _attr("dataWindow", "box2i",
                    struct.pack("<iiii", 0, 0, W - 1, H - 1))
    header += _attr("displayWindow", "box2i",
                    struct.pack("<iiii", 0, 0, W - 1, H - 1))
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    head = struct.pack("<ii", _EXR_MAGIC, 2) + header
    line_size = 8 + W * C * 4
    offset0 = len(head) + 8 * H
    offsets = [offset0 + y * line_size for y in range(H)]

    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack("<" + "Q" * H, *offsets))
        for y in range(H):
            f.write(struct.pack("<ii", y, W * C * 4))
            for i in order:
                f.write(np.ascontiguousarray(img[y, :, i]).tobytes())


def read_exr(path: str):
    """Read an uncompressed f32/f16 scanline EXR -> (img (H, W, C), names)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _version = struct.unpack_from("<ii", data, 0)
    assert magic == _EXR_MAGIC, "not an EXR file"
    pos = 8
    channels = []
    compression = None
    dw = None

    def cstr():
        nonlocal pos
        end = data.index(b"\x00", pos)
        s = data[pos:end].decode()
        pos = end + 1
        return s

    while True:
        if data[pos] == 0:
            pos += 1
            break
        name = cstr()
        _type = cstr()
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        payload = data[pos:pos + size]
        pos += size
        if name == "channels":
            p = 0
            while payload[p] != 0:
                e = payload.index(b"\x00", p)
                cname = payload[p:e].decode()
                ptype = struct.unpack_from("<i", payload, e + 1)[0]
                channels.append((cname, ptype))
                p = e + 1 + 16
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            dw = struct.unpack("<iiii", payload)
    assert compression == 0, \
        f"only uncompressed EXRs supported (compression={compression})"
    x0, y0, x1, y1 = dw
    W = x1 - x0 + 1
    H = y1 - y0 + 1
    C = len(channels)
    offsets = struct.unpack_from("<" + "Q" * H, data, pos)
    img = np.zeros((H, W, C), np.float32)
    for yi, off in enumerate(offsets):
        y, _size = struct.unpack_from("<ii", data, off)
        p = off + 8
        for ci, (cname, ptype) in enumerate(channels):
            if ptype == _PIXEL_FLOAT:
                row = np.frombuffer(data, np.float32, W, p)
                p += 4 * W
            elif ptype == 1:  # HALF
                row = np.frombuffer(data, np.float16, W, p).astype(np.float32)
                p += 2 * W
            else:
                raise ValueError(f"unsupported pixel type {ptype}")
            img[y - y0, :, ci] = row
    names = [c[0] for c in channels]
    # reorder RGB(A) conventionally if present
    want = [n for n in ("R", "G", "B", "A") if n in names]
    if len(want) == C:
        idx = [names.index(n) for n in want]
        img = img[..., idx]
        names = want
    return img, names


def write_png(path: str, img, gamma=True):
    """LDR output with sRGB transfer (bitmap.cpp gamma conversion)."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    if gamma:
        a = np.clip(img, 0.0, 1.0)
        img = np.where(a <= 0.0031308, 12.92 * a,
                       1.055 * a ** (1 / 2.4) - 0.055)
    Image.fromarray((np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)) \
        .save(path)


def read_image(path: str):
    """Generic loader: EXR/PFM/PPM/HDR via the native codecs, everything
    else via PIL; returns linear float32 (H, W, C)."""
    low = path.lower()
    if low.endswith(".exr"):
        return read_exr(path)[0]
    if low.endswith(".pfm"):
        return read_pfm(path)
    if low.endswith(".ppm"):
        return read_ppm(path)
    if low.endswith((".hdr", ".rgbe")):
        return read_rgbe(path)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    # undo sRGB transfer
    return np.where(img <= 0.04045, img / 12.92,
                    ((img + 0.055) / 1.055) ** 2.4).astype(np.float32)


# -----------------------------------------------------------------------------
# PFM / PPM / RGBE — the reference's remaining HDR/portable formats
# (bitmap.cpp FileFormat::{PFM,PPM,RGBE})
# -----------------------------------------------------------------------------

def write_pfm(path: str, img):
    """Portable FloatMap: 'PF' (rgb) / 'Pf' (gray), little-endian, rows
    bottom-up (bitmap.cpp write_pfm)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if c == 1:
        header, data = b"Pf", img[..., 0]
    else:
        if c != 3:
            img = img[..., :3] if c > 3 else np.repeat(img, 3, -1)[..., :3]
        header, data = b"PF", img
    with open(path, "wb") as f:
        f.write(header + b"\n%d %d\n-1.0\n" % (w, h))
        f.write(np.ascontiguousarray(data[::-1]).tobytes())


def read_pfm(path: str):
    """Read PFM -> linear float32 (H, W, C)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic in (b"PF", b"Pf"), "not a PFM file"
        w, h = (int(x) for x in f.readline().split())
        scale = float(f.readline())
        c = 3 if magic == b"PF" else 1
        dt = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * c * 4), dt).reshape(h, w, c)
    return np.ascontiguousarray(data[::-1]).astype(np.float32)


def write_ppm(path: str, img, gamma=True):
    """Binary PPM (P6) with sRGB transfer (bitmap.cpp write_ppm)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    img = img[..., :3]
    if gamma:
        a = np.clip(img, 0.0, 1.0)
        img = np.where(a <= 0.0031308, 12.92 * a,
                       1.055 * a ** (1 / 2.4) - 0.055)
    u8 = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    h, w, _ = u8.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(u8.tobytes())


def read_ppm(path: str):
    """Read binary PPM (P6) -> linear float32 (H, W, 3)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6", "not a binary PPM"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = (int(x) for x in line.split())
        maxv = int(f.readline())
        data = np.frombuffer(f.read(w * h * 3), np.uint8).reshape(h, w, 3)
    img = data.astype(np.float32) / maxv
    return np.where(img <= 0.04045, img / 12.92,
                    ((img + 0.055) / 1.055) ** 2.4).astype(np.float32)


def write_rgbe(path: str, img):
    """Radiance .hdr (shared-exponent RGBE, uncompressed scanlines —
    bitmap.cpp FileFormat::RGBE / Ward's format)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    img = np.maximum(img[..., :3], 0.0)
    h, w, _ = img.shape
    maxc = img.max(-1)
    nz = maxc >= 1e-32
    _m, e = np.frexp(np.where(nz, maxc, 1.0))
    scale = np.where(nz, np.ldexp(1.0, -e) * 256.0, 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(b"-Y %d +X %d\n" % (h, w))
        f.write(rgbe.tobytes())


def read_rgbe(path: str):
    """Read an uncompressed Radiance .hdr -> linear float32 (H, W, 3)."""
    with open(path, "rb") as f:
        assert f.readline().startswith(b"#?"), "not a Radiance file"
        line = f.readline()
        while line.strip():
            line = f.readline()
        res = f.readline().split()
        assert res[0] == b"-Y" and res[2] == b"+X", "unsupported orientation"
        h, w = int(res[1]), int(res[3])
        data = np.frombuffer(f.read(h * w * 4), np.uint8)
        if data.size != h * w * 4:
            raise ValueError("RLE-compressed .hdr not supported")
        rgbe = data.reshape(h, w, 4)
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]) \
        .astype(np.float32)
