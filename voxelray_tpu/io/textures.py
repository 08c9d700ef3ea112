"""Texture I/O: PNG read/write without external deps + sampling defaults.

Replaces the reference's stb_image upload path (hello_vulkan.cpp:286-349):
  * missing texture list -> 1x1 white dummy (hello_vulkan.cpp:297-312)
  * failed load -> 1x1 magenta fallback (hello_vulkan.cpp:323-331)
  * sRGB -> linear conversion on load (the reference samples VK_FORMAT_
    R8G8B8A8_SRGB, so shaders see linear values)

PNG support covers 8-bit RGB/RGBA/gray, no interlacing — enough for test
assets; anything else falls back to magenta like a failed stb load.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["read_png", "write_png", "load_texture", "white_dummy",
           "magenta_fallback"]


def white_dummy() -> np.ndarray:
    return np.ones((1, 1, 3), np.float32)


def magenta_fallback() -> np.ndarray:
    return np.asarray([[[1.0, 0.0, 1.0]]], np.float32)


def write_png(path: str, image) -> None:
    """Write (H, W, 3|4) float [0,1] or uint8 as PNG."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fh.write(chunk(b"IEND", b""))


def _unfilter(data: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        ftype = data[pos]
        pos += 1
        row = data[pos: pos + stride].astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def read_png(path: str) -> np.ndarray:
    """-> (H, W, C) uint8.  Raises ValueError on unsupported files."""
    with open(path, "rb") as fh:
        sig = fh.read(8)
        if sig != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG")
        idat = b""
        meta = None
        while True:
            head = fh.read(8)
            if len(head) < 8:
                break
            ln, tag = struct.unpack(">I4s", head)
            data = fh.read(ln)
            fh.read(4)  # crc
            if tag == b"IHDR":
                meta = struct.unpack(">IIBBBBB", data)
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
    if meta is None:
        raise ValueError("no IHDR")
    w, h, depth, ctype, comp, filt, interlace = meta
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise ValueError(f"unsupported PNG (depth={depth} type={ctype})")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    return _unfilter(raw, h, w, ch)


def load_texture(path: str, srgb_to_linear: bool = True) -> np.ndarray:
    """(H, W, 3) float32 linear; magenta fallback on any failure."""
    try:
        img = read_png(path)
    except Exception:
        return magenta_fallback()
    rgb = img[..., :3].astype(np.float32) / 255.0
    if rgb.shape[-1] == 1:
        rgb = rgb.repeat(3, axis=-1)
    if srgb_to_linear:
        rgb = np.power(rgb, np.float32(2.2))
    return rgb
