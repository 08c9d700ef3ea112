"""Baseline JPEG decoder (pure Python + numpy, no external deps).

Covers the stb_image subset that matters for textures: baseline
sequential DCT (SOF0), 8-bit, grayscale or YCbCr 4:4:4 / 4:2:2 / 4:2:0,
restart markers.  Progressive (SOF2), arithmetic coding, and 12-bit
precision raise ValueError (callers fall back to magenta like a failed
stb load, hello_vulkan.cpp:323-331).

The entropy decode is a Python bit-reader (fine for texture-sized
images); dequant + IDCT + upsampling + color convert are vectorized
numpy over all blocks at once.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_jpeg"]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

# 8x8 type-III DCT basis, precomputed: idct2(B) = C.T @ B @ C
_k = np.arange(8)
_C = np.cos((2 * _k[:, None] + 1) * _k[None, :] * np.pi / 16) * 0.5
_C[:, 0] *= 1.0 / np.sqrt(2.0)


class _Huff:
    """Canonical Huffman table with a flat (code, length) -> value map."""

    def __init__(self, counts, symbols):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1          # byte-stuffing
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker()  # caller handles RSTn
            else:
                b = 0xFF               # treat as padding at stream end
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self):
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def align_restart(self):
        """Consume an RSTn marker and realign to a byte boundary."""
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2  # FF Dn


class _RestartMarker(Exception):
    pass


def _extend(v, n):
    """JPEG sign extension (ITU T.81 F.2.2.1)."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def read_jpeg(path: str) -> np.ndarray:
    """Decode a baseline JPEG -> (H, W, 3|1) uint8."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")

    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, p) \
                    .astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17: p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts,
                                                              symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), \
                seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], \
                    seg[8 + 3 * c]
                comps.append(dict(id=cid, hs=hv >> 4, vs=hv & 15, tq=tq))
            frame = dict(h=h, w=w, comps=comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 15)
            return _decode_scan(data, pos + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("no scan data")


def _upsample2(plane: np.ndarray, axis: int) -> np.ndarray:
    """2x centered triangle-filter upsample along one axis."""
    if axis == 1:
        return _upsample2(plane.T, 0).T
    prev = np.concatenate([plane[:1], plane[:-1]], axis=0)
    nxt = np.concatenate([plane[1:], plane[-1:]], axis=0)
    out = np.empty((plane.shape[0] * 2,) + plane.shape[1:], plane.dtype)
    out[0::2] = (3.0 * plane + prev) * 0.25
    out[1::2] = (3.0 * plane + nxt) * 0.25
    return out


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # coefficient storage per component (zigzag order, block-major)
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["pred"] = 0

    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            tdc, tac = scan[c["id"]]
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    blk = np.zeros(64, np.int32)
                    try:
                        s = br.decode(huff_dc[tdc])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = br.decode(huff_ac[tac])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            blk[k] = _extend(br.read_bits(s), s)
                            k += 1
                    except _RestartMarker:
                        raise ValueError("unexpected restart marker")
                    except IndexError:
                        pass  # truncated stream: keep what we decoded
                    row = (my * c["vs"] + by) * c["bw"] \
                        + (mx * c["hs"] + bx)
                    c["coef"][row] = blk

    # dequant + IDCT, vectorized over all blocks per component
    planes = []
    for c in comps:
        # DQT tables and entropy-coded coefficients are both in zigzag
        # order: dequantize first, then de-zigzag into natural order
        dq = c["coef"] * qt[c["tq"]][None]
        coef = np.zeros_like(dq)
        coef[:, ZIGZAG] = dq
        blocks = coef.astype(np.float32).reshape(-1, 8, 8)
        # f = C @ F @ C.T with C[x,u] = a(u) cos((2x+1) u pi / 16)
        pix = np.einsum("ik,nkl,jl->nij", _C, blocks, _C) + 128.0
        plane = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3) \
            .reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution with the centered triangle filter
        # (libjpeg/stb "fancy upsampling"): out[2i] = (3 c[i] + c[i-1])/4,
        # out[2i+1] = (3 c[i] + c[i+1])/4, edges clamped
        for axis, factor in ((0, vmax // c["vs"]), (1, hmax // c["hs"])):
            while factor > 1:
                plane = _upsample2(plane, axis)
                factor //= 2
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
