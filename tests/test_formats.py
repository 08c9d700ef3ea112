"""HDR/PSD/GIF/PIC decoders (io/formats.py) vs hand-rolled encoders and
Pillow (where Pillow can read the format).

The encoders below are written from the format specs, independently of
the decoders' code paths (RLE boundaries chosen to exercise runs,
literals, and the u16 long-run escape)."""
import struct

import numpy as np
import pytest

from voxelray_tpu.io.formats import read_gif, read_hdr, read_pic, read_psd
from voxelray_tpu.io.textures import load_texture, read_image

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# encoders (spec-driven, test-local)
# ---------------------------------------------------------------------------

def float_to_rgbe(rgb):
    """Classic Ward RGBE encoding (test-local)."""
    h, w, _ = rgb.shape
    maxc = np.max(rgb, axis=-1)
    e = np.where(maxc > 1e-32, np.ceil(np.log2(np.maximum(maxc, 1e-32))),
                 0.0)
    # mantissa must land in [0, 1): bump e where maxc is an exact power
    e = np.where(maxc * np.exp2(-e) >= 1.0, e + 1, e)
    e = np.where(maxc > 1e-32, e, -128)
    ok = maxc > 1e-32
    scale = np.where(ok, np.exp2(-np.where(ok, e, 0.0)) * 256.0, 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(ok, (e + 128).astype(np.int32), 0)
    return rgbe


def write_hdr(path, rgb, rle=True):
    """Radiance HDR from float RGB (new-style RLE or flat old-style)."""
    h, w, _ = rgb.shape
    rgbe = float_to_rgbe(rgb)
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {h} +X {w}\n".encode())
        if not rle or w < 8 or w >= 32768:
            fh.write(rgbe.tobytes())
            return
        for y in range(h):
            fh.write(bytes([2, 2, w >> 8, w & 255]))
            for c in range(4):
                line = rgbe[y, :, c]
                x = 0
                while x < w:
                    # find a run of >= 3 equal bytes, else emit literals
                    run = 1
                    while (x + run < w and run < 127
                           and line[x + run] == line[x]):
                        run += 1
                    if run >= 3:
                        fh.write(bytes([128 + run, int(line[x])]))
                        x += run
                    else:
                        lit = min(run + 2, w - x, 128)
                        fh.write(bytes([lit]) + line[x:x + lit].tobytes())
                        x += lit


def write_psd(path, img, compression=0):
    """PSD v1, RGB mode, 8-bit planar, raw or PackBits RLE."""
    h, w, ch = img.shape
    with open(path, "wb") as fh:
        fh.write(b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
                 + struct.pack(">HIIHH", ch, h, w, 8, 3))
        fh.write(struct.pack(">I", 0) * 3)
        fh.write(struct.pack(">H", compression))
        planes = img.transpose(2, 0, 1)
        if compression == 0:
            fh.write(planes.tobytes())
            return
        rows, counts = [], []
        for c in range(ch):
            for y in range(h):
                line = planes[c, y]
                enc = bytearray()
                x = 0
                while x < w:
                    run = 1
                    while (x + run < w and run < 127
                           and line[x + run] == line[x]):
                        run += 1
                    if run >= 2:
                        enc += bytes([257 - run, int(line[x])])
                        x += run
                    else:
                        lit = min(2, w - x)
                        # keep literals short to mix packet kinds
                        enc += bytes([lit - 1]) + line[x:x + lit].tobytes()
                        x += lit
                rows.append(bytes(enc))
                counts.append(len(enc))
        fh.write(np.asarray(counts, ">u2").tobytes())
        fh.write(b"".join(rows))


def write_gif(path, idx, palette, transparent=None, interlace=False):
    """Single-frame GIF89a with a global color table and LZW-encoded
    indices (always emits clear codes to keep the encoder trivial)."""
    h, w = idx.shape
    n = palette.shape[0]
    assert n in (2, 4, 8, 16, 32, 64, 128, 256)
    depth = max(2, int(np.log2(n)))
    min_code = depth
    clear, end = 1 << min_code, (1 << min_code) + 1

    if interlace:
        rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                               np.arange(2, h, 4), np.arange(1, h, 2)])
        stream_idx = idx[rows].reshape(-1)
    else:
        stream_idx = idx.reshape(-1)

    # plain LZW, resetting the table whenever it reaches 12 bits
    codes = [clear]
    table = {bytes([i]): i for i in range(1 << min_code)}
    nxt = end + 1
    cur = b""
    for v in stream_idx.tolist():
        cand = cur + bytes([v])
        if cand in table:
            cur = cand
        else:
            codes.append(table[cur])
            table[cand] = nxt
            nxt += 1
            cur = bytes([v])
            if nxt >= 4096:
                codes.append(clear)
                table = {bytes([i]): i for i in range(1 << min_code)}
                nxt = end + 1
    if cur:
        codes.append(table[cur])
    codes.append(end)
    # pack variable-width codes; the width schedule must mirror the
    # DECODER's table growth: the decoder adds one entry per code except
    # the first after a clear, and widens when its table length reaches
    # 1 << size
    out = bytearray()
    acc = nbits = 0
    size = min_code + 1
    dec_len = end + 1
    first = True
    for c in codes:
        acc |= c << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8
        if c == clear:
            size = min_code + 1
            dec_len = end + 1
            first = True
            continue
        if c == end:
            break
        if first:
            first = False
        else:
            dec_len += 1
        if dec_len >= (1 << size) and size < 12:
            size += 1
    if nbits:
        out.append(acc & 255)

    with open(path, "wb") as fh:
        fh.write(b"GIF89a" + struct.pack("<HHBBB", w, h,
                                         0x80 | (depth - 1), 0, 0))
        pal = np.zeros((1 << depth, 3), np.uint8)
        pal[:n] = palette
        fh.write(pal.tobytes())
        if transparent is not None:
            fh.write(b"\x21\xf9\x04\x01\x00\x00"
                     + bytes([transparent]) + b"\x00")
        fh.write(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                       0x40 if interlace else 0))
        fh.write(bytes([min_code]))
        for i in range(0, len(out), 255):
            blk = out[i:i + 255]
            fh.write(bytes([len(blk)]) + bytes(blk))
        fh.write(b"\x00\x3b")


def write_pic(path, img, rle=True):
    """Softimage PIC: one RGB packet (+ separate alpha packet if 4ch)."""
    h, w, ch = img.shape
    with open(path, "wb") as fh:
        fh.write(b"\x53\x80\xf6\x34" + struct.pack(">f", 3.71)
                 + b"c" * 80 + b"PICT")
        fh.write(struct.pack(">HHfHH", w, h, 1.0, 3, 0))
        ptype = 2 if rle else 0
        if ch == 4:
            fh.write(bytes([1, 8, ptype, 0xE0]))
            fh.write(bytes([0, 8, ptype, 0x10]))
            packs = [(0, 1, 2), (3,)]
        else:
            fh.write(bytes([0, 8, ptype, 0xE0]))
            packs = [(0, 1, 2)]
        for y in range(h):
            for chans in packs:
                line = img[y][:, chans]
                if not rle:
                    fh.write(line.tobytes())
                    continue
                x = 0
                while x < w:
                    run = 1
                    while (x + run < w
                           and (line[x + run] == line[x]).all()):
                        run += 1
                    if run >= 130:
                        run = min(run, 65535)
                        fh.write(bytes([128]) + struct.pack(">H", run)
                                 + line[x].tobytes())
                        x += run
                    elif run >= 2:
                        run = min(run, 128)
                        fh.write(bytes([127 + run]) + line[x].tobytes())
                        x += run
                    else:
                        lit = min(3, w - x)
                        fh.write(bytes([lit - 1])
                                 + line[x:x + lit].tobytes())
                        x += lit


# ---------------------------------------------------------------------------
# HDR
# ---------------------------------------------------------------------------

def _ldr_ref(rgb):
    """Expected LDR for what the encoder actually wrote: decode the
    quantized RGBE bytes (value = byte * 2^(e-136)) and apply stb's
    hdr-to-ldr (gamma 2.2, scale 1).  RGBE itself is lossy, so the
    comparison must start from the bytes, not the original floats."""
    rgbe = float_to_rgbe(np.asarray(rgb))
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.exp2(e - 136, dtype=np.float64), 0.0)
    lin = rgbe[..., :3].astype(np.float64) * scale[..., None]
    return np.clip(np.power(lin, 1 / 2.2) * 255.0 + 0.5,
                   0, 255).astype(np.uint8)


def test_hdr_rle_roundtrip(tmp_path):
    # blocks of constant color force RLE runs; noise forces literals
    rgb = np.empty((13, 48, 3), np.float32)
    rgb[:, :16] = [0.25, 2.0, 0.5]
    rgb[:, 16:32] = rng.uniform(0, 4, (13, 16, 3)).astype(np.float32)
    rgb[:, 32:] = 0.0
    p = tmp_path / "t.hdr"
    write_hdr(str(p), rgb)
    got = read_hdr(str(p))
    assert got.shape == (13, 48, 3)
    # f32-vs-f64 rounding at the gamma step can move one output level
    assert np.abs(got.astype(int) - _ldr_ref(rgb).astype(int)).max() <= 1


def test_hdr_flat_old_style(tmp_path):
    rgb = rng.uniform(0, 1, (4, 6, 3)).astype(np.float32)  # w<8 -> flat
    p = tmp_path / "flat.hdr"
    write_hdr(str(p), rgb)
    got = read_hdr(str(p))
    assert np.abs(got.astype(int) - _ldr_ref(rgb).astype(int)).max() <= 1


def test_hdr_old_style_run_marker(tmp_path):
    # hand-crafted stream: pixel then (1,1,1,n) "repeat previous n times"
    w = 12
    p = tmp_path / "old.hdr"
    with open(p, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y 1 +X {w}\n".encode())
        fh.write(bytes([128, 64, 32, 129]))        # one explicit pixel
        fh.write(bytes([1, 1, 1, w - 1]))          # repeat it w-1 times
    got = read_hdr(str(p))
    assert got.shape == (1, w, 3)
    assert (got == got[0, 0]).all()
    assert got[0, 0, 0] > got[0, 0, 1] > got[0, 0, 2] > 0


def test_hdr_through_read_image_and_load_texture(tmp_path):
    rgb = np.full((8, 8, 3), 0.5, np.float32)
    p = tmp_path / "t.hdr"
    write_hdr(str(p), rgb)
    assert read_image(str(p)).shape == (8, 8, 3)
    tex = load_texture(str(p))
    assert tex.shape == (8, 8, 3) and tex.dtype == np.float32


# ---------------------------------------------------------------------------
# PSD
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("compression", [0, 1])
@pytest.mark.parametrize("ch", [3, 4])
def test_psd_matches_pillow(tmp_path, compression, ch):
    img = rng.integers(0, 256, (9, 14, ch), dtype=np.uint8)
    img[:, :5] = 200                       # runs for the RLE encoder
    p = tmp_path / "t.psd"
    write_psd(str(p), img, compression=compression)
    got = read_psd(str(p))
    assert np.array_equal(got, img)
    PIL = pytest.importorskip("PIL.Image")
    ref = np.asarray(PIL.open(str(p)).convert("RGB"))
    assert np.array_equal(got[..., :3], ref)


def test_psd_16bit_raw_high_byte(tmp_path):
    img8 = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    img16 = ((img8.astype(np.uint16) << 8) | 0x12).astype(">u2")
    h, w, ch = img8.shape
    p = tmp_path / "t16.psd"
    with open(p, "wb") as fh:
        fh.write(b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
                 + struct.pack(">HIIHH", ch, h, w, 16, 3))
        fh.write(struct.pack(">I", 0) * 3 + struct.pack(">H", 0))
        fh.write(img16.transpose(2, 0, 1).tobytes())
    assert np.array_equal(read_psd(str(p)), img8)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def _gif_case(tmp_path, h, w, n_colors, **kw):
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    idx[: h // 2, : w // 2] = 1            # compressible region
    p = tmp_path / "t.gif"
    write_gif(str(p), idx, palette, **kw)
    return p, idx, palette


def test_gif_matches_pillow(tmp_path):
    p, idx, palette = _gif_case(tmp_path, 11, 23, 16)
    got = read_gif(str(p))
    assert np.array_equal(got[..., :3], palette[idx])
    assert (got[..., 3] == 255).all()
    PIL = pytest.importorskip("PIL.Image")
    ref = np.asarray(PIL.open(str(p)).convert("RGB"))
    assert np.array_equal(got[..., :3], ref)


def test_gif_table_growth_and_reset(tmp_path):
    # enough distinct pixels to push the LZW table through several code
    # widths (and a reset on a big image)
    p, idx, palette = _gif_case(tmp_path, 64, 67, 256)
    got = read_gif(str(p))
    assert np.array_equal(got[..., :3], palette[idx])


def test_gif_transparency_and_interlace(tmp_path):
    p, idx, palette = _gif_case(tmp_path, 16, 9, 8, transparent=3,
                                interlace=True)
    got = read_gif(str(p))
    assert np.array_equal(got[..., :3], palette[idx])
    assert np.array_equal(got[..., 3] == 0, idx == 3)
    PIL = pytest.importorskip("PIL.Image")
    ref = np.asarray(PIL.open(str(p)).convert("RGB"))
    assert np.array_equal(got[..., :3], ref)


# ---------------------------------------------------------------------------
# PIC
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("ch", [3, 4])
def test_pic_roundtrip(tmp_path, rle, ch):
    img = rng.integers(0, 256, (7, 150, ch), dtype=np.uint8)
    img[:, :10] = 7                        # short runs
    img[2, 5:140] = 9                      # long run -> u16 escape
    p = tmp_path / "t.pic"
    write_pic(str(p), img, rle=rle)
    got = read_pic(str(p))
    assert np.array_equal(got, img)


def test_dispatch_and_fallback(tmp_path):
    # sniffing sends each container to its decoder
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    p1 = tmp_path / "a.psd"
    write_psd(str(p1), img)
    assert np.array_equal(read_image(str(p1)), img)
    p2 = tmp_path / "b.pic"
    write_pic(str(p2), img)
    assert np.array_equal(read_image(str(p2)), img)
    # unsupported PIC packet type -> ValueError -> magenta via loader
    bad = tmp_path / "bad.pic"
    data = bytearray(open(p2, "rb").read())
    data[106] = 1                          # packet type byte -> pure RLE
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        read_pic(str(bad))
    tex = load_texture(str(bad))
    assert np.array_equal(tex, np.asarray([[[1.0, 0.0, 1.0]]], np.float32))


def test_mtl_textures_in_scene_stack(tmp_path):
    """GIF/HDR textures referenced from an MTL land in the scene's
    mip-atlas stack with sRGB->linear applied (the full load path a
    reference user's assets take)."""
    from voxelray_tpu.io.objload import ObjLoader
    from voxelray_tpu.models.scene import build_scene

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 0]], np.uint8)
    idx = np.tile(np.arange(4, dtype=np.uint8), (16, 4))
    write_gif(str(tmp_path / "t.gif"), idx, pal)
    write_hdr(str(tmp_path / "t.hdr"),
              np.full((8, 8, 3), 0.5, np.float32))
    (tmp_path / "s.mtl").write_text(
        "newmtl a\nKd 1 1 1\nmap_Kd t.gif\n"
        "newmtl b\nKd 1 1 1\nmap_Kd t.hdr\n")
    (tmp_path / "s.obj").write_text(
        "mtllib s.mtl\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl a\nf 1/1 2/2 3/3\nusemtl b\nf 1/1 3/3 4/4\n")
    model = ObjLoader().load_model(str(tmp_path / "s.obj"))
    scene = build_scene(models=[model])
    tex = np.asarray(scene.textures)
    assert tex.shape[0] >= 2
    meta = np.asarray(scene.tex_meta)
    # level-0 placement of texture 0 (GIF): 16x16, red at (0, 0)
    y0, x0, h, w = meta[0, 0]
    assert (h, w) == (16, 16)
    assert np.allclose(tex[0, y0, x0], [1.0, 0.0, 0.0], atol=1e-3)
    # texture 1 (HDR 0.5 gray): linearized (0.5^(1/2.2) quantized to u8
    # then ^2.2 back) ~= 0.5
    y1, x1, h1, w1 = meta[1, 0]
    assert (h1, w1) == (8, 8)
    assert np.allclose(tex[1, y1, x1], 0.5, atol=0.01)
