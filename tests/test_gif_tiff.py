"""GIF and uncompressed-TIFF baseline decoders
(functions/multimodal._decode_gif / _decode_tiff).

Same two-gate pattern as the PNG/JPEG suites: a HAND-DERIVED GIF whose
LZW codes and bit packing are worked out on paper in the test (decoder
gate with no encoder code in the loop), plus in-test spec writers — a
real variable-width LZW encoder for GIF and an IFD writer for TIFF in
both byte orders — for exact round-trips over palettes, interlace,
extensions, multi-strip layouts, and the documented rejections."""

import struct

import numpy as np
import pytest

from textindexing_spark.functions import multimodal as mm


# --- in-test GIF writer ------------------------------------------------------

def _gif_lzw_encode(indices, min_code):
    """Standard GIF LZW: emits a leading clear code, clears at table
    overflow. Code width is driven by a MIRROR of the decoder's own
    bookkeeping (the decoder adds a table entry after every data code
    past the first and bumps width when its next_code hits the range),
    so encoder and decoder can never disagree on a code's width — the
    naive 'bump after my own add' rule desyncs on EOI when the
    decoder's add after the FINAL data code crosses a width boundary
    (found by hypothesis)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out, acc, nacc = bytearray(), 0, 0
    width = min_code + 1

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def reset():
        nonlocal width
        width = min_code + 1
        return {bytes([i]): i for i in range(clear)}, eoi + 1, eoi + 1, 0

    def emit_data(code):
        # decoder-mirrored width update: it adds an entry after every
        # data code except the first-after-clear, freezing at 4096
        nonlocal dec_next, n_data, width
        emit(code)
        n_data += 1
        if n_data >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    emit(clear)
    table, next_code, dec_next, n_data = reset()
    s = b""
    for v in bytes(indices):
        sc = s + bytes([v])
        if sc in table:
            s = sc
            continue
        emit_data(table[s])
        table[sc] = next_code
        next_code += 1
        if next_code == 4096:
            emit(clear)
            table, next_code, dec_next, n_data = reset()
        s = bytes([v])
    if s:
        emit_data(table[s])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(idx, palette, interlace=False, local_palette=False,
               extensions=b"", version=b"GIF89a", extra_frames=()):
    h, w = idx.shape
    f = max(0, (palette.shape[0] - 1).bit_length() - 1)  # 2^(f+1) slots
    ncol = 2 << f
    pal = np.zeros((ncol, 3), np.uint8)
    pal[:palette.shape[0]] = palette
    min_code = max(2, f + 1)

    def frame(fidx):
        fh, fw = fidx.shape
        rows = fidx
        if interlace:
            order = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8),
                 np.arange(2, fh, 4), np.arange(1, fh, 2)])
            rows = fidx[order]
        packed = (0x40 if interlace else 0) | ((0x80 | f)
                                               if local_palette else 0)
        out = b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh) \
            + bytes([packed])
        if local_palette:
            out += pal.tobytes()
        data = _gif_lzw_encode(rows.reshape(-1), min_code)
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        return out + b"\x00"

    screen = struct.pack("<HH", w, h) \
        + bytes([0x80 | f if not local_palette else f, 0, 0])
    body = version + screen
    if not local_palette:
        body += pal.tobytes()
    body += extensions + frame(idx)
    for extra in extra_frames:
        body += frame(extra)
    return body + b"\x3b"


# --- in-test TIFF writer -----------------------------------------------------

def _tiff_bytes(img, bo="<", rows_per_strip=None, photometric=None):
    """Uncompressed chunky TIFF, gray (2-D) or RGB(A), one IFD; strips
    written before the IFD, multi-value tags spilled past 4 bytes."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    rps = rows_per_strip or h
    raw = img.tobytes()
    row_bytes = w * spp
    strips = [raw[y * row_bytes:(y + min(rps, h - y)) * row_bytes]
              for y in range(0, h, rps)]
    header_end = 8
    offsets, counts, pos = [], [], header_end
    for s in strips:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    extra = bytearray()  # values that do not fit inline, placed after IFD

    tags = [(256, 3, [w]), (257, 3, [h]), (258, 3, [8] * spp),
            (259, 3, [1]),
            (262, 3, [photometric if photometric is not None
                      else (1 if gray else 2)]),
            (273, 4, offsets), (277, 3, [spp]), (278, 3, [rps]),
            (279, 4, counts), (284, 3, [1])]
    ifd_off = pos
    ifd_size = 2 + 12 * len(tags) + 4
    extra_base = ifd_off + ifd_size
    entries = b""
    for tag, typ, vals in tags:
        fmt, sz = ("H", 2) if typ == 3 else ("I", 4)
        packed = struct.pack(f"{bo}{len(vals)}{fmt}", *vals)
        if len(packed) <= 4:
            val = packed + b"\x00" * (4 - len(packed))
        else:
            val = struct.pack(bo + "I", extra_base + len(extra))
            extra += packed
        entries += struct.pack(bo + "HHI", tag, typ, len(vals)) + val
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = magic + struct.pack(bo + "I", ifd_off)
    out += b"".join(strips)
    out += struct.pack(bo + "H", len(tags)) + entries \
        + struct.pack(bo + "I", 0) + bytes(extra)
    return out


# --- GIF tests ---------------------------------------------------------------

def test_gif_hand_fixture():
    """Fully hand-derived 2x2 GIF — decoder gate with NO encoder code.
    Palette (10,20,30)/(200,100,50); pixels [1,0 / 0,1]; min code 2 so
    clear=4, EOI=5, codes start 3 bits wide. Emitting clear,1,0,0 at 3
    bits grows the table to code 8 (width bumps to 4), then 1 and EOI
    at 4 bits. LSB-first packing of the code stream 4,1,0,0 (3 bits
    each) then 1,5 (4 bits each) gives bytes 0C 10 05."""
    payload = (b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
               + bytes([10, 20, 30, 200, 100, 50])
               + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
               + bytes([2]) + bytes([3, 0x0C, 0x10, 0x05]) + b"\x00"
               + b"\x3b")
    img = mm.decode_rgb(payload)
    exp = np.array([[[200, 100, 50], [10, 20, 30]],
                    [[10, 20, 30], [200, 100, 50]]], np.uint8)
    assert np.array_equal(img, exp)


def test_gif_roundtrip_exact():
    """GIF is lossless: random palette images round-trip byte-exactly,
    across palette sizes that exercise 1- through 8-bit color tables
    and LZW width growth."""
    rng = np.random.default_rng(12)
    for ncol, shape in ((2, (9, 7)), (16, (23, 31)), (256, (40, 40))):
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=shape, dtype=np.uint8)
        got = mm.decode_rgb(_gif_bytes(idx, pal))
        assert np.array_equal(got, pal[idx]), (ncol, shape)


def test_gif_interlace_local_palette_extensions():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(17, 11), dtype=np.uint8)
    # graphic-control + comment extensions must be skipped
    ext = (b"\x21\xf9\x04\x00\x00\x00\x00\x00"
           + b"\x21\xfe\x05hello\x00")
    for interlace in (False, True):
        for local in (False, True):
            got = mm.decode_rgb(_gif_bytes(
                idx, pal, interlace=interlace, local_palette=local,
                extensions=ext))
            assert np.array_equal(got, pal[idx]), (interlace, local)
    # GIF87a works too
    got = mm.decode_rgb(_gif_bytes(idx, pal, version=b"GIF87a"))
    assert np.array_equal(got, pal[idx])


def test_gif_animated_first_frame_and_errors():
    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    first = rng.integers(0, 4, size=(6, 6), dtype=np.uint8)
    second = rng.integers(0, 4, size=(6, 6), dtype=np.uint8)
    got = mm.decode_rgb(_gif_bytes(first, pal, extra_frames=(second,)))
    assert np.array_equal(got, pal[first])
    # no image descriptor -> P7 degrade through decode_rgb
    empty = b"GIF89a" + struct.pack("<HH", 1, 1) + bytes([0, 0, 0]) \
        + b"\x3b"
    with pytest.raises(NotImplementedError, match="no image"):
        mm.decode_rgb(empty)
    # truncated LZW stream degrades too
    full = _gif_bytes(first, pal)
    with pytest.raises(NotImplementedError, match="corrupt"):
        mm.decode_rgb(full[:len(full) - 6] + b"\x00\x3b")


# --- TIFF tests --------------------------------------------------------------

def test_tiff_roundtrip_both_byte_orders():
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for bo in ("<", ">"):
        assert np.array_equal(mm.decode_rgb(_tiff_bytes(img, bo=bo)),
                              img), bo


def test_tiff_gray_rgba_strips_whitiszero():
    rng = np.random.default_rng(16)
    gray = rng.integers(0, 256, size=(11, 17), dtype=np.uint8)
    got = mm.decode_rgb(_tiff_bytes(gray))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # WhiteIsZero inverts
    got = mm.decode_rgb(_tiff_bytes(gray, photometric=0))
    assert np.array_equal(got,
                          np.repeat((255 - gray)[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    assert np.array_equal(mm.decode_rgb(_tiff_bytes(rgba)),
                          rgba[:, :, :3])
    # multi-strip layout concatenates correctly
    img = rng.integers(0, 256, size=(21, 6, 3), dtype=np.uint8)
    assert np.array_equal(
        mm.decode_rgb(_tiff_bytes(img, rows_per_strip=4)), img)


def test_tiff_out_of_baseline():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(_tiff_bytes(img))
    # flip the compression SHORT (tag 259) to 5 (LZW): named rejection
    ifd_off = struct.unpack_from("<I", payload, 4)[0]
    n = struct.unpack_from("<H", payload, ifd_off)[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", payload, off)[0] == 259:
            struct.pack_into("<H", payload, off + 8, 5)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        mm.decode_rgb(bytes(payload))


def test_gif_tiff_through_spark_operators(spark):
    """Real GIF/TIFF payloads through the Spark plumbing: image_features
    equals the numpy expectation (same contract as BMP/PNG/JPEG)."""
    rng = np.random.default_rng(18)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(10, 8), dtype=np.uint8)
    tiff_img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(_gif_bytes(idx, pal)), None),
         (2, "image", bytearray(_tiff_bytes(tiff_img)), None)],
        mm.MEDIA_SCHEMA)
    feats = {r["doc_id"]: r["feature"]
             for r in mm.image_features(media).collect()}
    assert np.allclose(feats[1][:3],
                       pal[idx].astype(np.float64).mean(axis=(0, 1)),
                       atol=1e-4)
    assert np.allclose(feats[2][:3],
                       tiff_img.astype(np.float64).mean(axis=(0, 1)),
                       atol=1e-4)


# --- real-container video frames (sample_frames seam) ------------------------

def _avi_bytes(frame_chunks, fourcc=b"00dc"):
    """Minimal RIFF/AVI: stub hdrl LIST + movi LIST holding one chunk
    per frame (odd-sized chunks pad to even offsets per RIFF)."""
    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype, body):
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    hdrl = lst(b"hdrl", chunk(b"avih", b"\x00" * 56))
    movi = lst(b"movi", b"".join(chunk(fourcc, f)
                                 for f in frame_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frame_extraction():
    from tests.test_jpeg import _jpeg_bytes

    rng = np.random.default_rng(19)
    frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
              for _ in range(5)]
    jpegs = [_jpeg_bytes(f) for f in frames]
    got = mm._avi_frames(_avi_bytes(jpegs))
    assert got == jpegs  # byte-identical slicing, no transcode
    for j, f in zip(got, frames):
        dec = mm.decode_rgb(j)
        assert np.abs(dec[..., 0].astype(int) - f.astype(int)).max() <= 2
    # a non-MJPEG frame codec names the limitation
    with pytest.raises(NotImplementedError, match="MJPEG"):
        mm._avi_frames(_avi_bytes([b"\x00\x01\x02\x03"]))
    # not an AVI -> None (the seam's "not mine" contract)
    assert mm._avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_sample_frames_real_containers(spark):
    """sample_frames over REAL video bytes: MJPEG-AVI chunks pass
    through as standalone JPEGs, animated-GIF frames re-encode as BMP —
    both decodable by the same decode_rgb seam downstream."""
    from tests.test_jpeg import _jpeg_bytes

    rng = np.random.default_rng(20)
    gray_frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
                   for _ in range(5)]
    avi = _avi_bytes([_jpeg_bytes(f) for f in gray_frames])
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    gif_frames = [rng.integers(0, 4, size=(6, 6), dtype=np.uint8)
                  for _ in range(3)]
    gif = _gif_bytes(gif_frames[0], pal,
                     extra_frames=tuple(gif_frames[1:]))
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi), None),
         (2, "video", bytearray(gif), None),
         (3, "video", bytearray(b"garbage bytes"), None)],
        mm.MEDIA_SCHEMA)
    rows = mm.sample_frames(media, every=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # AVI: frames 0, 2, 4 kept; payloads are the original JPEG bytes
    avi_rows = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in avi_rows] == [0, 2, 4]
    for r, fi in zip(avi_rows, (0, 2, 4)):
        dec = mm.decode_rgb(bytes(r["payload"]))
        exp = gray_frames[fi]
        assert np.abs(dec[..., 0].astype(int)
                      - exp.astype(int)).max() <= 2
    # GIF: frames 0, 2 kept; BMP payloads decode EXACTLY
    gif_rows = sorted(by_doc[2], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in gif_rows] == [0, 2]
    for r, fi in zip(gif_rows, (0, 2)):
        assert np.array_equal(mm.decode_rgb(bytes(r["payload"])),
                              pal[gif_frames[fi]])
    # undecodable payloads are skipped, not crashed (P7)
    assert 3 not in by_doc


def test_avi_headerless_dib_frames_via_strf():
    """Real uncompressed AVIs carry HEADERLESS DIB bits in their
    '##db' chunks — the pixel format lives in the stream's strf
    BITMAPINFOHEADER. The walk must wrap each chunk with a
    BITMAPFILEHEADER + that strf so decode_rgb reads it, and must take
    only the vids stream's chunks (here stream 01; a decoy '00db'
    chunk belongs to the non-video stream 00 and is dropped)."""
    rng = np.random.default_rng(31)
    imgs = [rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
            for _ in range(3)]

    def dib_bits(img):  # bottom-up BGR rows, 4-byte padded — raw bits
        h, w = img.shape[:2]
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype, body):
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    strf = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 24, 0,
                       len(dib_bits(imgs[0])), 2835, 2835, 0, 0)
    strl_audio = lst(b"strl", chunk(b"strh", b"auds" + b"\x00" * 52)
                     + chunk(b"strf", b"\x01\x00" + b"\x00" * 14))
    strl_video = lst(b"strl", chunk(b"strh", b"vids" + b"\x00" * 52)
                     + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", b"\x00" * 56)
               + strl_audio + strl_video)
    movi = lst(b"movi", chunk(b"00db", b"\x07\x07\x07\x07")  # decoy
               + b"".join(chunk(b"01db", dib_bits(i)) for i in imgs))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    frames = mm._avi_frames(avi)
    assert len(frames) == 3  # the stream-00 decoy chunk is dropped
    for f, img in zip(frames, imgs):
        assert np.array_equal(mm.decode_rgb(f), img)
