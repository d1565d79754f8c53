"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The engine
treats media exactly like the reference treats document content — an opaque
payload behind a source abstraction (reference: IDocumentSource.ReadDocumentText,
Documents/Sources/IDocumentSource.cs:47, opened lazily per doc) — but
columnar: an Iceberg/parquet table

    media(doc_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, n_frames INT,
                      sample_rate INT, codec STRING>)

All Spark-side plumbing here is REAL and tested: schemas, Arrow batch
shapes, mapInPandas signatures, partitioning. The pixel/sample DECODING is
stubbed (this container ships no image/audio libs) behind a deterministic
fake — ``payload`` carries a self-describing header written by
``synthesize_media`` and each "decoder" parses it; swapping in Pillow/
ffmpeg is a one-function change (`decode_rgb` / `decode_pcm`), the
dataflow does not move.

Design for scale: payloads never pass through a shuffle — every operator
is a narrow mapInPandas/pandas_udf over the scan, so Tungsten only ever
moves the (small) feature/metadata outputs. Feature extraction yields
fixed-width ARRAY<FLOAT> columns ready for the ANN operators
(operators/similarity.py).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

_MAGIC = b"TIXM"  # deterministic fake container format
_HDR = struct.Struct("<4s4sIIII")  # magic, codec, w, h, n_frames, rate


# --- deterministic fake container (stands in for JPEG/WAV/MP4) --------------

def pack_media(codec: str, width: int, height: int, n_frames: int,
               sample_rate: int, body: bytes) -> bytes:
    """Write the fake container: header + raw body bytes."""
    return _HDR.pack(_MAGIC, codec.encode()[:4].ljust(4), width, height,
                     n_frames, sample_rate) + body


def unpack_header(payload: bytes) -> dict | None:
    """Parse the container header; None for foreign/corrupt payloads."""
    if payload is None or len(payload) < _HDR.size:
        return None
    magic, codec, w, h, nf, sr = _HDR.unpack_from(payload)
    if magic != _MAGIC:
        return None
    return {"codec": codec.rstrip(b"\0 ").decode(), "width": w, "height": h,
            "n_frames": nf, "sample_rate": sr,
            "body": payload[_HDR.size:]}


def _decode_bmp(payload: bytes) -> "np.ndarray | None":
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) -> (h, w, 3)
    uint8 RGB, pure Python/numpy — the real-bytes baseline decoder, no
    image lib required. None = not a BMP; NotImplementedError = BMP in
    a variant this baseline doesn't parse (compressed, non-24-bit)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP baseline decodes uncompressed 24-bit only "
            f"(got bpp={bpp}, compression={compression})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    body = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=data_off)
    rows = body.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


def _decode_ppm(payload: bytes) -> "np.ndarray | None":
    """Binary PPM (P6, maxval<=255) -> (h, w, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        return None
    # header = three whitespace-separated ints after the magic, with
    # '#' comment lines allowed between tokens
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("PPM baseline decodes maxval<=255 only")
    pos += 1  # exactly one whitespace byte after maxval
    return (np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                          offset=pos)
            .reshape(h, w, 3).copy())


def _decode_png(payload: bytes) -> "np.ndarray | None":
    """PNG -> (h, w, 3) uint8 RGB in pure Python/numpy: chunk walk,
    stdlib-zlib inflate, per-scanline unfilter (spec filters 0-4; Sub is
    a lane cumsum, Up is vectorized, Average/Paeth run the spec's
    left-to-right recurrence vectorized across channels). Covers the
    dominant web shape — 8-bit, non-interlaced, gray/RGB(A); alpha
    drops, gray broadcasts. None = not a PNG; NotImplementedError = PNG
    outside the baseline (16-bit, palette, interlaced)."""
    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    import zlib

    pos, width, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # chunk header + body + CRC
        if tag == b"IHDR":
            (width, height, depth, ctype,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    if depth != 8 or ctype not in (0, 2, 4, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG baseline decodes 8-bit non-interlaced gray/RGB(A) "
            f"only (depth={depth}, color_type={ctype}, "
            f"interlace={interlace})")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise NotImplementedError("PNG scanline length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].reshape(height, width, ch).astype(np.int32)
    out = np.empty((height, width, ch), dtype=np.int32)
    prev = np.zeros((width, ch), dtype=np.int32)
    for y in range(height):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: rec[x] = (row[x] + rec[x-1]) mod 256
            rec = np.cumsum(row, axis=0) & 0xFF
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average
            rec = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(width):
                left = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
                rec[x] = left
        elif f == 4:  # Paeth
            rec = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(width):
                up = prev[x]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, upleft))
                left = (row[x] + pred) & 0xFF
                rec[x] = left
                upleft = up
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = prev = rec
    px = out.astype(np.uint8)
    if ctype == 2:
        return px
    if ctype == 6:
        return px[:, :, :3]
    return np.repeat(px[:, :, :1], 3, axis=2)  # gray / gray+alpha


def _decode_wav(payload: bytes) -> "np.ndarray | None":
    """RIFF/WAVE 16-bit PCM -> int16 samples (channel-interleaved flat
    array, matching the soundfile path's reshape(-1))."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from(
            "<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format, _ch, _rate, _bps, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV baseline decodes 16-bit PCM only (format="
            f"{audio_format}, bits={bits})")
    return np.frombuffer(data[:len(data) & ~1], dtype="<i2").copy()


def decode_rgb(payload: bytes) -> "np.ndarray":
    """Image decode -> (h, w, 3) uint8.

    TIXM payloads (the deterministic in-container fake: body bytes tile
    the pixel grid) decode natively, as do REAL uncompressed baseline
    formats — 24-bit BMP, binary PPM, and 8-bit non-interlaced PNG
    (stdlib-zlib inflate + scanline unfilter) — via the pure-Python
    parsers above (no image lib needed). Other foreign payloads (JPEG,
    exotic PNG shapes) decode through Pillow WHEN it is importable —
    the seam is this one function; every operator above it is
    unchanged. In this container no image lib ships, so those raise
    NotImplementedError naming the boundary (the documented contract:
    feed TIXM/BMP/PPM/PNG or install Pillow)."""
    if payload is None:  # before the lib gate: a null payload is a null
        raise NotImplementedError("empty payload")  # payload, not a
    hdr = unpack_header(payload)                    # missing dependency
    if hdr is not None and hdr["codec"] in ("rgb8", "jpg", "png"):
        w, h = hdr["width"], hdr["height"]
        body = np.frombuffer(hdr["body"], dtype=np.uint8)
        need = w * h * 3
        reps = int(np.ceil(need / max(body.size, 1)))
        return np.tile(body, reps)[:need].reshape(h, w, 3)
    for baseline in (_decode_bmp, _decode_ppm, _decode_png):
        try:
            img = baseline(payload)
        except NotImplementedError:
            raise
        except Exception as e:  # truncated/corrupt: P7 degrade, not crash
            raise NotImplementedError(
                f"corrupt baseline image payload: {e}") from None
        if img is not None:
            return img
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "real image decoding needs an image lib (Pillow, not in this "
            "container); the deterministic TIXM fake is the only "
            "in-container codec") from None
    try:
        img = Image.open(io.BytesIO(payload)).convert("RGB")
    except Exception as e:  # corrupt/unsupported: quarantine upstream
        raise NotImplementedError(f"undecodable payload: {e}") from None
    return np.asarray(img, dtype=np.uint8)


def decode_pcm(payload: bytes) -> "np.ndarray":
    """Audio decode -> int16 PCM samples. TIXM payloads decode natively,
    as do REAL RIFF/WAVE 16-bit PCM bytes via the pure-Python parser
    (no audio lib needed); other foreign payloads (FLAC/OGG) go through
    soundfile when importable — same seam contract as decode_rgb."""
    if payload is None:  # see decode_rgb: null payload != missing lib
        raise NotImplementedError("empty payload")
    hdr = unpack_header(payload)
    if hdr is not None and hdr["codec"] in ("pcm", "wav", "flac"):
        return np.frombuffer(hdr["body"], dtype="<i2")
    try:
        pcm = _decode_wav(payload)
    except NotImplementedError:
        raise
    except Exception as e:  # truncated/corrupt: P7 degrade, not crash
        raise NotImplementedError(
            f"corrupt baseline audio payload: {e}") from None
    if pcm is not None:
        return pcm
    try:
        import io

        import soundfile as sf
    except ImportError:
        raise NotImplementedError(
            "real audio decoding needs an audio lib (soundfile, not in "
            "this container); the deterministic TIXM fake is the only "
            "in-container codec") from None
    try:
        data, _sr = sf.read(io.BytesIO(payload), dtype="int16")
    except Exception as e:
        raise NotImplementedError(f"undecodable payload: {e}") from None
    return np.asarray(data, dtype="<i2").reshape(-1)


# --- synthesis (deterministic; no external data) ----------------------------

def synthesize_media(docs: DataFrame, kind: str = "image",
                     id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from any id-bearing table —
    payload bytes are a seeded function of doc_id only."""
    kinds = {"image": ("rgb8", 1), "audio": ("pcm", 0),
             "video": ("rgb8", 8)}
    if kind not in kinds:
        raise ValueError(f"kind must be one of {sorted(kinds)}")
    codec, frames = kinds[kind]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "kind": [], "payload": [], "meta": []}
            for doc_id in pdf["_id"].to_numpy():
                if kind == "audio":
                    sr, w, h, nf = 16000, 0, 0, 0
                    # linear fn of (doc_id, i): deterministic and
                    # SQL-expressible like the image body
                    body = ((((int(doc_id) * 13 + np.arange(1600) * 11)
                              % 6001) - 3000)
                            .astype("<i2").tobytes())
                else:
                    sr = 0
                    w, h = 8 + int(doc_id) % 24, 8 + int(doc_id) % 16
                    nf = frames
                    # body bytes are a LINEAR function of (doc_id, i) —
                    # deterministic AND SQL-expressible, so decode-derived
                    # features have an exact DuckDB oracle
                    body = (((int(doc_id) * 31 + np.arange(256) * 7) % 256)
                            .astype(np.uint8).tobytes())
                out["doc_id"].append(int(doc_id))
                out["kind"].append(kind)
                out["payload"].append(pack_media(codec, w, h, nf, sr, body))
                out["meta"].append({"width": w, "height": h, "n_frames": nf,
                                    "sample_rate": sr, "codec": codec})
            yield pd.DataFrame(out)

    return (docs.select(F.col(id_col).cast("long").alias("_id"))
            .mapInPandas(gen, MEDIA_SCHEMA))


# --- operators (the real Spark-side plumbing) -------------------------------

def media_metadata(media: DataFrame) -> DataFrame:
    """Validate payload headers against the typed meta column; quarantine
    mismatches (≙ P7 per-doc failure isolation). Pure narrow map."""
    def check(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "ok": [], "width": [],
                    "height": [], "n_bytes": []}
            for doc_id, kind, payload, meta in zip(
                    pdf["doc_id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                hdr = unpack_header(bytes(payload) if payload is not None
                                    else None)
                rows["doc_id"].append(doc_id)
                rows["kind"].append(kind)
                rows["ok"].append(hdr is not None
                                  and hdr["width"] == meta["width"]
                                  and hdr["height"] == meta["height"])
                rows["width"].append(hdr["width"] if hdr else -1)
                rows["height"].append(hdr["height"] if hdr else -1)
                rows["n_bytes"].append(len(payload)
                                       if payload is not None else 0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        check, "doc_id long, kind string, ok boolean, width int, "
               "height int, n_bytes long")


IMAGE_FEATURE_DIM = 12


def image_features(media: DataFrame) -> DataFrame:
    """(doc_id, feature ARRAY<FLOAT>) — decode + fixed-width feature
    vector (channel means/stds + 2x2 spatial means over the fake decode).
    The batch shape/UDF signature is exactly what a CLIP-style extractor
    uses; only ``decode_rgb`` is a stub."""
    def feat(batches):
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    # accumulate in float64 (float32 partial sums drift
                    # ~1e-2 over a few hundred pixels); the emitted
                    # vector is float32, standard embedding width
                    img = decode_rgb(bytes(payload)).astype(np.float64)
                except NotImplementedError:
                    continue  # quarantine path: undecodable -> dropped
                h, w, _ = img.shape
                halves_h, halves_w = max(h // 2, 1), max(w // 2, 1)
                quads = [img[:halves_h, :halves_w], img[:halves_h, halves_w:],
                         img[halves_h:, :halves_w], img[halves_h:, halves_w:]]
                v = np.concatenate([
                    img.mean(axis=(0, 1)), img.std(axis=(0, 1)),
                    np.array([q.mean() if q.size else 0.0 for q in quads]),
                    np.array([float(w), float(h)]),
                ]).astype(np.float32)
                ids.append(doc_id)
                feats.append(v.tolist())
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    return media.mapInPandas(feat, "doc_id long, feature array<float>")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode every image payload at (width, height) — nearest-neighbor
    over the fake decode; Pillow's resize slots in here unchanged."""
    def rs(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_rgb(bytes(payload))
                except NotImplementedError:
                    continue
                ys = (np.arange(height) * img.shape[0] // height)
                xs = (np.arange(width) * img.shape[1] // width)
                small = img[ys][:, xs]
                out["doc_id"].append(doc_id)
                out["payload"].append(pack_media(
                    "rgb8", width, height, 0, 0, small.tobytes()))
            yield pd.DataFrame(out)

    return media.mapInPandas(rs, "doc_id long, payload binary")


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame index —
    (doc_id, frame_idx, payload). Frame bytes are sliced from the fake
    container; ffmpeg seek-decode slots in here."""
    def fs(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hdr = unpack_header(bytes(payload))
                if hdr is None or hdr["n_frames"] <= 0:
                    continue
                for fi in range(0, hdr["n_frames"], every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["payload"].append(pack_media(
                        hdr["codec"], hdr["width"], hdr["height"], 1, 0,
                        hdr["body"]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fs, "doc_id long, frame_idx int, payload binary")


def audio_stats(media: DataFrame) -> DataFrame:
    """(doc_id, n_samples, rms, peak) over the decoded PCM — the audio
    analogue of quality_score."""
    def st(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "n_samples": [], "rms": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    pcm = decode_pcm(bytes(payload)).astype(np.float64)
                except NotImplementedError:
                    continue
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(pcm.size)
                rows["rms"].append(
                    float(np.sqrt((pcm ** 2).mean())) if pcm.size else 0.0)
                rows["peak"].append(
                    float(np.abs(pcm).max()) if pcm.size else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        st, "doc_id long, n_samples long, rms double, peak double")
