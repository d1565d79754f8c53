"""Property tests for the pure-Python media baseline decoders
(hypothesis) — the reference's equivalence-heavy test strategy
(SURVEY.md §5) applied to the codec seam. Lossless formats (BMP, PPM,
PNG, GIF, TIFF) must round-trip EXACTLY for arbitrary images; JPEG
must be exact on flat images (DC-only streams with unit quant tables
lose nothing) and within coefficient-rounding bounds on arbitrary
ones; WAV width normalization must preserve the top 16 bits. Pure
numpy, no Spark session: fast enough for randomized exploration."""

import numpy as np
from hypothesis import given, settings, strategies as st

from textindexing_spark.functions import multimodal as mm
from tests.test_gif_tiff import _gif_bytes, _tiff_bytes
from tests.test_jpeg import _jpeg_bytes
from tests.test_multimodal import _bmp_bytes, _png_bytes, _wav_bytes_fmt

_dims = st.tuples(st.integers(min_value=1, max_value=24),
                  st.integers(min_value=1, max_value=24))


def _image(draw, dims, channels=3):
    h, w = dims
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@st.composite
def _rgb_images(draw):
    return _image(draw, draw(_dims))


@st.composite
def _palette_images(draw):
    ncol = draw(st.sampled_from([2, 3, 4, 7, 16, 64, 256]))
    h, w = draw(_dims)
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    return idx, pal


@settings(max_examples=40, deadline=None)
@given(img=_rgb_images())
def test_bmp_ppm_tiff_roundtrip_exact(img):
    assert np.array_equal(mm.decode_rgb(_bmp_bytes(img)), img)
    h, w = img.shape[:2]
    ppm = b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    assert np.array_equal(mm.decode_rgb(ppm), img)
    for bo in ("<", ">"):
        assert np.array_equal(mm.decode_rgb(_tiff_bytes(img, bo=bo)),
                              img)


@settings(max_examples=30, deadline=None)
@given(img=_rgb_images(),
       filters=st.lists(st.integers(min_value=0, max_value=4),
                        min_size=1, max_size=5))
def test_png_roundtrip_exact_any_filters(img, filters):
    assert np.array_equal(mm.decode_rgb(_png_bytes(img, filters)), img)


@settings(max_examples=30, deadline=None)
@given(data=_palette_images(), interlace=st.booleans(),
       local=st.booleans())
def test_gif_roundtrip_exact(data, interlace, local):
    idx, pal = data
    payload = _gif_bytes(idx, pal, interlace=interlace,
                         local_palette=local)
    assert np.array_equal(mm.decode_rgb(payload), pal[idx])


@settings(max_examples=40, deadline=None)
@given(dims=_dims, value=st.integers(min_value=0, max_value=255))
def test_jpeg_flat_image_exact(dims, value):
    """Any flat image of any size round-trips exactly with unit quant
    tables: every block's AC spectrum is zero and its DC value
    (value-128)*8 is an integer, so nothing rounds."""
    h, w = dims
    img = np.full((h, w), value, np.uint8)
    got = mm.decode_rgb(_jpeg_bytes(img))
    assert np.array_equal(got, np.full((h, w, 3), value, np.uint8))


@settings(max_examples=20, deadline=None)
@given(img=_rgb_images())
def test_jpeg_444_bounded_error(img):
    got = mm.decode_rgb(_jpeg_bytes(img))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.integers(min_value=-(1 << 31),
                                 max_value=(1 << 31) - 1),
                     min_size=1, max_size=64))
def test_wav_width_normalization_top16(vals):
    """24- and 32-bit PCM keep exactly the top 16 bits of each sample."""
    a = np.array(vals, np.int64)
    raw32 = a.astype("<i4").tobytes()
    got32 = mm.decode_pcm(_wav_bytes_fmt(raw32, 1, 32))
    assert np.array_equal(got32, (a >> 16).astype(np.int16))
    a24 = a >> 8  # fits in 24 bits
    raw24 = b"".join(int(v).to_bytes(3, "little", signed=True)
                     for v in a24)
    got24 = mm.decode_pcm(_wav_bytes_fmt(raw24, 1, 24))
    assert np.array_equal(got24, (a24 >> 8).astype(np.int16))
