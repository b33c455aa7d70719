"""Property-based codec semantics (hypothesis): arbitrary rasters must
round-trip the PNG container across every depth/color/filter/interlace
combination, and progressive JPEG must decode byte-identically to the
baseline encoding of the same image — the two invariants the spec-built
fixtures pin pointwise, here exercised over adversarial geometry (1-pixel
dimensions, rasters that empty Adam7 passes, partial pack bytes)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sed_binning_spark.pipeline.jpeg import (
    decode_image_jpeg,
    encode_image_jpeg,
    encode_image_jpeg_progressive,
)
from sed_binning_spark.pipeline.multimodal import (
    decode_image_png,
    encode_image_png,
)

_SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _raster(draw, max_side=24, channels=st.integers(1, 4)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(channels)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch)).astype(np.uint8)


@given(
    img=_raster(),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    interlace=st.booleans(),
    depth16=st.booleans(),
)
@_SET
def test_png_roundtrip_property(img, filters, interlace, depth16):
    src = img.astype(np.uint16) * 257 if depth16 else img
    got = decode_image_png(
        encode_image_png(src, filters=filters, interlace=interlace),
    )
    np.testing.assert_array_equal(got, img)


@given(
    img=_raster(channels=st.just(1)),
    depth=st.sampled_from([1, 2, 4]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    interlace=st.booleans(),
    palette=st.booleans(),
)
@_SET
def test_png_low_bit_roundtrip_property(img, depth, filters, interlace,
                                        palette):
    vals = (img[..., 0] % (1 << depth)).astype(np.uint8)
    if palette:
        rng = np.random.default_rng(int(vals.sum()))
        pal = rng.integers(0, 256, (1 << depth, 3)).astype(np.uint8)
        got = decode_image_png(encode_image_png(
            vals, palette=pal, bit_depth=depth,
            filters=filters, interlace=interlace,
        ))
        np.testing.assert_array_equal(got, pal[vals])
    else:
        got = decode_image_png(encode_image_png(
            vals, bit_depth=depth, filters=filters, interlace=interlace,
        ))
        scale = 255 // ((1 << depth) - 1)
        np.testing.assert_array_equal(got, (vals * scale)[..., None])


@given(
    img=_raster(max_side=40, channels=st.sampled_from([1, 3])),
    quality=st.integers(20, 95),
    sub=st.sampled_from(["444", "420"]),
    restart=st.sampled_from([0, 1, 3, 7]),
)
@_SET
def test_jpeg_progressive_parity_property(img, quality, sub, restart):
    if img.shape[2] == 1:
        img = img[..., 0]
    base = decode_image_jpeg(encode_image_jpeg(
        img, quality=quality, subsampling=sub, restart_interval=restart,
    ))
    prog = decode_image_jpeg(encode_image_jpeg_progressive(
        img, quality=quality, subsampling=sub, restart_interval=restart,
    ))
    np.testing.assert_array_equal(base, prog)


@st.composite
def _paletted_raster(draw, max_side=24):
    """Random raster drawn from a ≤256-color palette — the domain GIF's
    container can hold losslessly (quantization is out of codec scope)."""
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ncolors = draw(st.integers(1, 256))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    return palette[rng.integers(0, ncolors, (h, w))]


@given(
    img=_paletted_raster(),
    interlace=st.booleans(),
    local_palette=st.booleans(),
    offset=st.tuples(st.integers(0, 9), st.integers(0, 9)),
)
@_SET
def test_gif_roundtrip_property(img, interlace, local_palette, offset):
    from sed_binning_spark.pipeline.multimodal import (
        decode_image_gif, encode_image_gif,
    )

    left, top = offset
    h, w = img.shape[:2]
    blob = encode_image_gif(
        img, interlace=interlace, local_palette=local_palette,
        frame_offset=(left, top), screen_size=(left + w, top + h),
    )
    got = decode_image_gif(blob)
    assert got.shape == (top + h, left + w, 3)
    np.testing.assert_array_equal(got[top:, left:], img)


@given(
    data=st.binary(max_size=3000),
    min_code=st.integers(2, 8),
    period=st.integers(1, 64),
)
@_SET
def test_gif_lzw_roundtrip_property(data, min_code, period):
    """The LZW pair must invert over adversarial index streams, including
    short-period repetition that drives dictionary growth through the
    width bumps (and, for long inputs, to the 4096 deferred-clear cap)."""
    from sed_binning_spark.pipeline.multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )

    mask = (1 << min_code) - 1
    vals = bytes(b & mask for b in data)
    stream = vals + (vals[:period] or b"\x00") * 200 + vals
    enc = _gif_lzw_encode(stream, min_code)
    assert _gif_lzw_decode(enc, min_code, len(stream)) == stream
