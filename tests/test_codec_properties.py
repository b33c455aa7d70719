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


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=2000),
    flip_at=st.integers(min_value=0, max_value=1999),
    flip_to=st.integers(min_value=0, max_value=255),
)
def test_mp4_demux_survives_mutations(cut, flip_at, flip_to):
    """Truncations and byte flips of a valid MP4 either demux to SOME
    sample list or raise within the degradable exception taxonomy
    (_DECODE_ERRORS) — never an IndexError-free crash class sample_frames
    cannot catch, and never a sample extending past the buffer."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg, parse_mp4_samples
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    frames = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
              for v in (10, 120)]
    blob = encode_mp4_mjpeg(frames, [30, 30], width=8, height=8)
    mutated = bytearray(blob[: max(12, min(cut, len(blob)))])
    if flip_at < len(mutated):
        mutated[flip_at] = flip_to
    try:
        got = parse_mp4_samples(bytes(mutated))
    except _DECODE_ERRORS:
        got = None
    if got is not None:
        for start_ms, delay_ms, payload in got:
            assert 0 <= start_ms and 0 <= delay_ms
            assert len(payload) <= len(mutated)


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=2000),
    flip_at=st.integers(min_value=0, max_value=1999),
    flip_to=st.integers(min_value=0, max_value=255),
)
def test_mp4_timeline_survives_mutations(cut, flip_at, flip_to):
    """The metadata-only timeline holds the same taxonomy as the payload
    demuxer under truncation/byte flips (it shares the table walk plus
    stss): rows within the degradable exception set or a timeline whose
    byte extents stay inside the buffer — never a crash class
    sample_frames cannot catch."""
    from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg, parse_mp4_timeline
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    blob = encode_mp4_mjpeg(
        [b"\x01" * 40, b"\x02" * 50], [30, 30], width=8, height=8,
        sample_type=b"avc1", sync_samples=[1],
    )
    mutated = bytearray(blob[: max(12, min(cut, len(blob)))])
    if flip_at < len(mutated):
        mutated[flip_at] = flip_to
    try:
        info = parse_mp4_timeline(bytes(mutated))
    except _DECODE_ERRORS:
        return
    assert isinstance(info["codec"], str)
    for start_ms, delay_ms, pos, size, kf in info["samples"]:
        assert 0 <= start_ms and 0 <= delay_ms
        assert 0 <= pos and pos + size <= len(mutated)
        assert isinstance(kf, bool)


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=4000),
    flip_at=st.integers(min_value=0, max_value=3999),
    flip_to=st.integers(min_value=0, max_value=255),
)
def test_mjpeg_split_survives_mutations(cut, flip_at, flip_to):
    """split_mjpeg_frames on truncations/byte flips of a valid stream
    always terminates and returns frame byte runs inside the buffer —
    the structural walk can mis-split a corrupted stream (the decoder
    rejects those frames downstream) but must never raise or hang."""
    import numpy as np

    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.multimodal import split_mjpeg_frames

    frames = [encode_image_jpeg(np.full((8, 8, 3), v, np.uint8))
              for v in (10, 120, 240)]
    stream = b"".join(frames)
    mutated = bytearray(stream[: min(cut, len(stream))])
    if flip_at < len(mutated):
        mutated[flip_at] = flip_to
    got = split_mjpeg_frames(bytes(mutated), max_frames=16)
    for fb in got:
        assert fb.startswith(b"\xff\xd8") and fb.endswith(b"\xff\xd9")
