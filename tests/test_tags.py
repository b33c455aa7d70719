"""Media tag extraction (pipeline.tags): the five public tag grammars
— ID3v2.2/2.3/2.4 + ID3v1, Vorbis comments behind FLAC / Ogg Opus /
Ogg Vorbis carriers, MP4 ilst, RIFF LIST-INFO — parsed from spec-built
fixtures, plus the loud-refusal malformed paths and the Spark
operator's per-payload degrade. No counterpart in the reference repo
(photoemission binning, no media code)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sed_binning_spark.pipeline.flac import encode_flac
from sed_binning_spark.pipeline.multimodal import encode_audio_wav
from sed_binning_spark.pipeline.ogg import encode_ogg_opus
from sed_binning_spark.pipeline.tags import (
    add_flac_vorbis_comments,
    add_riff_info,
    encode_id3v1,
    encode_id3v2,
    encode_mp4_tags_fixture,
    encode_vorbis_comment_block,
    extract_media_tags,
    parse_id3v1,
    parse_id3v2,
    parse_media_tags,
    parse_vorbis_comments,
)


# ---------------------------------------------------------------------------
# ID3v2


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_text_frames_round_trip(version):
    frames = [
        ("TIT2", "Plain Title"),
        ("TPE1", "Ärtïst Ünïon"),  # forces utf-16 (v2.3) / utf-8 (v2.4)
        ("TXXX:mood", "calm"),
        ("COMM:note", "a tiny comment"),
        ("USLT:l", "la la lyrics"),
        ("TCON", "Electronic"),
    ]
    blob = encode_id3v2(frames, version=version)
    tags, end = parse_id3v2(blob)
    assert end == len(blob)
    assert tags == [
        ("title", "Plain Title"),
        ("artist", "Ärtïst Ünïon"),
        ("mood", "calm"),
        ("comment", "a tiny comment"),
        ("lyrics", "la la lyrics"),
        ("genre", "Electronic"),
    ]


def test_id3v2_unknown_text_frame_keeps_lowercased_id():
    blob = encode_id3v2([("TENC", "Encoder Person")], version=3)
    assert parse_id3v2(blob)[0] == [("tenc", "Encoder Person")]


def test_id3v23_global_unsync_round_trip():
    # latin-1 0xFF bytes force real 0xFF 0x00 escapes in the tag body
    blob = encode_id3v2([("TIT2", "ÿÿ title ÿ")], version=3, unsync=True)
    assert blob[5] & 0x80
    assert b"\xff\x00" in blob[10:]
    assert parse_id3v2(blob)[0] == [("title", "ÿÿ title ÿ")]


def test_id3v24_syncsafe_frame_sizes():
    # a frame body longer than 127 bytes exercises multi-byte syncsafe
    text = "x" * 300
    blob = encode_id3v2([("TIT2", text)], version=4)
    assert parse_id3v2(blob)[0] == [("title", text)]
    # the frame size bytes must all have their top bit clear
    assert all(b < 0x80 for b in blob[14:18])


def test_id3v22_three_byte_frames():
    body = b""
    for fid, text in ((b"TT2", b"Old Title"), (b"TP1", b"Old Artist")):
        fbody = b"\x00" + text  # latin-1
        body += fid + len(fbody).to_bytes(3, "big") + fbody
    blob = b"ID3\x02\x00\x00" + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body
    assert parse_id3v2(blob)[0] == [
        ("title", "Old Title"), ("artist", "Old Artist"),
    ]


def test_id3v23_compressed_frame_inflates():
    raw = b"\x00" + b"compressed title"
    comp = zlib.compress(raw)
    fbody = len(raw).to_bytes(4, "big") + comp
    frame = b"TIT2" + len(fbody).to_bytes(4, "big") + b"\x00\x80" + fbody
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    assert parse_id3v2(blob)[0] == [("title", "compressed title")]


def test_id3v24_per_frame_unsync_and_dli():
    raw = b"\x00" + "ÿ title".encode("latin-1")
    unsynced = raw.replace(b"\xff", b"\xff\x00")
    body = (len(raw) >> 7).to_bytes(1, "big") + bytes([len(raw) & 0x7F])
    fbody = b"\x00\x00" + body + unsynced  # 4-byte syncsafe DLI
    frame = (b"TIT2" + bytes([0, 0, len(fbody) >> 7, len(fbody) & 0x7F])
             + b"\x00\x03" + fbody)  # unsync + DLI flags
    blob = b"ID3\x04\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    assert parse_id3v2(blob)[0] == [("title", "ÿ title")]


def test_id3v2_encrypted_frame_is_skipped():
    fbody = b"\x00opaque"
    frame = b"TIT2" + len(fbody).to_bytes(4, "big") + b"\x00\x40" + fbody
    keep = b"TALB" + (5).to_bytes(4, "big") + b"\x00\x00" + b"\x00Yes!"
    body = frame + keep
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(body) >> 7, len(body) & 0x7F]) + body
    assert parse_id3v2(blob)[0] == [("album", "Yes!")]


def test_id3v2_not_present_returns_empty():
    assert parse_id3v2(b"\xff\xfbxxxx") == ([], 0)


@pytest.mark.parametrize("blob,msg", [
    (b"ID3\x03\x00\x00\x00\x00\x00\x80", "syncsafe"),
    (b"ID3\x05\x00\x00\x00\x00\x00\x00", "not a published"),
    (b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f", "past the file end"),
])
def test_id3v2_malformed_raises(blob, msg):
    with pytest.raises(ValueError, match=msg):
        parse_id3v2(blob)


def test_id3v2_frame_overrun_raises():
    frame = b"TIT2" + (99).to_bytes(4, "big") + b"\x00\x00" + b"\x00hi"
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    with pytest.raises(ValueError, match="past the tag"):
        parse_id3v2(blob)


def test_id3v2_bad_frame_id_raises():
    frame = b"t!t2" + (3).to_bytes(4, "big") + b"\x00\x00" + b"\x00hi"
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    with pytest.raises(ValueError, match="A-Z0-9"):
        parse_id3v2(blob)


def test_id3v2_bad_encoding_byte_raises():
    frame = b"TIT2" + (3).to_bytes(4, "big") + b"\x00\x00" + b"\x09hi"
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    with pytest.raises(ValueError, match="encoding 9"):
        parse_id3v2(blob)


# ---------------------------------------------------------------------------
# ID3v1


def test_id3v11_round_trip():
    blk = encode_id3v1("A Title", "An Artist", "An Album", "1999",
                       "short comment", track=7)
    assert len(blk) == 128
    assert parse_id3v1(b"\xff\xfb" + b"\x00" * 64 + blk) == [
        ("title", "A Title"), ("artist", "An Artist"),
        ("album", "An Album"), ("date", "1999"),
        ("comment", "short comment"), ("track", "7"),
    ]


def test_id3v10_comment_uses_all_30_bytes():
    blk = encode_id3v1("T", comment="c" * 30)
    got = dict(parse_id3v1(blk))
    assert got["comment"] == "c" * 30
    assert "track" not in got


def test_id3v1_absent_returns_empty():
    assert parse_id3v1(b"\x00" * 200) == []


def test_id3v1_field_overflow_raises():
    with pytest.raises(ValueError, match="exceeds 30"):
        encode_id3v1("x" * 31)


# ---------------------------------------------------------------------------
# Vorbis comments + carriers


def test_vorbis_comment_round_trip():
    pairs = [("title", "Sömé Títle"), ("artist", "Nobody Ensemble")]
    blk = encode_vorbis_comment_block(pairs)
    assert parse_vorbis_comments(blk) == pairs


def test_vorbis_comment_framing_bit_enforced():
    blk = encode_vorbis_comment_block([("title", "x")])
    with pytest.raises(ValueError, match="framing bit"):
        parse_vorbis_comments(blk, framing=True)
    assert parse_vorbis_comments(blk + b"\x01", framing=True) == [
        ("title", "x"),
    ]


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b[:6], "too short"),
    (lambda b: struct.pack("<I", 1 << 30) + b[4:], "vendor string overruns"),
    (lambda b: b[:-3], "entry overruns"),
])
def test_vorbis_comment_malformed_raises(mutate, msg):
    blk = encode_vorbis_comment_block([("title", "hello")])
    with pytest.raises(ValueError, match=msg):
        parse_vorbis_comments(mutate(blk))


def test_vorbis_comment_entry_without_equals_raises():
    entry = b"NOEQUALS"
    blk = (struct.pack("<I", 0) + struct.pack("<I", 1)
           + struct.pack("<I", len(entry)) + entry)
    with pytest.raises(ValueError, match="KEY=value"):
        parse_vorbis_comments(blk)


def test_flac_vorbis_comments():
    flac = encode_flac(
        np.arange(0, 4096, dtype=np.int16).reshape(-1, 1), 8000,
    )
    pairs = [("title", "Flac Träck"), ("artist", "Nobody")]
    got = parse_media_tags(add_flac_vorbis_comments(flac, pairs))
    assert got == {"container": "flac", "tags": pairs}


def test_flac_without_comment_block_returns_empty():
    flac = encode_flac(np.zeros((4096, 1), np.int16), 8000)
    assert parse_media_tags(flac) == {"container": "flac", "tags": []}


def test_ogg_opus_tags():
    pairs = [("title", "Opus Träck"), ("comment", "caption text")]
    ogg = encode_ogg_opus(
        [b"\x00" * 10] * 3,
        comment_payload=encode_vorbis_comment_block(pairs),
    )
    assert parse_media_tags(ogg) == {"container": "ogg", "tags": pairs}


def test_ogg_opus_default_fixture_has_no_tags():
    ogg = encode_ogg_opus([b"\x00" * 10] * 2)
    assert parse_media_tags(ogg) == {"container": "ogg", "tags": []}


def test_ogg_comment_packet_spanning_pages():
    # a comment block bigger than one 255-lace segment run spans lacing
    pairs = [("lyrics", "word " * 300)]
    ogg = encode_ogg_opus(
        [b"\x00" * 10] * 2,
        comment_payload=encode_vorbis_comment_block(pairs),
    )
    got = parse_media_tags(ogg)
    assert got["tags"] == [("lyrics", "word " * 300)]


# ---------------------------------------------------------------------------
# MP4 ilst + RIFF INFO


def test_mp4_ilst_tags():
    fixture = encode_mp4_tags_fixture([
        (b"\xa9nam", "Vid Title"), (b"\xa9ART", "Vid Artist"),
        (b"\xa9cmt", "caption here"), (b"\xa9lyr", "all the words"),
    ])
    assert parse_media_tags(fixture) == {"container": "mp4", "tags": [
        ("title", "Vid Title"), ("artist", "Vid Artist"),
        ("comment", "caption here"), ("lyrics", "all the words"),
    ]}


def test_mp4_without_udta_returns_empty():
    from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg

    blob = encode_mp4_mjpeg(
        [b"\xff\xd8\xff\xdb fake"], delays_ms=[40], width=8, height=8,
    )
    assert parse_media_tags(blob) == {"container": "mp4", "tags": []}


def test_riff_info_tags():
    wav = encode_audio_wav(np.zeros((64, 1), np.int16), 8000)
    tagged = add_riff_info(wav, [
        (b"INAM", "Wav Name"), (b"ICMT", "wav comment"),
        (b"ICRD", "2024-01-02"),
    ])
    assert parse_media_tags(tagged) == {"container": "wav", "tags": [
        ("title", "Wav Name"), ("comment", "wav comment"),
        ("date", "2024-01-02"),
    ]}
    # the RIFF size field must still cover the appended LIST chunk
    assert struct.unpack_from("<I", tagged, 4)[0] == len(tagged) - 8


def test_riff_without_info_returns_empty():
    wav = encode_audio_wav(np.zeros((64, 1), np.int16), 8000)
    assert parse_media_tags(wav) == {"container": "wav", "tags": []}


def test_riff_truncated_chunk_raises():
    wav = encode_audio_wav(np.zeros((64, 1), np.int16), 8000)
    tagged = add_riff_info(wav, [(b"INAM", "x")])
    with pytest.raises(ValueError, match="extends past"):
        parse_media_tags(tagged[:-3])


# ---------------------------------------------------------------------------
# image containers: Exif / JPEG COM / PNG text / GIF comment / WebP EXIF


@pytest.mark.parametrize("little", [True, False])
def test_tiff_exif_round_trip(little):
    from sed_binning_spark.pipeline.tags import (
        encode_tiff_exif, parse_tiff_exif, user_comment,
    )

    tiff = encode_tiff_exif(
        [(0x010F, "CamCo"), (0x0110, "Model X-5"),
         (0x010E, "a photo description"), (0x0112, 6),
         (0x013B, "Shooter"), (0x0132, "2024:03:04 10:11:12")],
        exif=[(0x9003, "2024:03:04 10:00:00"),
              (0x9286, user_comment("user says hi"))],
        little=little,
    )
    assert parse_tiff_exif(tiff) == [
        ("description", "a photo description"), ("make", "CamCo"),
        ("model", "Model X-5"), ("orientation", "6"),
        ("date", "2024:03:04 10:11:12"), ("artist", "Shooter"),
        ("date_original", "2024:03:04 10:00:00"),
        ("comment", "user says hi"),
    ]


def test_exif_unicode_user_comment():
    from sed_binning_spark.pipeline.tags import (
        encode_tiff_exif, parse_tiff_exif, user_comment,
    )

    tiff = encode_tiff_exif(
        [(0x010F, "M")],
        exif=[(0x9286, user_comment("ünïcode cömment", unicode=True))],
    )
    assert ("comment", "ünïcode cömment") in parse_tiff_exif(tiff)


def test_exif_bad_magic_raises():
    from sed_binning_spark.pipeline.tags import parse_tiff_exif

    with pytest.raises(ValueError, match="II\\*/MM\\*"):
        parse_tiff_exif(b"XX\x00\x00\x00\x00\x00\x00")


def test_jpeg_app1_and_com():
    from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
    from sed_binning_spark.pipeline.tags import (
        add_jpeg_metadata, encode_tiff_exif,
    )

    img = encode_image_jpeg(np.full((16, 16), 128, np.uint8))
    j = add_jpeg_metadata(
        img, exif=encode_tiff_exif([(0x010F, "CamCo"), (0x0110, "M1")]),
        comment="jpeg cömment",
    )
    assert parse_media_tags(j) == {"container": "jpeg", "tags": [
        ("make", "CamCo"), ("model", "M1"), ("comment", "jpeg cömment"),
    ]}


def test_jpeg_segment_overrun_raises():
    blob = b"\xff\xd8\xff\xe1\xff\xff short"
    with pytest.raises(ValueError, match="extends past"):
        parse_media_tags(blob)


def test_jpeg_lost_sync_raises():
    blob = b"\xff\xd8\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="lost sync"):
        parse_media_tags(blob)


def test_png_text_chunks_all_kinds():
    from sed_binning_spark.pipeline.multimodal import encode_image_png
    from sed_binning_spark.pipeline.tags import add_png_text

    png = encode_image_png(np.zeros((4, 4, 3), np.uint8))
    p = add_png_text(png, [
        ("Title", "Png Title", "tEXt"),
        ("Description", "long words " * 10, "zTXt"),
        ("Comment", "ünïcode cómment", "iTXt"),
        ("Software", "sbs 1.0", "iTXt-z"),
        ("Custom Key", "kept as-is", "tEXt"),
    ])
    assert parse_media_tags(p) == {"container": "png", "tags": [
        ("title", "Png Title"),
        ("description", "long words " * 10),
        ("comment", "ünïcode cómment"),
        ("encoder", "sbs 1.0"),
        ("custom key", "kept as-is"),
    ]}


def test_png_crc_failure_raises():
    from sed_binning_spark.pipeline.multimodal import encode_image_png
    from sed_binning_spark.pipeline.tags import add_png_text

    p = bytearray(add_png_text(
        encode_image_png(np.zeros((4, 4, 3), np.uint8)),
        [("Title", "x", "tEXt")],
    ))
    at = bytes(p).find(b"tEXt")
    p[at + 5] ^= 0x01  # flip a body byte under the CRC
    with pytest.raises(ValueError, match="CRC"):
        parse_media_tags(bytes(p))


def test_gif_comment_spanning_subblocks():
    from sed_binning_spark.pipeline.multimodal import encode_image_gif
    from sed_binning_spark.pipeline.tags import add_gif_comment

    text = "gif comment " * 30  # 360 bytes -> two sub-blocks
    g = add_gif_comment(
        encode_image_gif(np.zeros((4, 4, 3), np.uint8)), text,
    )
    assert parse_media_tags(g) == {
        "container": "gif", "tags": [("comment", text)],
    }


def test_gif_undefined_block_raises():
    from sed_binning_spark.pipeline.multimodal import encode_image_gif

    g = bytearray(encode_image_gif(np.zeros((4, 4, 3), np.uint8)))
    g[-1] = 0x7F  # replace the trailer with an undefined block type
    with pytest.raises(ValueError, match="not defined"):
        parse_media_tags(bytes(g))


def test_webp_exif_chunk():
    from sed_binning_spark.pipeline.multimodal import encode_webp_header
    from sed_binning_spark.pipeline.tags import (
        add_webp_exif, encode_tiff_exif,
    )

    wp = encode_webp_header(100, 50, variant="vp8x")
    w = add_webp_exif(
        wp, b"Exif\x00\x00" + encode_tiff_exif([(0x010F, "WebCam")]),
    )
    assert parse_media_tags(w) == {
        "container": "webp", "tags": [("make", "WebCam")],
    }
    assert w[20] & 0x08  # VP8X EXIF flag
    assert struct.unpack_from("<I", w, 4)[0] == len(w) - 8


def test_webp_without_exif_returns_empty():
    from sed_binning_spark.pipeline.multimodal import encode_webp_header

    assert parse_media_tags(encode_webp_header(10, 10)) == {
        "container": "webp", "tags": [],
    }


def test_webp_exif_requires_vp8x():
    from sed_binning_spark.pipeline.multimodal import encode_webp_header
    from sed_binning_spark.pipeline.tags import add_webp_exif

    with pytest.raises(ValueError, match="VP8X"):
        add_webp_exif(encode_webp_header(10, 10, variant="vp8"), b"II*")


# ---------------------------------------------------------------------------
# Matroska/WebM native tags


def test_matroska_tags_round_trip():
    from sed_binning_spark.pipeline.tags import add_matroska_tags
    from sed_binning_spark.pipeline.webm import (
        encode_webm, parse_webm_timeline,
    )

    mkv = encode_webm(
        [b"a" * 4, b"b" * 6], [0, 20], track_type=2,
        codec_id="A_OPUS", default_duration_ms=20,
    )
    tagged = add_matroska_tags(
        mkv,
        [("title", "Mkv Söng"), ("artist", "Mkv Artist"),
         ("date_released", "2024")],
        title="Segment Name",
    )
    assert parse_media_tags(tagged) == {"container": "webm", "tags": [
        ("title", "Segment Name"), ("title", "Mkv Söng"),
        ("artist", "Mkv Artist"), ("date", "2024"),
    ]}
    # the rebuilt Segment must still demux
    got = parse_webm_timeline(tagged, media="audio")
    assert [sm[3] for sm in got["samples"]] == [4, 6]


def test_matroska_nested_simple_tags():
    from sed_binning_spark.pipeline.tags import (
        _MKV_SIMPLE_TAG, _MKV_TAG_NAME, _MKV_TAG_STRING,
        _matroska_simple_tag,
    )
    from sed_binning_spark.pipeline.webm import _elem

    inner = (_elem(_MKV_TAG_NAME, b"PART_NUMBER")
             + _elem(_MKV_TAG_STRING, b"3"))
    outer_payload = (_elem(_MKV_TAG_NAME, b"TITLE")
                     + _elem(_MKV_TAG_STRING, b"Outer")
                     + _elem(_MKV_SIMPLE_TAG, inner))
    out = []
    _matroska_simple_tag(outer_payload, 0, len(outer_payload), out)
    assert out == [("title", "Outer"), ("part_number", "3")]


def test_matroska_untagged_returns_empty():
    from sed_binning_spark.pipeline.webm import encode_webm

    assert parse_media_tags(encode_webm([b"x"], [0])) == {
        "container": "webm", "tags": [],
    }


# ---------------------------------------------------------------------------
# dispatch


def test_mp3_prefers_id3v2_over_v1():
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames

    audio = encode_mp3_frames(2)
    both = (encode_id3v2([("TIT2", "New")], version=3) + audio
            + encode_id3v1("Old"))
    assert parse_media_tags(both) == {
        "container": "mp3", "tags": [("title", "New")],
    }


def test_mp3_falls_back_to_id3v1():
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames

    blob = encode_mp3_frames(2) + encode_id3v1("Only V1", "Someone")
    assert parse_media_tags(blob) == {"container": "mp3", "tags": [
        ("title", "Only V1"), ("artist", "Someone"),
    ]}


def test_adts_with_id3_reports_aac_container():
    from sed_binning_spark.pipeline.aac import encode_adts_frames

    blob = encode_adts_frames([64, 64]) + encode_id3v1("Aac Title")
    got = parse_media_tags(blob)
    assert got["container"] == "aac"
    assert got["tags"] == [("title", "Aac Title")]


def test_unrecognized_payload_refuses():
    with pytest.raises(ValueError, match="no recognized tag container"):
        parse_media_tags(b"\x00\x01\x02\x03 not media")


# ---------------------------------------------------------------------------
# Spark operator


def test_extract_media_tags_operator(spark):
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames

    payloads = [
        (0, bytearray(encode_id3v2(
            [("TIT2", "Song A"), ("TPE1", "Artist A")], version=3,
        ) + encode_mp3_frames(1))),
        (1, bytearray(encode_mp4_tags_fixture([(b"\xa9nam", "Vid B")]))),
        (2, bytearray(b"garbage that parses nowhere")),
        (3, None),
        (4, bytearray(encode_audio_wav(np.zeros((8, 1), np.int16), 8000))),
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    rows = sorted(
        extract_media_tags(df).collect(),
        key=lambda r: (r.media_id, r.key),
    )
    assert [tuple(r) for r in rows] == [
        (0, "mp3", "artist", "Artist A"),
        (0, "mp3", "title", "Song A"),
        (1, "mp4", "title", "Vid B"),
    ]


# ---------------------------------------------------------------------------
# contract fuzz: a corrupted payload must either parse or raise a
# _DECODE_ERRORS type — anything else would escape extract_media_tags'
# per-payload catch and kill the whole Arrow batch


def _fuzz_contract(blob: bytes, parse):
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    for at in range(len(blob)):
        for flip in (0xFF, 0x80, 0x01):
            mutated = bytearray(blob)
            mutated[at] ^= flip
            try:
                parse(bytes(mutated))
            except _DECODE_ERRORS:
                pass  # the documented failure surface


def test_fuzz_tag_containers_raise_only_decode_errors():
    from sed_binning_spark.pipeline.flac import encode_flac
    from sed_binning_spark.pipeline.multimodal import (
        encode_audio_wav, encode_image_png, encode_webp_header,
    )
    from sed_binning_spark.pipeline.tags import (
        add_flac_vorbis_comments, add_matroska_tags, add_png_text,
        add_riff_info, add_webp_exif, encode_tiff_exif,
    )
    from sed_binning_spark.pipeline.webm import encode_webm

    blobs = [
        encode_id3v2([("TIT2", "T"), ("TXXX:d", "v")], version=3),
        encode_id3v2([("TIT2", "T")], version=4),
        add_flac_vorbis_comments(
            encode_flac(np.zeros((4096, 1), np.int16), 8000),
            [("title", "x")],
        )[:256],  # tag blocks live in the head; frames have their own fuzz
        encode_mp4_tags_fixture([(b"\xa9nam", "T")]),
        add_riff_info(
            encode_audio_wav(np.zeros((8, 1), np.int16), 8000),
            [(b"INAM", "T")],
        ),
        add_png_text(
            encode_image_png(np.zeros((2, 2, 3), np.uint8)),
            [("Title", "T", "tEXt"), ("C", "z", "zTXt")],
        ),
        add_matroska_tags(
            encode_webm([b"x"], [0]), [("title", "T")], title="S",
        ),
        add_webp_exif(
            encode_webp_header(8, 8, variant="vp8x"),
            encode_tiff_exif([(0x010F, "M")]),
        ),
    ]
    from sed_binning_spark.pipeline.tags import parse_media_tags as p

    for blob in blobs:
        _fuzz_contract(blob, p)


def test_fuzz_jpeg_exif_raises_only_decode_errors():
    from sed_binning_spark.pipeline.tags import (
        add_jpeg_metadata, encode_tiff_exif, user_comment,
    )

    # the Exif + COM head only — the JPEG body has its own codec fuzz
    head = add_jpeg_metadata(
        b"\xff\xd8\xff\xd9",
        exif=encode_tiff_exif(
            [(0x010F, "M"), (0x0112, 3)],
            exif=[(0x9286, user_comment("c"))],
        ),
        comment="com",
    )
    _fuzz_contract(head, parse_media_tags)


def test_fuzz_subtitles_raise_only_decode_errors():
    from sed_binning_spark.pipeline.subtitles import (
        encode_matroska_subtitles, encode_srt, encode_webvtt,
        parse_subtitles,
    )

    for blob in [
        encode_srt([(0, 1000, "first"), (1500, 2500, "second")]),
        encode_webvtt([(0, 1000, "vtt cue")], note="n",
                      identifiers=True, settings="align:start"),
        encode_matroska_subtitles([(0, 2000, "muxed")]),
    ]:
        _fuzz_contract(blob, parse_subtitles)


def test_jpeg_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    raw = "fill comment".encode()
    com = b"\xff\xff\xff\xfe" + (len(raw) + 2).to_bytes(2, "big") + raw
    assert parse_media_tags(b"\xff\xd8" + com + b"\xff\xd9") == {
        "container": "jpeg", "tags": [("comment", "fill comment")],
    }


def test_id3v2_punctuation_frame_id_rejected():
    # 0x3A-0x40 (':;<=>?@') sits between '9' and 'A' — not a frame id
    frame = b"T=:@" + (3).to_bytes(4, "big") + b"\x00\x00" + b"\x00hi"
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    with pytest.raises(ValueError, match="A-Z0-9"):
        parse_id3v2(blob)


# ---------------------------------------------------------------------------
# cover art: APIC / FLAC PICTURE / METADATA_BLOCK_PICTURE / MP4 covr


def test_id3v2_apic_reports_mime():
    blob = encode_id3v2(
        [("TIT2", "T"), ("APIC", "image/png")], version=3,
    )
    assert parse_id3v2(blob)[0] == [
        ("title", "T"), ("artwork", "image/png"),
    ]


def test_flac_picture_block_declares_dims():
    from sed_binning_spark.pipeline.tags import (
        add_flac_picture, encode_flac_picture_block,
    )

    flac = encode_flac(np.zeros((4096, 1), np.int16), 8000)
    f2 = add_flac_picture(
        add_flac_vorbis_comments(flac, [("title", "X")]),
        encode_flac_picture_block(mime="image/png", width=8, height=6),
    )
    assert parse_media_tags(f2) == {"container": "flac", "tags": [
        ("title", "X"), ("artwork", "image/png 8x6"),
    ]}


def test_vorbis_metadata_block_picture():
    import base64

    from sed_binning_spark.pipeline.tags import encode_flac_picture_block

    b64 = base64.b64encode(encode_flac_picture_block(
        mime="image/jpeg", width=32, height=24,
    )).decode()
    ogg = encode_ogg_opus(
        [b"\x00" * 10] * 2,
        comment_payload=encode_vorbis_comment_block(
            [("title", "O"), ("metadata_block_picture", b64)],
        ),
    )
    assert parse_media_tags(ogg)["tags"] == [
        ("title", "O"), ("artwork", "image/jpeg 32x24"),
    ]


def test_vorbis_bad_picture_base64_raises():
    blk = encode_vorbis_comment_block(
        [("metadata_block_picture", "!!! not base64 !!!")],
    )
    with pytest.raises(ValueError, match="not base64"):
        parse_vorbis_comments(blk)


def test_mp4_covr_atom():
    fixture = encode_mp4_tags_fixture(
        [(b"\xa9nam", "V")], artwork=b"\x89PNGfake", artwork_type=14,
    )
    assert parse_media_tags(fixture)["tags"] == [
        ("title", "V"), ("artwork", "image/png"),
    ]


# ---------------------------------------------------------------------------
# ID3v2 chapters (CHAP)


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_chapters_round_trip(version):
    from sed_binning_spark.pipeline.mp3 import encode_mp3_frames
    from sed_binning_spark.pipeline.tags import (
        encode_id3v2_chapters, parse_id3v2_chapters,
    )

    blob = encode_id3v2_chapters(
        [(0, 30000, "Intro"), (30000, 95000, "Chäpter Two")],
        version=version, frames=[("TIT2", "Podcast Ep 1")],
    ) + encode_mp3_frames(2)
    assert parse_id3v2_chapters(blob) == [
        (1, 0, 30000, "Intro"), (2, 30000, 95000, "Chäpter Two"),
    ]
    # ordinary tags coexist with the chapter frames
    assert parse_id3v2(blob)[0] == [("title", "Podcast Ep 1")]
    # chapters surface as cues through the subtitle dispatch
    from sed_binning_spark.pipeline.subtitles import parse_subtitles

    got = parse_subtitles(blob)
    assert got["format"] == "id3" and len(got["cues"]) == 2


def test_id3v2_chapters_sort_by_start_time():
    from sed_binning_spark.pipeline.tags import (
        encode_id3v2_chapters, parse_id3v2_chapters,
    )

    blob = encode_id3v2_chapters(
        [(60000, 90000, "Later"), (0, 60000, "Earlier")],
    )
    assert [t for _i, _s, _e, t in parse_id3v2_chapters(blob)] \
        == ["Earlier", "Later"]


def test_id3v2_chapters_absent_returns_empty():
    from sed_binning_spark.pipeline.tags import parse_id3v2_chapters

    assert parse_id3v2_chapters(
        encode_id3v2([("TIT2", "No chapters")], version=3),
    ) == []
    assert parse_id3v2_chapters(b"\xff\xfb no id3 here") == []


def test_id3v2_chapter_end_before_start_raises():
    import struct

    from sed_binning_spark.pipeline.tags import parse_id3v2_chapters

    fbody = (b"c\x00" + struct.pack(">IIII", 5000, 1000,
                                    0xFFFFFFFF, 0xFFFFFFFF))
    frame = b"CHAP" + len(fbody).to_bytes(4, "big") + b"\x00\x00" + fbody
    blob = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(frame) >> 7, len(frame) & 0x7F]) + frame
    with pytest.raises(ValueError, match="before it starts"):
        parse_id3v2_chapters(blob)


@pytest.mark.parametrize("little", [True, False])
def test_exif_gps_coordinates(little):
    from sed_binning_spark.pipeline.tags import (
        encode_tiff_exif, parse_tiff_exif,
    )

    # Paris: 48°51'29.988" N, 2°17'39.84" E
    gps = [(1, "N"), (2, [(48, 1), (51, 1), (29988, 1000)]),
           (3, "E"), (4, [(2, 1), (17, 1), (3984, 100)])]
    t = encode_tiff_exif(
        [(0x010F, "CamCo")], gps=gps, little=little,
    )
    assert ("gps", "48.858330N 2.294400E") in parse_tiff_exif(t)


def test_exif_gps_zero_denominator_raises():
    from sed_binning_spark.pipeline.tags import (
        encode_tiff_exif, parse_tiff_exif,
    )

    t = bytearray(encode_tiff_exif(
        [(0x010F, "M")],
        gps=[(1, "N"), (2, [(48, 1), (0, 1), (0, 1)]),
             (3, "E"), (4, [(2, 1), (0, 1), (0, 1)])],
    ))
    import struct as _s

    # find the first rational pair (48, 1) and break its denominator
    pat = _s.pack("<II", 48, 1)
    at = bytes(t).find(pat)
    t[at + 4 : at + 8] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="zero denominator"):
        parse_tiff_exif(bytes(t))


def test_mp4_meta_directly_under_moov():
    # some writers hang meta off moov without a udta wrapper
    def box(btype, payload):
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    raw = "Direct Meta".encode()
    items = box(b"\xa9nam", box(
        b"data", (1).to_bytes(4, "big") + b"\x00" * 4 + raw))
    meta = box(b"meta", b"\x00" * 4 + box(
        b"hdlr", b"\x00" * 8 + b"mdir" + b"\x00" * 10,
    ) + box(b"ilst", items))
    mvhd = box(b"mvhd", b"\x00" * 100)
    blob = (box(b"ftyp", b"isom\x00\x00\x02\x00isom")
            + box(b"moov", mvhd + meta))
    assert parse_media_tags(blob)["tags"] == [("title", "Direct Meta")]


def test_bwf_bext_chunk():
    import struct as _s

    wav = encode_audio_wav(np.zeros((16, 1), np.int16), 8000)
    body = (b"An archival recording" + b"\x00" * 235   # description
            + b"National Archive" + b"\x00" * 16        # originator
            + b"\x00" * 32                              # originator ref
            + b"2003-07-14" + b"\x00" * 8 + b"\x00" * 256)
    tagged = wav + b"bext" + _s.pack("<I", len(body)) + body
    tagged = tagged[:4] + _s.pack("<I", len(tagged) - 8) + tagged[8:]
    assert parse_media_tags(tagged)["tags"] == [
        ("description", "An archival recording"),
        ("originator", "National Archive"),
        ("date", "2003-07-14"),
    ]


def test_podcast_ilst_keys():
    fixture = encode_mp4_tags_fixture([
        (b"\xa9nam", "Ep 1"), (b"desc", "A short summary"),
        (b"ldes", "The long show notes"),
    ])
    assert parse_media_tags(fixture)["tags"] == [
        ("title", "Ep 1"), ("description", "A short summary"),
        ("description", "The long show notes"),
    ]
