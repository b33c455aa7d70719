"""Subtitle cue extraction (pipeline.subtitles): SubRip, WebVTT, and
Matroska S_TEXT/UTF8 grammars from spec-built fixtures, the loud
malformed paths, the expression-only synthesizer, and the Spark
operator's per-payload degrade. No counterpart in the reference repo
(photoemission binning, no media code)."""

from __future__ import annotations

import pytest

from sed_binning_spark.pipeline.subtitles import (
    encode_matroska_subtitles,
    encode_srt,
    encode_webvtt,
    extract_subtitle_cues,
    parse_matroska_subtitles,
    parse_srt,
    parse_subtitles,
    parse_webvtt,
    synthesize_subtitle_media_from_text,
)


def test_srt_round_trip():
    srt = encode_srt([
        (500, 2750, "hello there"),
        (3250, 5000, "second cue\nline two"),
    ])
    assert parse_subtitles(srt) == {"format": "srt", "cues": [
        (1, 500, 2750, "hello there"),
        (2, 3250, 5000, "second cue\nline two"),
    ]}


def test_srt_hour_scale_times():
    srt = encode_srt([(3_723_456, 3_725_000, "an hour in")])
    assert b"01:02:03,456" in srt
    assert parse_srt(srt.decode()) == [
        (1, 3_723_456, 3_725_000, "an hour in"),
    ]


def test_srt_dot_decimal_tolerated():
    assert parse_srt("1\n00:00:01.000 --> 00:00:02.000\ndot srt") == [
        (1, 1000, 2000, "dot srt"),
    ]


def test_srt_declared_index_reported():
    # players renumber; the parser reports what the file declares
    assert parse_srt("7\n00:00:01,000 --> 00:00:02,000\nx")[0][0] == 7


@pytest.mark.parametrize("doc,msg", [
    ("not an index\n00:00:01,000 --> 00:00:02,000\nx", "not an index"),
    ("1\nno arrow here\nx", "no '-->'"),
    ("1\n00:00:02,000 --> 00:00:01,000\nx", "before it starts"),
    ("1\n00:00:99,000 --> 00:01:40,000\nx", ">= 60"),
    ("1", "too short"),
])
def test_srt_malformed_raises(doc, msg):
    with pytest.raises(ValueError, match=msg):
        parse_srt(doc)


def test_webvtt_round_trip_with_grammar_noise():
    vtt = encode_webvtt(
        [(500, 2750, "hello vtt"), (3250, 5000, "cue 2")],
        note="a comment block", identifiers=True,
        settings="align:start position:10%",
    )
    assert parse_subtitles(vtt) == {"format": "vtt", "cues": [
        (1, 500, 2750, "hello vtt"), (2, 3250, 5000, "cue 2"),
    ]}


def test_webvtt_short_form_hours():
    assert parse_webvtt("WEBVTT\n\n01:02.500 --> 01:03.000\nshort") == [
        (1, 62_500, 63_000, "short"),
    ]


def test_webvtt_requires_signature():
    with pytest.raises(ValueError, match="WEBVTT"):
        parse_webvtt("1\n00:00:01.000 --> 00:00:02.000\nx")


def test_webvtt_bom_tolerated():
    assert parse_webvtt(
        "﻿WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nbom",
    ) == [(1, 1000, 2000, "bom")]


def test_matroska_subtitle_track_round_trip():
    mkv = encode_matroska_subtitles([
        (0, 2000, "mkv cue one"), (2500, 4000, "mkv cüe two"),
    ])
    assert parse_subtitles(mkv) == {"format": "mkv", "cues": [
        (1, 0, 2000, "mkv cue one"), (2, 2500, 4000, "mkv cüe two"),
    ]}


def test_matroska_without_subtitle_track_raises():
    from sed_binning_spark.pipeline.webm import encode_webm

    with pytest.raises(ValueError, match="no S_TEXT/UTF8"):
        parse_matroska_subtitles(encode_webm([b"x"], [0]))


def test_synthesizer_matches_parser(spark):
    docs = spark.createDataFrame(
        [(0, "alpha words"), (1, "beta words"), (2, "gamma words"),
         (3, None)],
        "doc_id long, text string",
    )
    media = synthesize_subtitle_media_from_text(docs)
    rows = sorted(
        extract_subtitle_cues(media).collect(),
        key=lambda r: (r.media_id, r.cue_index),
    )
    import hashlib

    h0 = hashlib.md5(b"alpha words").hexdigest()
    h1 = hashlib.md5(b"beta words").hexdigest()
    h2 = hashlib.md5(b"gamma words").hexdigest()
    # doc 0 (srt): start1 = 0, end1 = 2000, start2 = 2500, end2 = 4250
    # doc 1 (vtt): start1 = 500, end1 = 2750, start2 = 3250, end2 = 5000
    # doc 2 (ass): start1 = 1000, end1 = 3500, start2 = 4000, end2 = 5750
    assert [tuple(r) for r in rows] == [
        (0, "srt", 1, 0, 2000, h0[:16]),
        (0, "srt", 2, 2500, 4250, h0[16:]),
        (1, "vtt", 1, 500, 2750, h1[:16]),
        (1, "vtt", 2, 3250, 5000, h1[16:]),
        (2, "ass", 1, 1000, 3500, h2[:16]),
        (2, "ass", 2, 4000, 5750, h2[16:]),
    ]


def test_operator_degrades_bad_payloads(spark):
    df = spark.createDataFrame(
        [(0, bytearray(encode_srt([(0, 1000, "good")]))),
         (1, bytearray(b"\xff\xfe not utf8 not srt \x80\x80")),
         (2, None)],
        "media_id long, payload binary",
    )
    rows = extract_subtitle_cues(df).collect()
    assert [(r.media_id, r.text) for r in rows] == [(0, "good")]


# ---------------------------------------------------------------------------
# MP4 subtitle tracks (wvtt / tx3g)


@pytest.mark.parametrize("sample_type", [b"wvtt", b"tx3g"])
def test_mp4_subtitles_round_trip_with_gap(sample_type):
    from sed_binning_spark.pipeline.subtitles import encode_mp4_subtitles

    mp4 = encode_mp4_subtitles(
        [(0, 2000, "first cue"), (2500, 4000, "secönd cue")],
        sample_type=sample_type,
    )
    assert parse_subtitles(mp4) == {"format": "mp4", "cues": [
        (1, 0, 2000, "first cue"), (2, 2500, 4000, "secönd cue"),
    ]}


def test_mp4_subtitles_without_track_raises():
    from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg
    from sed_binning_spark.pipeline.subtitles import parse_mp4_subtitles

    video = encode_mp4_mjpeg([b"\xff\xd8 fake"], delays_ms=[40])
    with pytest.raises(ValueError, match="no subtitle track"):
        parse_mp4_subtitles(video)


def test_mp4_subtitles_overlapping_fixture_refuses():
    from sed_binning_spark.pipeline.subtitles import encode_mp4_subtitles

    with pytest.raises(ValueError, match="non-overlapping"):
        encode_mp4_subtitles([(0, 2000, "a"), (1000, 3000, "b")])


def test_fuzz_mp4_subtitles_raise_only_decode_errors():
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS
    from sed_binning_spark.pipeline.subtitles import encode_mp4_subtitles

    for st in (b"wvtt", b"tx3g"):
        blob = encode_mp4_subtitles([(0, 500, "cue")], sample_type=st)
        for at in range(len(blob)):
            for flip in (0xFF, 0x01):
                mutated = bytearray(blob)
                mutated[at] ^= flip
                try:
                    parse_subtitles(bytes(mutated))
                except _DECODE_ERRORS:
                    pass


def test_webvtt_noteworthy_identifier_is_a_cue():
    # 'NOTEworthy' is a legal cue identifier, not a comment — only the
    # whole-word NOTE/STYLE/REGION keywords open non-cue blocks
    assert parse_webvtt(
        "WEBVTT\n\nNOTEworthy\n00:00:01.000 --> 00:00:02.000\ntext",
    ) == [(1, 1000, 2000, "text")]


def test_matroska_skips_styled_track_for_the_utf8_one():
    # dual-mux files routinely carry a styled track (S_TEXT/ASS) next
    # to the plain-text one — the walk must pick the UTF8 track
    from sed_binning_spark.pipeline.webm import (
        _BLOCK, _BLOCK_DURATION, _BLOCK_GROUP, _CLUSTER,
        _CLUSTER_TIMESTAMP, _CODEC_ID, _INFO, _SEGMENT,
        _TIMESTAMP_SCALE, _TRACK_ENTRY, _TRACK_NUMBER, _TRACK_TYPE,
        _TRACKS, _elem, _uint_elem,
    )

    def track(num, codec):
        return _elem(_TRACK_ENTRY, (
            _uint_elem(_TRACK_NUMBER, num)
            + _uint_elem(_TRACK_TYPE, 0x11)
            + _elem(_CODEC_ID, codec)
        ))

    header = _elem(0x1A45DFA3, b"")
    info = _elem(_INFO, _uint_elem(_TIMESTAMP_SCALE, 1_000_000))
    tracks = _elem(_TRACKS, track(9, b"S_TEXT/ASS")
                   + track(1, b"S_TEXT/UTF8"))
    group = _elem(_BLOCK_GROUP, _elem(
        _BLOCK, b"\x81\x00\x00\x00" + b"plain cue",
    ) + _uint_elem(_BLOCK_DURATION, 1000))
    cluster = _elem(_CLUSTER, _uint_elem(_CLUSTER_TIMESTAMP, 0) + group)
    dual = header + _elem(_SEGMENT, info + tracks + cluster)
    assert parse_matroska_subtitles(dual) == [(1, 0, 1000, "plain cue")]


def test_matroska_styled_only_raises_naming_the_codec():
    from sed_binning_spark.pipeline.webm import (
        _CODEC_ID, _INFO, _SEGMENT, _TIMESTAMP_SCALE, _TRACK_ENTRY,
        _TRACK_NUMBER, _TRACK_TYPE, _TRACKS, _elem, _uint_elem,
    )

    header = _elem(0x1A45DFA3, b"")
    info = _elem(_INFO, _uint_elem(_TIMESTAMP_SCALE, 1_000_000))
    ass = _elem(_TRACK_ENTRY, (
        _uint_elem(_TRACK_NUMBER, 1)
        + _uint_elem(_TRACK_TYPE, 0x11)
        + _elem(_CODEC_ID, b"S_TEXT/ASS")
    ))
    blob = header + _elem(_SEGMENT, info + _elem(_TRACKS, ass))
    with pytest.raises(ValueError, match="S_TEXT/ASS"):
        parse_matroska_subtitles(blob)


def test_webvtt_cue_running_into_the_header_is_recovered():
    # spec-invalid but common: no blank line after the WEBVTT signature
    assert parse_webvtt(
        "WEBVTT\n00:00:01.000 --> 00:00:02.000\nfirst",
    ) == [(1, 1000, 2000, "first")]
    # identifier + cue both run in; header metadata lines never parse
    assert parse_webvtt(
        "WEBVTT\nc1\n00:00:01.000 --> 00:00:02.000\nfirst",
    ) == [(1, 1000, 2000, "first")]
    assert parse_webvtt(
        "WEBVTT\nKind: captions\nLanguage: en\n"
        "\n00:00:01.000 --> 00:00:02.000\nok",
    ) == [(1, 1000, 2000, "ok")]


# ---------------------------------------------------------------------------
# SSA/ASS


def test_ass_dialogue_round_trip():
    from sed_binning_spark.pipeline.subtitles import parse_ass

    doc = (
        "[Script Info]\nTitle: Fixture\n\n[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, "
        "MarginV, Effect, Text\n"
        "Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,"
        "{\\an8}First line\\NSecond line\n"
        "Dialogue: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,,"
        "Hard\\hspace, with comma\n"
    )
    assert parse_subtitles(doc.encode()) == {"format": "ass", "cues": [
        (1, 1500, 3250, "First line\nSecond line"),
        (2, 4000, 5000, "Hard space, with comma"),
    ]}
    # comments and styles sections never parse as dialogue
    assert parse_ass(doc.replace("[Events]", "[events]")) \
        == parse_ass(doc)


@pytest.mark.parametrize("doc,msg", [
    ("[Script Info]\n\n[Events]\n"
     "Dialogue: 0,0:00:01.00,0:00:02.00,D,,0,0,0,,x",
     "before the Events Format"),
    ("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n"
     "Dialogue: 0:00:01.00,0:00:02.00", "fewer fields"),
    ("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n"
     "Dialogue: bad,0:00:02.00,x", "not H:MM:SS.cc"),
    ("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n"
     "Dialogue: 0:00:02.00,0:00:01.00,x", "before it starts"),
    ("[Script Info]\n\n[Events]\nFormat: Layer, Text\n"
     "Dialogue: 0,x", "lacks Start/End/Text"),
])
def test_ass_malformed_raises(doc, msg):
    from sed_binning_spark.pipeline.subtitles import parse_ass

    with pytest.raises(ValueError, match=msg):
        parse_ass(doc)


# ---------------------------------------------------------------------------
# Matroska chapters


def test_matroska_chapters_round_trip():
    from sed_binning_spark.pipeline.subtitles import (
        add_matroska_chapters, parse_matroska_chapters,
    )
    from sed_binning_spark.pipeline.webm import (
        encode_webm, parse_webm_timeline,
    )

    mkv = encode_webm([b"a" * 4], [0], track_type=2, codec_id="A_OPUS")
    ch = add_matroska_chapters(
        mkv, [(0, 60000, "Öpening"), (60000, 180000, "Middle")],
    )
    assert parse_matroska_chapters(ch) == [
        (1, 0, 60000, "Öpening"), (2, 60000, 180000, "Middle"),
    ]
    assert parse_subtitles(ch)["format"] == "mkv-chapters"
    # the spliced Segment still demuxes
    assert parse_webm_timeline(ch, media="audio")["codec"] == "A_OPUS"


def test_matroska_subtitle_track_outranks_chapters():
    from sed_binning_spark.pipeline.subtitles import add_matroska_chapters

    both = add_matroska_chapters(
        encode_matroska_subtitles([(0, 1000, "sub")]), [(0, 500, "chap")],
    )
    assert parse_subtitles(both) == {
        "format": "mkv", "cues": [(1, 0, 1000, "sub")],
    }


def test_matroska_no_cues_anywhere_raises():
    from sed_binning_spark.pipeline.webm import encode_webm

    with pytest.raises(ValueError, match="no S_TEXT/UTF8"):
        parse_subtitles(encode_webm([b"a"], [0]))


def test_chapters_fallback_survives_a_styled_only_track():
    from sed_binning_spark.pipeline.subtitles import add_matroska_chapters
    from sed_binning_spark.pipeline.webm import (
        _CODEC_ID, _INFO, _SEGMENT, _TIMESTAMP_SCALE, _TRACK_ENTRY,
        _TRACK_NUMBER, _TRACK_TYPE, _TRACKS, _elem, _uint_elem,
    )

    header = _elem(0x1A45DFA3, b"")
    info = _elem(_INFO, _uint_elem(_TIMESTAMP_SCALE, 1_000_000))
    ass = _elem(_TRACK_ENTRY, (
        _uint_elem(_TRACK_NUMBER, 1)
        + _uint_elem(_TRACK_TYPE, 0x11)
        + _elem(_CODEC_ID, b"S_TEXT/ASS")
    ))
    styled_only = header + _elem(_SEGMENT, info + _elem(_TRACKS, ass))
    chaptered = add_matroska_chapters(
        styled_only, [(0, 60000, "Chapter A")],
    )
    assert parse_subtitles(chaptered) == {
        "format": "mkv-chapters",
        "cues": [(1, 0, 60000, "Chapter A")],
    }


def test_first_chapter_display_wins():
    from sed_binning_spark.pipeline.subtitles import (
        _MKV_CHAP_STRING, _MKV_CHAPTER_ATOM, _MKV_CHAPTER_DISPLAY,
        _MKV_CHAPTER_TIME_START, _MKV_CHAPTERS, _MKV_EDITION_ENTRY,
        parse_matroska_chapters,
    )
    from sed_binning_spark.pipeline.webm import (
        _SEGMENT, _elem, _uint_elem, encode_webm,
    )

    # two ChapterDisplays (default language first) — mkvmerge's shape
    atom = _elem(_MKV_CHAPTER_ATOM, (
        _uint_elem(_MKV_CHAPTER_TIME_START, 0)
        + _elem(_MKV_CHAPTER_DISPLAY,
                _elem(_MKV_CHAP_STRING, b"Default Title"))
        + _elem(_MKV_CHAPTER_DISPLAY,
                _elem(_MKV_CHAP_STRING, b"Titre Traduit"))
    ))
    base = encode_webm([b"x"], [0])
    from sed_binning_spark.pipeline.webm import _read_vint

    pos = 0
    eid, pos = _read_vint(base, pos, keep_marker=True)
    size, pos = _read_vint(base, pos, keep_marker=False)
    head = base[: pos + size]
    _eid2, p2 = _read_vint(base, pos + size, keep_marker=True)
    ssize, p2 = _read_vint(base, p2, keep_marker=False)
    seg_body = base[p2 : p2 + ssize]
    spliced = head + _elem(_SEGMENT, seg_body + _elem(
        _MKV_CHAPTERS, _elem(_MKV_EDITION_ENTRY, atom)))
    assert parse_matroska_chapters(spliced) == [
        (1, 0, 0, "Default Title"),
    ]
