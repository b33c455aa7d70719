"""Property-based round trips for the tag and subtitle grammars: the
builders and parsers are independent inverse implementations, so
random inputs through encode→parse must come back exactly. Mirrors
the repo's hypothesis strategy for the binning/codec tiers."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sed_binning_spark.pipeline.subtitles import (
    encode_srt,
    encode_webvtt,
    parse_srt,
    parse_webvtt,
)
from sed_binning_spark.pipeline.tags import (
    encode_id3v2,
    encode_vorbis_comment_block,
    parse_id3v2,
    parse_vorbis_comments,
)

# cue/tag text: printable, no control chars; at least one non-space
_line_text = st.text(
    st.characters(blacklist_categories=("Cc", "Cs")),
    min_size=1, max_size=60,
).filter(lambda s: s.strip() == s and s.strip())

_latin1_text = st.text(
    st.characters(min_codepoint=0x20, max_codepoint=0xFF),
    min_size=1, max_size=60,
).filter(lambda s: s.strip() == s and s.strip())


@st.composite
def _cue_lists(draw):
    n = draw(st.integers(1, 5))
    cues, t = [], 0
    for _ in range(n):
        t += draw(st.integers(0, 5_000))
        dur = draw(st.integers(1, 10_000))
        cues.append((t, t + dur, draw(_line_text)))
        t += dur
    return cues


@settings(max_examples=60, deadline=None)
@given(_cue_lists())
def test_srt_round_trips_random_cues(cues):
    assert parse_srt(encode_srt(cues).decode("utf-8")) == [
        (i + 1, s, e, t) for i, (s, e, t) in enumerate(cues)
    ]


@settings(max_examples=60, deadline=None)
@given(_cue_lists(), st.booleans(), st.booleans())
def test_webvtt_round_trips_random_cues(cues, identifiers, with_note):
    vtt = encode_webvtt(
        cues, note="property" if with_note else None,
        identifiers=identifiers,
    )
    assert parse_webvtt(vtt.decode("utf-8")) == [
        (i + 1, s, e, t) for i, (s, e, t) in enumerate(cues)
    ]


@settings(max_examples=60, deadline=None)
@given(st.lists(_latin1_text, min_size=1, max_size=5),
       st.sampled_from([3, 4]))
def test_id3v2_text_frames_round_trip_random_text(texts, version):
    frames = [("TIT2", t) for t in texts]
    got, end = parse_id3v2(encode_id3v2(frames, version=version))
    blob = encode_id3v2(frames, version=version)
    assert end == len(blob)
    assert [v for _k, v in got] == texts


@settings(max_examples=60, deadline=None)
@given(st.lists(_line_text, min_size=1, max_size=4))
def test_id3v23_unsync_round_trips_random_latin1(texts):
    # constrain to latin-1 so the encoder picks the 0xFF-capable path
    texts = [t.encode("utf-8").decode("latin-1") for t in texts]
    frames = [("TIT2", t) for t in texts]
    got, _ = parse_id3v2(encode_id3v2(frames, version=3, unsync=True))
    assert [v for _k, v in got] == texts


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.tuples(
        st.text(st.sampled_from("abcdefghijklmnopqrstuvwxyz_"),
                min_size=1, max_size=12)
        .filter(lambda k: k != "metadata_block_picture"),
        _line_text,
    ),
    min_size=0, max_size=6,
))
def test_vorbis_comments_round_trip_random_pairs(pairs):
    got = parse_vorbis_comments(encode_vorbis_comment_block(pairs))
    assert got == [(k.lower(), v) for k, v in pairs]


_ascii_key = st.text(
    st.sampled_from("abcdefghijklmnopqrstuvwxyz_"),
    min_size=1, max_size=16,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_ascii_key, _line_text), min_size=1,
                max_size=4))
def test_matroska_tags_round_trip_random_pairs(pairs):
    # keys stay ASCII: the splicer writes registry-convention UPPERCASE
    # names and the parser lowercases, a round trip only ASCII keys
    # survive (ı→I→i is a Unicode casefold artifact, not a defect)
    from sed_binning_spark.pipeline.tags import (
        add_matroska_tags, parse_media_tags,
    )
    from sed_binning_spark.pipeline.webm import encode_webm

    mkv = add_matroska_tags(encode_webm([b"x"], [0]), pairs)
    got = parse_media_tags(mkv)
    assert got["container"] == "webm"
    assert got["tags"] == [(k.lower(), v) for k, v in pairs]
