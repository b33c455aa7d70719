"""Subtitle/caption cue extraction — the text half of a video training
pair. A crawled video corpus carries its transcript as SubRip (.srt)
sidecars, WebVTT (.vtt, the HTML5/HLS format), or muxed Matroska
S_TEXT/UTF8 tracks; all three are public grammars:

- **SubRip**: numbered blocks separated by blank lines — an integer
  index line, a ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing line (comma
  decimal separator; the widespread dot variant is accepted), then one
  or more text lines;
- **WebVTT** (W3C): the ``WEBVTT`` signature, ``NOTE``/``STYLE``/
  ``REGION`` blocks (skipped), optional cue identifier lines, timing
  lines with dot decimals and optional cue settings after the end
  time, ``MM:SS.mmm`` short-form hours;
- **Matroska subtitle tracks** (matroska.org): TrackType 0x11 with
  ``S_TEXT/UTF8`` — each block's payload IS the cue text, its start
  from cluster+block timestamps and its end from BlockDuration, via
  the same EBML walk as :mod:`~sed_binning_spark.pipeline.webm`;
- **ID3v2 chapters** (the id3.org Chapter Frame Addendum): podcast
  ``CHAP`` frames are timed text too — start/end ms + the embedded
  TIT2 title, dispatched when the payload leads with an ID3v2 tag.

Timing normalizes to integer milliseconds. Malformed cue structure
raises ValueError naming the defect (the media-tier posture); the
Spark operator catches per payload and degrades that payload to zero
rows, keeping the batch alive.

No counterpart exists in the reference repo (photoemission binning,
no media code); the grammar knowledge is the public specs above.
"""

from __future__ import annotations

import re

_TIME_RE = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})$",
)


def _parse_time(token: str) -> int:
    m = _TIME_RE.match(token.strip())
    if not m:
        raise ValueError(f"subtitle timestamp {token!r} is not "
                         f"[HH:]MM:SS.mmm")
    hh = int(m.group(1) or 0)
    mm, ss, ms = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if mm >= 60 or ss >= 60:
        raise ValueError(f"subtitle timestamp {token!r} has minutes or "
                         f"seconds >= 60")
    return ((hh * 60 + mm) * 60 + ss) * 1000 + ms


def _parse_timing_line(line: str) -> tuple[int, int, str]:
    """(start_ms, end_ms, settings) of a ``start --> end [settings]``
    line."""
    if "-->" not in line:
        raise ValueError(f"subtitle timing line {line!r} has no '-->'")
    left, _, rest = line.partition("-->")
    rest = rest.strip()
    parts = rest.split(None, 1)
    if not parts:
        raise ValueError(f"subtitle timing line {line!r} has no end time")
    start = _parse_time(left)
    end = _parse_time(parts[0])
    if end < start:
        raise ValueError(
            f"subtitle cue ends at {end} ms before it starts "
            f"at {start} ms",
        )
    return start, end, parts[1] if len(parts) > 1 else ""


def _blocks(text: str) -> list[list[str]]:
    out, cur = [], []
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if line.strip() == "":
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        out.append(cur)
    return out


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, text)`` cues of a SubRip document.
    The declared block index is reported (players renumber, but the
    declaration is what the file says); text lines join with
    newlines."""
    cues = []
    for block in _blocks(text.lstrip("﻿")):
        if len(block) < 2:
            raise ValueError(
                f"SubRip block {block!r} is too short for index + timing",
            )
        idx_line = block[0].strip()
        if not idx_line.isdigit():
            raise ValueError(
                f"SubRip block starts with {idx_line!r}, not an index",
            )
        start, end, _ = _parse_timing_line(block[1])
        cues.append((int(idx_line), start, end, "\n".join(block[2:])))
    return cues


def parse_webvtt(text: str) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, text)`` cues of a WebVTT document
    (index = 1-based cue position; WebVTT identifiers are free-form
    strings, so position is the stable handle). NOTE/STYLE/REGION
    blocks are skipped; cue settings after the end time are ignored."""
    body = text.lstrip("﻿")
    first, _, _rest = body.partition("\n")
    if not first.rstrip("\r").startswith("WEBVTT"):
        raise ValueError("WebVTT document does not start with WEBVTT")
    blocks = _blocks(body)
    todo = blocks
    if blocks and blocks[0][0].startswith("WEBVTT"):
        # the header block ends at the first blank line; a wild file
        # that omits that blank line runs cues into the header block —
        # recover them by splitting at every timing line (identifier
        # lines are not recoverable in this degraded shape: with no
        # blank lines they are indistinguishable from cue text, so the
        # cue starts AT its timing line)
        head = blocks[0]
        carried: list[list[str]] = []
        for i, ln in enumerate(head):
            if i > 0 and "-->" in ln:
                carried.append([ln])
            elif carried:
                carried[-1].append(ln)
        todo = carried + blocks[1:]
    cues = []
    n = 0
    for block in todo:
        head = block[0].strip()
        # a comment/metadata block is the KEYWORD alone or followed by
        # whitespace — 'NOTEworthy' is a legal cue identifier, not a
        # comment (WebVTT § comment block syntax)
        kw = head.split(None, 1)[0] if head else ""
        if kw in ("NOTE", "STYLE", "REGION"):
            continue
        if "-->" in block[0]:
            timing, text_lines = block[0], block[1:]
        elif len(block) >= 2 and "-->" in block[1]:
            timing, text_lines = block[1], block[2:]
        else:
            raise ValueError(
                f"WebVTT block {block[0]!r}... has no timing line",
            )
        start, end, _settings = _parse_timing_line(timing)
        n += 1
        cues.append((n, start, end, "\n".join(text_lines)))
    return cues


_ASS_TIME_RE = re.compile(r"(\d+):(\d{1,2}):(\d{1,2})\.(\d{2})$")
_ASS_OVERRIDE_RE = re.compile(r"\{[^}]*\}")


def _ass_time(token: str) -> int:
    m = _ASS_TIME_RE.match(token.strip())
    if not m:
        raise ValueError(f"ASS timestamp {token!r} is not H:MM:SS.cc")
    h, mm, ss, cc = (int(g) for g in m.groups())
    if mm >= 60 or ss >= 60:
        raise ValueError(f"ASS timestamp {token!r} has minutes or "
                         f"seconds >= 60")
    return ((h * 60 + mm) * 60 + ss) * 1000 + cc * 10


def parse_ass(text: str) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, text)`` cues of a SubStation Alpha
    (SSA/ASS) script: the ``[Events]`` section's ``Format:`` line names
    the fields, ``Dialogue:`` lines carry them comma-separated with
    the free-text field last. Style override blocks (``{\\...}``) are
    stripped; ``\\N``/``\\n`` are line breaks and ``\\h`` a hard
    space — the plain text is what a training pipeline wants."""
    in_events = False
    fields: list[str] | None = None
    cues: list[tuple[int, int, int, str]] = []
    n = 0
    for raw_line in text.lstrip("﻿").split("\n"):
        line = raw_line.rstrip("\r")
        s = line.strip()
        if s.startswith("[") and s.endswith("]"):
            in_events = s.lower() == "[events]"
            continue
        if not in_events or not s:
            continue
        key, _, rest = line.partition(":")
        key = key.strip().lower()
        if key == "format":
            fields = [f.strip().lower() for f in rest.split(",")]
        elif key == "dialogue":
            if fields is None:
                raise ValueError(
                    "ASS Dialogue line before the Events Format line",
                )
            parts = rest.split(",", len(fields) - 1)
            if len(parts) != len(fields):
                raise ValueError(
                    "ASS Dialogue line has fewer fields than Format "
                    "declares",
                )
            row = dict(zip(fields, parts))
            if "start" not in row or "end" not in row or "text" not in row:
                raise ValueError(
                    "ASS Format line lacks Start/End/Text fields",
                )
            start = _ass_time(row["start"])
            end = _ass_time(row["end"])
            if end < start:
                raise ValueError(
                    f"ASS cue ends at {end} ms before it starts at "
                    f"{start} ms",
                )
            body = _ASS_OVERRIDE_RE.sub("", row["text"])
            body = body.replace("\\N", "\n").replace("\\n", "\n") \
                .replace("\\h", " ")
            n += 1
            cues.append((n, start, end, body))
    return cues


def parse_matroska_subtitles(
    data: bytes,
) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, text)`` cues of a Matroska
    S_TEXT/UTF8 subtitle track: block payloads are the cue text,
    BlockDuration the extent (a duration-less block gets end =
    start — the container genuinely carries no extent)."""
    from sed_binning_spark.pipeline.webm import (
        _BLOCK,
        _BLOCK_DURATION,
        _BLOCK_GROUP,
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _CODEC_ID,
        _INFO,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _TIMESTAMP_SCALE,
        _TRACK_ENTRY,
        _TRACK_NUMBER,
        _TRACK_TYPE,
        _TRACKS,
        EBML_MAGIC,
        _iter_elements,
        _read_uint_vint,
        _uint,
    )

    if data[:4] != EBML_MAGIC:
        raise ValueError("not an EBML (WebM/Matroska) stream")
    segment = None
    for eid, s, e in _iter_elements(data, 0, len(data),
                                    allow_unknown=True):
        if eid == _SEGMENT:
            segment = (s, len(data) if e is None else e)
            break
    if segment is None:
        raise ValueError("EBML stream has no Segment")
    scale_ns = 1_000_000
    sub_track = None
    skipped_codecs: list[str] = []
    cues: list[tuple[int, int, int, str]] = []
    n = 0

    def _one_block(s2: int, e2: int, cluster_ts: int, dur_ms):
        nonlocal n
        track, p = _read_uint_vint(data, s2)
        if p + 3 > e2:
            raise ValueError("Matroska block shorter than its fixed "
                             "header")
        if track != sub_track:
            return
        # fixed 2-byte signed relative timestamp + flags byte
        rel = int.from_bytes(data[p : p + 2], "big", signed=True)
        flags = data[p + 2]
        p += 3
        if flags & 0x06:
            raise ValueError(
                "laced subtitle blocks are not written by any known "
                "muxer — refusing rather than joining cue fragments",
            )
        start = (cluster_ts + rel) * scale_ns // 1_000_000
        text = data[p:e2].decode("utf-8")
        n += 1
        cues.append((
            n, start, start + (dur_ms if dur_ms is not None else 0),
            text,
        ))

    for eid, s, e in _iter_elements(data, *segment):
        if eid == _INFO:
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 == _TIMESTAMP_SCALE:
                    scale_ns = _uint(data, s2, e2, default=1_000_000)
        elif eid == _TRACKS:
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 != _TRACK_ENTRY:
                    continue
                num = ttype = None
                codec = ""
                for i3, s3, e3 in _iter_elements(data, s2, e2):
                    if i3 == _TRACK_NUMBER:
                        num = _uint(data, s3, e3)
                    elif i3 == _TRACK_TYPE:
                        ttype = _uint(data, s3, e3)
                    elif i3 == _CODEC_ID:
                        codec = data[s3:e3].decode("ascii", "replace")
                if ttype == 0x11:
                    # first PLAIN-TEXT subtitle track wins; styled
                    # forms (S_TEXT/ASS, ...) are skipped — dual-mux
                    # files routinely carry both
                    if codec == "S_TEXT/UTF8" and sub_track is None:
                        sub_track = num
                    elif codec != "S_TEXT/UTF8":
                        skipped_codecs.append(codec)
        elif eid == _CLUSTER:
            if sub_track is None:
                continue
            cluster_ts = 0
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 == _CLUSTER_TIMESTAMP:
                    cluster_ts = _uint(data, s2, e2)
                elif i2 == _SIMPLE_BLOCK:
                    _one_block(s2, e2, cluster_ts, None)
                elif i2 == _BLOCK_GROUP:
                    blk = dur = None
                    for i3, s3, e3 in _iter_elements(data, s2, e2):
                        if i3 == _BLOCK:
                            blk = (s3, e3)
                        elif i3 == _BLOCK_DURATION:
                            dur = (_uint(data, s3, e3) * scale_ns
                                   // 1_000_000)
                    if blk is not None:
                        _one_block(*blk, cluster_ts, dur)
    if sub_track is None:
        if skipped_codecs:
            raise ValueError(
                f"Matroska subtitle track(s) {skipped_codecs} are not "
                f"the plain-text S_TEXT/UTF8 form",
            )
        raise ValueError("Matroska stream has no S_TEXT/UTF8 "
                         "subtitle track")
    return cues


def parse_mp4_subtitles(data: bytes) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, text)`` cues of an MP4 subtitle
    track — WebVTT-in-MP4 (ISO 14496-30 ``wvtt``: each sample carries
    ``vttc`` cue boxes with ``payl`` text; ``vtte`` marks an explicit
    gap) or 3GPP timed text (``tx3g``: a 2-byte length + UTF-8 text
    per sample, zero length = gap), under a ``text``/``sbtl``/``subt``
    handler. Timing is the track's own stts walk; cue end = start +
    sample duration (the ISO model: a subtitle sample spans its
    duration)."""
    from sed_binning_spark.pipeline.mp4 import (
        _all_sample_rows,
        _find,
        _iter_boxes,
        _media_tracks,
    )

    found = None
    for handler in (b"text", b"sbtl", b"subt"):
        for sd_type, _a, _b, timescale, tables in _media_tracks(
                data, handler):
            found = (sd_type, timescale, tables)
            break
        if found:
            break
    if found is None:
        raise ValueError(
            "MP4 has no subtitle track (text/sbtl/subt handler)",
        )
    sd_type, timescale, tables = found
    cues: list[tuple[int, int, int, str]] = []
    n = 0
    if sd_type == b"wvtt":
        for start, delay, pos, size, _kf in _all_sample_rows(
                data, tables, timescale, None):
            for t, s, e in _iter_boxes(data, pos, pos + size):
                if t == b"vttc":
                    payl = _find(data, s, e, b"payl")
                    if payl is None:
                        raise ValueError(
                            "WebVTT cue box without its payl text",
                        )
                    n += 1
                    cues.append((
                        n, start, start + (delay or 0),
                        data[payl[0] : payl[1]].decode("utf-8"),
                    ))
                # vtte: explicit empty sample — no cue
    elif sd_type == b"tx3g":
        for start, delay, pos, size, _kf in _all_sample_rows(
                data, tables, timescale, None):
            if size < 2:
                raise ValueError(
                    "tx3g sample shorter than its 2-byte length field",
                )
            ln = int.from_bytes(data[pos : pos + 2], "big")
            if 2 + ln > size:
                raise ValueError("tx3g text overruns its sample")
            if ln:
                n += 1
                cues.append((
                    n, start, start + (delay or 0),
                    data[pos + 2 : pos + 2 + ln].decode("utf-8"),
                ))
    else:
        raise ValueError(
            f"subtitle sample entry {sd_type!r} is not wvtt/tx3g",
        )
    return cues


_MKV_CHAPTERS = 0x1043A770
_MKV_EDITION_ENTRY = 0x45B9
_MKV_CHAPTER_ATOM = 0xB6
_MKV_CHAPTER_TIME_START = 0x91
_MKV_CHAPTER_TIME_END = 0x92
_MKV_CHAPTER_DISPLAY = 0x80
_MKV_CHAP_STRING = 0x85


def parse_matroska_chapters(
    data: bytes,
) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, title)`` chapters of a Matroska
    ``Chapters`` element (matroska.org): EditionEntry → ChapterAtom
    with nanosecond ChapterTimeStart/End and the ChapterDisplay's
    ChapString title. An atom without a ChapterTimeEnd gets end =
    start (the container genuinely declares no extent). Chapters sort
    by start time; ``[]`` when the stream has no Chapters element."""
    from sed_binning_spark.pipeline.webm import (
        _SEGMENT,
        EBML_MAGIC,
        _iter_elements,
        _uint,
    )

    if data[:4] != EBML_MAGIC:
        raise ValueError("not an EBML (WebM/Matroska) stream")
    segment = None
    for eid, s, e in _iter_elements(data, 0, len(data),
                                    allow_unknown=True):
        if eid == _SEGMENT:
            segment = (s, len(data) if e is None else e)
            break
    if segment is None:
        raise ValueError("EBML stream has no Segment")
    chapters = []
    for eid, s, e in _iter_elements(data, *segment):
        if eid != _MKV_CHAPTERS:
            continue
        for i2, s2, e2 in _iter_elements(data, s, e):
            if i2 != _MKV_EDITION_ENTRY:
                continue
            for i3, s3, e3 in _iter_elements(data, s2, e2):
                if i3 != _MKV_CHAPTER_ATOM:
                    continue
                start = end = None
                title = ""
                saw_display = False
                for i4, s4, e4 in _iter_elements(data, s3, e3):
                    if i4 == _MKV_CHAPTER_TIME_START:
                        start = _uint(data, s4, e4)
                    elif i4 == _MKV_CHAPTER_TIME_END:
                        end = _uint(data, s4, e4)
                    elif i4 == _MKV_CHAPTER_DISPLAY and not saw_display:
                        # the FIRST ChapterDisplay is the default
                        # language (the shape mkvmerge writes)
                        saw_display = True
                        for i5, s5, e5 in _iter_elements(data, s4, e4):
                            if i5 == _MKV_CHAP_STRING:
                                title = data[s5:e5].decode("utf-8")
                                break
                if start is None:
                    raise ValueError(
                        "ChapterAtom without its ChapterTimeStart",
                    )
                if end is not None and end < start:
                    raise ValueError(
                        "ChapterAtom ends before it starts",
                    )
                chapters.append((
                    start // 1_000_000,
                    (end if end is not None else start) // 1_000_000,
                    title,
                ))
    chapters.sort(key=lambda c: c[0])
    return [(i + 1, s, e, t) for i, (s, e, t) in enumerate(chapters)]


def add_matroska_chapters(
    mkv: bytes, chapters: list[tuple[int, int, str]],
) -> bytes:
    """Splice a ``Chapters`` element (one EditionEntry of
    ChapterAtoms) into a Matroska stream from ``(start_ms, end_ms,
    title)`` triples — the fixture builder twin of
    :func:`parse_matroska_chapters`."""
    from sed_binning_spark.pipeline.webm import (
        _SEGMENT,
        _elem,
        _read_vint,
        _uint_elem,
    )

    if mkv[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML (WebM/Matroska) stream")
    atoms = b""
    for start, end, title in chapters:
        atoms += _elem(_MKV_CHAPTER_ATOM, (
            _uint_elem(_MKV_CHAPTER_TIME_START, start * 1_000_000)
            + _uint_elem(_MKV_CHAPTER_TIME_END, end * 1_000_000)
            + _elem(_MKV_CHAPTER_DISPLAY, _elem(
                _MKV_CHAP_STRING, title.encode("utf-8")))
        ))
    chap_elem = _elem(_MKV_CHAPTERS, _elem(_MKV_EDITION_ENTRY, atoms))
    out = b""
    pos = 0
    while pos < len(mkv):
        eid, pos = _read_vint(mkv, pos, keep_marker=True)
        size, pos = _read_vint(mkv, pos, keep_marker=False)
        if size is None:
            raise ValueError("fixture splice wants explicit sizes")
        body = mkv[pos : pos + size]
        pos += size
        if eid == _SEGMENT:
            body += chap_elem
        out += _elem(eid, body)
    return out


def parse_subtitles(data: bytes) -> dict:
    """``{"format": str, "cues": [(index, start_ms, end_ms, text),
    ...]}`` of a subtitle payload, dispatched on its magic: WebVTT
    signature → "vtt", EBML magic → "mkv" (S_TEXT/UTF8 track), ISO
    BMFF → "mp4" (wvtt/tx3g track), else SubRip → "srt"."""
    if data[:4] == b"\x1aE\xdf\xa3":
        try:
            return {
                "format": "mkv", "cues": parse_matroska_subtitles(data),
            }
        except ValueError as exc:
            # no usable subtitle track (absent, or styled-only) — a
            # Chapters element is timed text too; a stream with
            # neither re-raises the original refusal
            cues = parse_matroska_chapters(data)
            if not cues:
                raise exc
            return {"format": "mkv-chapters", "cues": cues}
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return {"format": "mp4", "cues": parse_mp4_subtitles(data)}
    if data[:3] == b"ID3":
        # a chaptered podcast: CHAP titles are timed text too
        from sed_binning_spark.pipeline.tags import parse_id3v2_chapters

        return {"format": "id3", "cues": parse_id3v2_chapters(data)}
    text = data.decode("utf-8")
    stripped = text.lstrip("﻿")
    if not stripped.strip():
        # an empty payload is a crawl defect, not a zero-cue SubRip
        raise ValueError("empty subtitle payload")
    if stripped.startswith("WEBVTT"):
        return {"format": "vtt", "cues": parse_webvtt(text)}
    if stripped.lower().startswith("[script info]"):
        return {"format": "ass", "cues": parse_ass(text)}
    return {"format": "srt", "cues": parse_srt(text)}


def extract_subtitle_cues(
    df,
    payload_column: str = "payload",
    id_column: str = "media_id",
):
    """One row per subtitle cue of each payload — ``(media_id, format,
    cue_index, start_ms, end_ms, text)``. The caption-mining operator:
    cue text is THE transcript half of a video/text training pair.

    Distribution shape: one ``mapInPandas`` stage, Arrow-batched,
    partition-local, no shuffle, no driver collect. Subtitle files are
    small (kilobytes per hour of video), so per-payload work is
    trivially bounded; a payload that fails to parse degrades to zero
    rows, keeping the batch alive."""
    import pandas as pd

    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    schema = (f"{id_column} long, format string, cue_index int, "
              f"start_ms long, end_ms long, text string")

    def _batches(batches):
        for pdf in batches:
            rows = []
            # parse each DISTINCT payload once per batch: the cue list is
            # a pure function of the bytes (dedup-before-decode; the memo
            # dies with the batch, so memory stays bounded)
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    continue
                b = bytes(payload)
                tail = memo.get(b)
                if tail is None:
                    try:
                        got = parse_subtitles(b)
                        tail = [
                            (got["format"], idx, start, end, text)
                            for idx, start, end, text in got["cues"]
                        ]
                    except _DECODE_ERRORS:
                        tail = []
                    memo[b] = tail
                rows.extend((mid, *t) for t in tail)
            yield pd.DataFrame(rows, columns=[
                id_column, "format", "cue_index", "start_ms",
                "end_ms", "text",
            ])

    return df.mapInPandas(_batches, schema=schema)


def synthesize_subtitle_media_from_text(
    df,
    text_column: str = "text",
    id_column: str = "doc_id",
):
    """Expression-built subtitle fixture: each document becomes a
    two-cue SubRip (id % 3 == 0), WebVTT (== 1), or SSA/ASS (== 2)
    payload whose cue text is the md5 digest of the document text
    split in half (16 hex chars each) and whose timing is closed-form
    in the id — start1 = (id % 10)·500, end1 = start1 + 2000 +
    (id % 3)·250, start2 = end1 + 500, end2 = start2 + 1750 (all
    under a minute and multiples of 10 ms, so hour/minute fields are
    literal zeros and the ASS centiseconds are exact). The WebVTT
    side leads with a NOTE block, a cue identifier on cue 1, and
    settings after its end time; the ASS side carries a style
    override block (``{\\an8}``) the parser must strip — grammar the
    parsers must skip/normalize. NULL text maps to a NULL payload.
    Every cue fact is regenerable by any md5-capable SQL engine; no
    Python runs in this synthesis."""
    from pyspark.sql import functions as F

    did = F.col(id_column)
    start1 = (did % 10) * 500
    end1 = start1 + 2000 + (did % 3) * 250
    start2 = end1 + 500
    end2 = start2 + 1750
    text1 = F.substring(F.md5(F.col(text_column)), 1, 16)
    text2 = F.substring(F.md5(F.col(text_column)), 17, 16)

    def ts(ms, sep):
        return F.format_string(
            f"00:00:%02d{sep}%03d",
            (ms / 1000).cast("int"), (ms % 1000).cast("int"),
        )

    srt = F.concat(
        F.lit("1\n"), ts(start1, ","), F.lit(" --> "), ts(end1, ","),
        F.lit("\n"), text1, F.lit("\n\n"),
        F.lit("2\n"), ts(start2, ","), F.lit(" --> "), ts(end2, ","),
        F.lit("\n"), text2, F.lit("\n"),
    )
    vtt = F.concat(
        F.lit("WEBVTT\n\nNOTE synthesized fixture\n\n"),
        F.lit("c1\n"), ts(start1, "."), F.lit(" --> "), ts(end1, "."),
        F.lit(" align:start\n"), text1, F.lit("\n\n"),
        ts(start2, "."), F.lit(" --> "), ts(end2, "."),
        F.lit("\n"), text2, F.lit("\n"),
    )

    def ats(ms):
        return F.format_string(
            "0:00:%02d.%02d",
            (ms / 1000).cast("int"), ((ms % 1000) / 10).cast("int"),
        )

    ass = F.concat(
        F.lit("[Script Info]\nTitle: synthesized fixture\n\n[Events]\n"
              "Format: Layer, Start, End, Style, Text\n"
              "Dialogue: 0,"),
        ats(start1), F.lit(","), ats(end1),
        F.lit(",Default,{\\an8}"), text1,
        F.lit("\nDialogue: 0,"),
        ats(start2), F.lit(","), ats(end2),
        F.lit(",Default,"), text2, F.lit("\n"),
    )
    payload = F.when(
        F.col(text_column).isNotNull(),
        F.encode(
            F.when(did % 3 == 0, srt)
            .when(did % 3 == 1, vtt)
            .otherwise(ass),
            "UTF-8",
        ),
    )
    return df.select(
        did.cast("long").alias("media_id"),
        payload.alias("payload"),
    )


# ---------------------------------------------------------------------------
# fixture builders

def encode_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """A SubRip document from ``(start_ms, end_ms, text)`` cues,
    indices 1-based."""
    def _t(ms: int) -> str:
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    blocks = [
        f"{i + 1}\n{_t(start)} --> {_t(end)}\n{text}"
        for i, (start, end, text) in enumerate(cues)
    ]
    return ("\n\n".join(blocks) + "\n").encode("utf-8")


def encode_webvtt(
    cues: list[tuple[int, int, str]],
    note: str | None = None,
    identifiers: bool = False,
    settings: str = "",
) -> bytes:
    """A WebVTT document from ``(start_ms, end_ms, text)`` cues."""
    def _t(ms: int) -> str:
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"

    parts = ["WEBVTT"]
    if note is not None:
        parts.append(f"NOTE {note}")
    for i, (start, end, text) in enumerate(cues):
        timing = f"{_t(start)} --> {_t(end)}"
        if settings:
            timing += f" {settings}"
        cue = f"c{i + 1}\n{timing}\n{text}" if identifiers \
            else f"{timing}\n{text}"
        parts.append(cue)
    return ("\n\n".join(parts) + "\n").encode("utf-8")


def encode_mp4_subtitles(
    cues: list[tuple[int, int, str]],
    sample_type: bytes = b"wvtt",
    timescale: int = 1000,
) -> bytes:
    """An MP4 with one subtitle track from ``(start_ms, end_ms, text)``
    cues (non-overlapping, ascending): wvtt samples are ``vttc(payl)``
    boxes with ``vtte`` gap fillers; tx3g samples are 2-byte-length
    text with zero-length gap fillers."""
    from sed_binning_spark.pipeline.mp4 import _box, encode_mp4_mjpeg

    if sample_type not in (b"wvtt", b"tx3g"):
        raise ValueError("fixture supports wvtt / tx3g sample entries")
    samples, delays = [], []
    t = 0
    for start, end, text in cues:
        if start < t or end < start:
            raise ValueError("fixture cues must be ascending and "
                             "non-overlapping")
        raw = text.encode("utf-8")
        if start > t:  # explicit gap sample
            samples.append(_box(b"vtte", b"")
                           if sample_type == b"wvtt" else b"\x00\x00")
            delays.append(start - t)
        if sample_type == b"wvtt":
            samples.append(_box(b"vttc", _box(b"payl", raw)))
        else:
            samples.append(len(raw).to_bytes(2, "big") + raw)
        delays.append(end - start)
        t = end
    return encode_mp4_mjpeg(
        samples, delays, timescale=timescale,
        sample_type=sample_type, handler=b"text",
    )


def encode_matroska_subtitles(
    cues: list[tuple[int, int, str]],
    timescale_ms: int = 1,
) -> bytes:
    """A Matroska stream with one S_TEXT/UTF8 subtitle track: each cue
    is a BlockGroup whose Block payload is the UTF-8 text and whose
    BlockDuration is the cue extent."""
    from sed_binning_spark.pipeline.webm import (
        _BLOCK,
        _BLOCK_DURATION,
        _BLOCK_GROUP,
        _CLUSTER,
        _CLUSTER_TIMESTAMP,
        _CODEC_ID,
        _INFO,
        _SEGMENT,
        _TIMESTAMP_SCALE,
        _TRACK_ENTRY,
        _TRACK_NUMBER,
        _TRACK_TYPE,
        _TRACKS,
        _elem,
        _uint_elem,
    )

    header = _elem(0x1A45DFA3, b"")
    info = _elem(_INFO, _uint_elem(_TIMESTAMP_SCALE, 1_000_000))
    track = _elem(_TRACKS, _elem(_TRACK_ENTRY, (
        _uint_elem(_TRACK_NUMBER, 1)
        + _uint_elem(_TRACK_TYPE, 0x11)
        + _elem(_CODEC_ID, b"S_TEXT/UTF8")
    )))
    clusters = b""
    for start, end, text in cues:
        # track-1 vint, 2-byte zero relative timestamp, zero flags
        block = _elem(
            _BLOCK, b"\x81\x00\x00\x00" + text.encode("utf-8"),
        )
        group = _elem(_BLOCK_GROUP, block
                      + _uint_elem(_BLOCK_DURATION, end - start))
        clusters += _elem(_CLUSTER,
                          _uint_elem(_CLUSTER_TIMESTAMP, start) + group)
    return header + _elem(_SEGMENT, info + track + clusters)
