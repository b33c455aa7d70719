"""Minimal MP4 (ISO BMFF, ISO/IEC 14496-12) demuxing for the video
frame-sampling path: enough of the box structure to enumerate a video
track's samples with their CONTAINER timing, so
:func:`~sed_binning_spark.pipeline.multimodal.sample_frames` can decode
Motion-JPEG-in-MP4 payloads with the same pure-stdlib posture as the
image codecs (no av library exists in this environment; an ffmpeg/PyAV
demuxer drops into the same seam).

What is implemented, all from the public spec:

- box walk (32-bit and 64-bit ``largesize`` boxes), ``moov → trak →
  mdia → {mdhd, hdlr, minf → stbl}``;
- sample tables: ``stsd`` (sample-description entry type), ``stts``
  (decoding deltas → per-sample start/delay in ms via the ``mdhd``
  timescale), ``stsz`` and the compact ``stz2`` (4/8/16-bit), ``stsc``
  (sample→chunk runs), ``stco``/``co64`` (chunk offsets), ``ctts``
  (composition offsets, v0 unsigned / v1 signed — B-frame reordering:
  reported ``start_ms`` is the PRESENTATION time, rows stay in decode
  order), and the common ``edts/elst`` shapes (leading empty edits
  delay the track; one rate-1 edit shifts by −media_time; anything
  fancier refuses loudly);
- :func:`parse_mp4_samples` returns the FIRST video track whose
  sample-description type is a JPEG flavor (``jpeg``/``mjpa``/``mjpb``
  — the Motion-JPEG-in-MP4 forms) as ``(start_ms, delay_ms, bytes)``
  triples. Tracks in other codecs (avc1/hev1/...) are refused loudly:
  emitting fake statistics from compressed bitstreams would be
  dishonest, and this environment ships no H.264 decoder.
- :func:`parse_mp4_timeline` — the metadata-only mode for those real
  codecs: the first video track of ANY sample type as container-timing
  rows (start/delay/byte extent/stss keyframe flag) plus the
  VisualSampleEntry dimensions, no payload decode. Real corpora are
  mostly H.264; their timelines are still first-class data.
- :func:`encode_mp4_mjpeg` — spec-built fixture writer (ftyp + mdat +
  a single-trak moov; any sample 4CC, optional stss), since no video
  corpus ships in this container.

Malformed framing raises ValueError naming the defect, like every codec
in :mod:`~sed_binning_spark.pipeline.multimodal`; the Spark operator
catches and degrades per its documented posture.

No reference counterpart (LLM-curation extension surface, like
pipeline.warc / pipeline.multimodal).
"""

from __future__ import annotations

import struct

_JPEG_SAMPLE_TYPES = (b"jpeg", b"mjpa", b"mjpb")


def _iter_boxes_full(data: bytes, pos: int, end: int):
    """Yield (type, box_start, payload_start, payload_end) for the
    boxes in data[pos:end] — handles 64-bit largesize and size-0 (to
    end). box_start is the first byte of the box header (what the
    fragment spec means by 'the first byte of the moof')."""
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(
                f"MP4 box {btype!r} declares {size} bytes, "
                f"{end - pos} available",
            )
        yield btype, pos, pos + header, pos + size
        pos += size


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) — see _iter_boxes_full."""
    for btype, _start, ps, pe in _iter_boxes_full(data, pos, end):
        yield btype, ps, pe


def _find(data: bytes, pos: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(data, pos, end):
        if t == btype:
            return s, e
    return None


def _full_box(data: bytes, pos: int) -> tuple[int, int]:
    """(version, flags) of a full box; payload starts at pos + 4."""
    v = data[pos]
    flags = int.from_bytes(data[pos + 1 : pos + 4], "big")
    return v, flags


def _video_tracks(data: bytes):
    """Video tracks — see :func:`_media_tracks`."""
    return _media_tracks(data, b"vide")


def _media_tracks(data: bytes, handler: bytes):
    """Yield ``(sd_type, dim1, dim2, timescale, tables)`` for each trak
    of the moov whose hdlr matches ``handler`` (b"vide"/b"soun"), in
    file order — the shared walk under both the payload demuxer and the
    metadata-only timeline. For video tracks dim1/dim2 are the
    VisualSampleEntry width/height; for audio tracks the
    AudioSampleEntry channel count and sample rate. ``tables`` is
    the stbl box index plus two trak-level extras when present: the
    ``elst`` span (edit list, from trak→edts) and the movie timescale
    (``b"mvhd-ts"``, needed to convert empty-edit durations)."""
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) stream")
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    movie_ts = None
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    if mvhd is not None:
        mv, _ = _full_box(data, mvhd[0])
        movie_ts = struct.unpack_from(
            ">I", data, mvhd[0] + 4 + (16 if mv == 1 else 8),
        )[0]
    # fragmented-movie defaults: mvex→trex per track (duration, size,
    # flags), consumed by the moof/traf/trun walk
    trexes: dict[int, tuple[int, int, int]] = {}
    mvex = _find(data, moov[0], moov[1], b"mvex")
    if mvex is not None:
        for t2, s2, e2 in _iter_boxes(data, mvex[0], mvex[1]):
            if t2 == b"trex" and s2 + 24 <= e2:
                tid, _sdi, ddur, dsz, dfl = struct.unpack_from(
                    ">IIIII", data, s2 + 4,
                )
                trexes[tid] = (ddur, dsz, dfl)
    for t, s, e in _iter_boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != handler:
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if mdhd is None or minf is None:
            raise ValueError("MP4 video trak lacks mdhd/minf")
        v, _ = _full_box(data, mdhd[0])
        # timescale sits after creation/modification times (4/8 bytes
        # each by version)
        ts_off = mdhd[0] + 4 + (16 if v == 1 else 8)
        timescale = struct.unpack_from(">I", data, ts_off)[0]
        if timescale == 0:
            raise ValueError("MP4 mdhd declares a zero timescale")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("MP4 video trak lacks stbl")
        tables = {
            t2: (s2, e2)
            for t2, s2, e2 in _iter_boxes(data, stbl[0], stbl[1])
        }
        edts = _find(data, s, e, b"edts")
        if edts is not None:
            elst = _find(data, edts[0], edts[1], b"elst")
            if elst is not None:
                tables[b"elst"] = elst
        if movie_ts:
            tables[b"mvhd-ts"] = movie_ts
        tkhd = _find(data, s, e, b"tkhd")
        if tkhd is not None:
            tv, _ = _full_box(data, tkhd[0])
            tid = struct.unpack_from(
                ">I", data, tkhd[0] + 4 + (16 if tv == 1 else 8),
            )[0]
            tables[b"trak-id"] = tid
            if tid in trexes:
                tables[b"trex"] = trexes[tid]
        stsd = tables.get(b"stsd")
        if stsd is None:
            raise ValueError("MP4 stbl lacks stsd")
        # first sample-description entry: type at offset +4 of the entry
        sd_pos = stsd[0] + 8  # full box header + entry count
        if sd_pos + 8 > stsd[1]:
            raise ValueError("MP4 stsd has no entries")
        sd_type = data[sd_pos + 4 : sd_pos + 8]
        dim1 = dim2 = 0
        if handler == b"vide":
            # VisualSampleEntry dims: 8 (SampleEntry) + 6 reserved +
            # 2 dref + 16 pre_defined/reserved, then width/height (ISO
            # 14496-12 §12.1.3) — 0/0 when the entry is too short
            if sd_pos + 36 <= stsd[1]:
                dim1, dim2 = struct.unpack_from(">HH", data, sd_pos + 32)
        else:
            # AudioSampleEntry: 8 (SampleEntry) + 6 reserved + 2 dref +
            # 8 reserved, then channelcount(2) samplesize(2)
            # pre_defined(2) reserved(2) samplerate(16.16 fixed) (ISO
            # 14496-12 §12.2.3)
            if sd_pos + 36 <= stsd[1]:
                dim1 = struct.unpack_from(">H", data, sd_pos + 24)[0]
                dim2 = struct.unpack_from(">I", data, sd_pos + 32)[0] >> 16
        yield sd_type, dim1, dim2, timescale, tables


def parse_mp4_samples(
    data: bytes,
    max_frames: int | None = None,
) -> list[tuple[int, int, bytes]]:
    """Demux the first Motion-JPEG video track of an MP4 into
    ``(start_ms, delay_ms, jpeg_bytes)`` triples using the container's
    own sample tables (stts timing at mdhd timescale; stsc/stco/stsz
    chunk layout). Raises ValueError for non-MP4 bytes, files without a
    JPEG-flavor video track (including H.264/H.265 — no decoder ships
    here; :func:`parse_mp4_timeline` reads those tracks' container
    timing without touching the payloads), and malformed sample
    tables."""
    saw_video = []
    for sd_type, _w, _h, timescale, tables in _video_tracks(data):
        if sd_type not in _JPEG_SAMPLE_TYPES:
            saw_video.append(sd_type)
            continue
        return [
            (start_ms, delay_ms, bytes(data[pos : pos + size]))
            for start_ms, delay_ms, pos, size, _kf in _all_sample_rows(
                data, tables, timescale, max_frames,
            )
        ]
    if saw_video:
        raise ValueError(
            f"MP4 video codec(s) {saw_video} unsupported — only the "
            f"Motion-JPEG sample types {_JPEG_SAMPLE_TYPES} decode here",
        )
    raise ValueError("MP4 contains no video track")


def parse_mp4_timeline(
    data: bytes,
    max_frames: int | None = None,
    prefer: tuple[bytes, ...] = _JPEG_SAMPLE_TYPES,
    media: str = "video",
) -> dict:
    """Container timeline of ONE track of ANY codec — no payload
    decode: ``{"codec": str, "width": int, "height": int, "samples":
    [(start_ms, delay_ms, offset, n_bytes, keyframe), ...]}``. The
    track picked is the first whose sample type is in ``prefer``
    (default: the decodable Motion-JPEG flavors, so a multi-track file
    with an avc1 trak BEFORE a jpeg trak still surfaces the decodable
    one — parse_mp4_samples' track-selection behavior), else the first
    track of the requested ``media`` kind.

    Real multimodal corpora are mostly H.264/H.265, which this
    environment cannot decode to pixels — but the moov sample tables
    still give every frame's start/delay (stts at the mdhd timescale),
    byte extent (stsc/stco/stsz chunk layout), and sync flag (stss;
    absent means every sample is a sync sample per ISO 14496-12
    §8.6.2), all of which frame-sampling decisions can run on.
    Dimensions come from the VisualSampleEntry (0 when absent). The
    ``codec`` string is the 4CC decoded with replacement (4CCs are
    arbitrary bytes); lying sample tables raise exactly as in
    :func:`parse_mp4_samples` — the refuse-dishonest-tables posture is
    codec-independent.

    ``media="audio"`` picks the first soun-handler track instead — the
    same timeline treatment for AAC/Opus/etc. (none of which decode
    here): the dict gains ``channels`` and ``sample_rate`` from the
    AudioSampleEntry, and width/height are 0. That locates and
    measures a corpus's speech segments without touching a codec."""
    if media not in ("video", "audio"):
        raise ValueError(f"media must be 'video' or 'audio', got {media!r}")
    handler = b"vide" if media == "video" else b"soun"
    first = None
    for track in _media_tracks(data, handler):
        if first is None:
            first = track
        if track[0] in prefer:
            first = track
            break
    if first is None:
        raise ValueError(f"MP4 contains no {media} track")
    sd_type, dim1, dim2, timescale, tables = first
    out = {
        "codec": sd_type.decode("ascii", "replace"),
        "decodable": media == "video" and sd_type in _JPEG_SAMPLE_TYPES,
        "width": int(dim1) if media == "video" else 0,
        "height": int(dim2) if media == "video" else 0,
        "samples": _all_sample_rows(data, tables, timescale, max_frames),
    }
    if media == "audio":
        out["channels"] = int(dim1)
        out["sample_rate"] = int(dim2)
    return out


def _sync_samples(data: bytes, tables) -> set[int] | None:
    """The stss sync-sample numbers (1-based), or None when the box is
    absent (= all samples are sync samples)."""
    got = tables.get(b"stss")
    if got is None:
        return None
    s, e = got
    if s + 8 > e:  # full-box header + entry count must fit the payload
        raise ValueError("MP4 stss box too short for its header")
    (cnt,) = struct.unpack_from(">I", data, s + 4)
    if s + 8 + 4 * cnt > e:
        raise ValueError(
            f"MP4 stss declares {cnt} entries, box holds {(e - s - 8) // 4}",
        )
    return set(struct.unpack_from(f">{cnt}I", data, s + 8))


def _all_sample_rows(data, tables, timescale, max_frames):
    """(start_ms, delay_ms, pos, size, keyframe) rows for the whole
    movie: the moov sample tables (stss keyframe flags; absent = all
    sync per ISO 14496-12 §8.6.2) followed by any movie fragments
    (moof/traf/trun — flags carry per-sample sync bits). An fMP4 whose
    moov omits the sample tables entirely (stsz absent) contributes
    zero moov rows instead of refusing; ``max_frames`` spans both."""
    has_moof = _find(data, 0, len(data), b"moof") is not None
    if has_moof and b"stsz" not in tables and b"stz2" not in tables:
        rows = []
    else:
        layout = _track_layout(data, tables, timescale, max_frames)
        sync = _sync_samples(data, tables)
        rows = [
            (st, d, p, sz, True if sync is None else (i + 1) in sync)
            for i, (st, d, p, sz) in enumerate(layout)
        ]
    if has_moof:
        rem = None if max_frames is None \
            else max(0, int(max_frames) - len(rows))
        if rem is None or rem > 0:
            rows += _fragment_layout(data, tables, timescale, rem)
    return rows


def _elst_shift_units(data, tables, timescale) -> int:
    """The track's presentation shift (media-timescale units) from the
    common edit-list shapes — leading empty edits (media_time −1,
    duration at the MOVIE timescale) delay the track, and ONE normal
    rate-1 edit shifts presentation by −media_time (how muxers cancel
    the initial ctts delay). Anything fancier (multiple normal edits,
    rate ≠ 1) refuses loudly rather than silently mis-timing frames."""
    if b"elst" not in tables:
        return 0
    s, e = tables[b"elst"]
    ev, _ = _full_box(data, s)
    (n_ed,) = struct.unpack_from(">I", data, s + 4)
    esz = 20 if ev == 1 else 12
    if s + 8 + esz * n_ed > e:
        raise ValueError(
            f"MP4 elst declares {n_ed} entries, "
            f"box holds {(e - s - 8) // esz}",
        )
    movie_ts = tables.get(b"mvhd-ts") or timescale
    shift_units = 0
    seen_normal = False
    for i in range(n_ed):
        if ev == 1:
            dur, mt = struct.unpack_from(">Qq", data, s + 8 + esz * i)
            ri, rf = struct.unpack_from(">hH", data, s + 8 + esz * i + 16)
        else:
            dur, mt = struct.unpack_from(">Ii", data, s + 8 + esz * i)
            ri, rf = struct.unpack_from(">hH", data, s + 8 + esz * i + 8)
        if mt == -1:  # empty edit: delays the whole track
            if seen_normal:
                raise ValueError(
                    "MP4 elst has an empty edit after a normal one",
                )
            shift_units += dur * timescale // movie_ts
            continue
        if seen_normal:
            raise ValueError(
                "MP4 elst with multiple normal edits unsupported",
            )
        if (ri, rf) != (1, 0):
            raise ValueError(
                f"MP4 elst rate {ri}+{rf}/65536 unsupported (only 1)",
            )
        if mt < 0:
            raise ValueError(f"MP4 elst media_time {mt} invalid")
        shift_units -= mt
        seen_normal = True
    return shift_units


def _fragment_layout(data, tables, timescale, max_frames):
    """Samples carried by movie FRAGMENTS (fMP4 — the DASH/CMAF shape
    most web-delivered video ships in): walk every top-level ``moof``,
    match its ``traf``s to this track's ID, and lay out samples from
    ``tfhd`` (per-fragment defaults + base offset) / ``tfdt`` (decode
    time) / ``trun`` (per-sample durations, sizes, flags, composition
    offsets). Returns ``(start_ms, delay_ms, pos, size, keyframe)``
    rows — presentation-timed like :func:`_track_layout` (same elst
    shift), keyframes from the sample-flags non-sync bit. Lying counts
    and out-of-file extents raise, same posture as the moov tables."""
    track_id = tables.get(b"trak-id")
    trex = tables.get(b"trex")
    shift_units = _elst_shift_units(data, tables, timescale)
    out: list[tuple[int, int, int, int, bool]] = []
    decode = 0  # running decode time, media-timescale units
    n = len(data)
    for btype, moof_start, ms, me in _iter_boxes_full(data, 0, n):
        if btype != b"moof":
            continue
        # implicit data base (no base flag): continues from the previous
        # trun's data end, starting at the first byte of the moof — but
        # ONLY while every preceding traf belonged to this track, since
        # a skipped foreign traf's data length is unknown here
        implicit = moof_start
        foreign_since_start = False
        for t, s, e in _iter_boxes(data, ms, me):
            if t != b"traf":
                continue
            tfhd = _find(data, s, e, b"tfhd")
            if tfhd is None:
                raise ValueError("MP4 traf lacks tfhd")
            _, tf_flags = _full_box(data, tfhd[0])
            at = tfhd[0] + 4
            tf_end = tfhd[1]

            def _read(fmt, width, what, _at=None):
                a = at if _at is None else _at
                if a + width > tf_end:
                    raise ValueError(
                        f"MP4 tfhd too short for its declared {what}",
                    )
                return struct.unpack_from(fmt, data, a)[0]

            tid = _read(">I", 4, "track_ID")
            at += 4
            if tid != track_id:
                foreign_since_start = True
                continue
            if tf_flags & 0x01:  # base-data-offset-present
                base = _read(">Q", 8, "base data offset")
                at += 8
            elif tf_flags & 0x20000:  # default-base-is-moof
                base = moof_start
            else:
                if foreign_since_start:
                    raise ValueError(
                        "MP4 traf with an implicit data base after "
                        "another track's traf — its data length is "
                        "unknown without that track's tables",
                    )
                base = implicit
            if tf_flags & 0x02:  # sample-description-index
                at += 4
            d_dur = d_size = d_flags = None
            if tf_flags & 0x08:
                d_dur = _read(">I", 4, "default sample duration")
                at += 4
            if tf_flags & 0x10:
                d_size = _read(">I", 4, "default sample size")
                at += 4
            if tf_flags & 0x20:
                d_flags = _read(">I", 4, "default sample flags")
                at += 4
            if d_dur is None and trex is not None:
                d_dur = trex[0]
            if d_size is None and trex is not None:
                d_size = trex[1]
            if d_flags is None and trex is not None:
                d_flags = trex[2]
            tfdt = _find(data, s, e, b"tfdt")
            if tfdt is not None:
                dv, _ = _full_box(data, tfdt[0])
                decode = struct.unpack_from(
                    ">Q" if dv == 1 else ">I", data, tfdt[0] + 4,
                )[0]
            dpos = base
            for t2, s2, e2 in _iter_boxes(data, s, e):
                if t2 != b"trun":
                    continue
                rv, r_flags = _full_box(data, s2)
                if s2 + 8 > e2:
                    raise ValueError("MP4 trun too short for its header")
                (cnt,) = struct.unpack_from(">I", data, s2 + 4)
                at2 = s2 + 8
                if r_flags & 0x01:  # data-offset-present
                    if at2 + 4 > e2:
                        raise ValueError(
                            "MP4 trun too short for its data offset",
                        )
                    (doff,) = struct.unpack_from(">i", data, at2)
                    at2 += 4
                    dpos = base + doff
                first_flags = None
                if r_flags & 0x04:
                    if at2 + 4 > e2:
                        raise ValueError(
                            "MP4 trun too short for its first-sample flags",
                        )
                    (first_flags,) = struct.unpack_from(">I", data, at2)
                    at2 += 4
                per = (4 * bool(r_flags & 0x100) + 4 * bool(r_flags & 0x200)
                       + 4 * bool(r_flags & 0x400) + 4 * bool(r_flags & 0x800))
                # a lying count must not read past the box (per > 0) or
                # fabricate unbounded rows (every sample occupies mdat)
                if per and at2 + per * cnt > e2:
                    raise ValueError(
                        f"MP4 trun declares {cnt} samples, box holds "
                        f"{(e2 - at2) // per}",
                    )
                if cnt > n:
                    raise ValueError(
                        f"MP4 trun declares {cnt} samples in a "
                        f"{n}-byte file",
                    )
                if per == 0 and cnt and d_size == 0:
                    # with no per-sample fields the only thing bounding
                    # the count is the mdat bytes each sample occupies
                    # (the dpos+sz check below) — a ZERO default size
                    # voids that bound, letting a lying count fabricate
                    # up to n empty rows before max_frames caps it
                    raise ValueError(
                        "MP4 trun with no per-sample fields and a zero "
                        "default sample size — the declared count is "
                        "unverifiable",
                    )
                for i in range(cnt):
                    if max_frames is not None and len(out) >= int(max_frames):
                        return out
                    if r_flags & 0x100:
                        (dur,) = struct.unpack_from(">I", data, at2)
                        at2 += 4
                    elif d_dur is not None:
                        dur = d_dur
                    else:
                        raise ValueError(
                            "MP4 trun sample lacks a duration (no trun "
                            "field, tfhd default, or trex default)",
                        )
                    if r_flags & 0x200:
                        (sz,) = struct.unpack_from(">I", data, at2)
                        at2 += 4
                    elif d_size is not None:
                        sz = d_size
                    else:
                        raise ValueError(
                            "MP4 trun sample lacks a size (no trun "
                            "field, tfhd default, or trex default)",
                        )
                    if r_flags & 0x400:
                        (fl,) = struct.unpack_from(">I", data, at2)
                        at2 += 4
                    elif i == 0 and first_flags is not None:
                        fl = first_flags
                    else:
                        fl = d_flags if d_flags is not None else 0
                    co = 0
                    if r_flags & 0x800:
                        (co,) = struct.unpack_from(">I", data, at2)
                        if rv == 1 and co >= 1 << 31:  # v1 offsets signed
                            co -= 1 << 32
                        at2 += 4
                    if dpos < 0 or dpos + sz > n:
                        # negative too: Python slicing would silently
                        # WRAP a negative position to the file's tail
                        raise ValueError(
                            "MP4 fragment sample extends outside the file",
                        )
                    pres = decode + co + shift_units
                    out.append((
                        pres * 1000 // timescale,
                        dur * 1000 // timescale,
                        dpos, sz,
                        not (fl >> 16) & 1,  # sample_is_non_sync_sample
                    ))
                    decode += dur
                    dpos += sz
            implicit = dpos  # next implicit-base traf continues here
    return out


def _track_layout(data, tables, timescale, max_frames):
    """The track's sample layout as ``(start_ms, delay_ms, offset,
    size)`` rows — the payload-free core shared by the Motion-JPEG
    demuxer and the metadata-only timeline."""
    def table(btype):
        got = tables.get(btype)
        if got is None:
            raise ValueError(f"MP4 stbl lacks {btype.decode()}")
        return got

    def checked_count(btype, declared, entry_bytes, header, s, e):
        # a lying entry count must raise, not read the NEIGHBORING boxes'
        # bytes as table entries (entry_bytes > 0), and a fixed-stsz
        # count of 0xFFFFFFFF must not malloc a 34 GB list — every
        # sample needs at least one byte of mdat, so len(data) bounds
        # any honest count (entry_bytes == 0: no stored entries)
        if entry_bytes and s + header + entry_bytes * declared > e:
            raise ValueError(
                f"MP4 {btype.decode()} declares {declared} entries, "
                f"box holds {(e - s - header) // entry_bytes}",
            )
        if declared > len(data):
            raise ValueError(
                f"MP4 {btype.decode()} declares {declared} entries "
                f"in a {len(data)}-byte file",
            )
        return declared

    # sizes: stsz, or the compact stz2 (4/8/16-bit fields, §8.7.3.3)
    if b"stsz" not in tables and b"stz2" in tables:
        s, e = tables[b"stz2"]
        field_size = data[s + 7]
        (count,) = struct.unpack_from(">I", data, s + 8)
        if field_size not in (4, 8, 16):
            raise ValueError(f"MP4 stz2 field size {field_size} invalid")
        if s + 12 + (count * field_size + 7) // 8 > e:
            raise ValueError(
                f"MP4 stz2 declares {count} entries, box holds "
                f"{(e - s - 12) * 8 // field_size}",
            )
        if count > len(data):
            raise ValueError(
                f"MP4 stz2 declares {count} entries in a "
                f"{len(data)}-byte file",
            )
        if field_size == 16:
            sizes = list(struct.unpack_from(f">{count}H", data, s + 12))
        elif field_size == 8:
            sizes = list(data[s + 12 : s + 12 + count])
        else:  # 4-bit: high nibble first
            byts = data[s + 12 : s + 12 + (count + 1) // 2]
            sizes = []
            for b in byts:
                sizes.append(b >> 4)
                sizes.append(b & 0x0F)
            sizes = sizes[:count]
    else:
        s, e = table(b"stsz")
        fixed, count = struct.unpack_from(">II", data, s + 4)
        if fixed:
            count = checked_count(b"stsz", count, 0, 12, s, e)
            if max_frames is not None:
                count = min(count, int(max_frames))
            sizes = [fixed] * count
        else:
            count = checked_count(b"stsz", count, 4, 12, s, e)
            sizes = list(struct.unpack_from(f">{count}I", data, s + 12))
    n_samples = len(sizes)
    if max_frames is not None:
        n_samples = min(n_samples, int(max_frames))

    # chunk offsets
    if b"stco" in tables:
        s, e = tables[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", data, s + 4)
        n_chunks = checked_count(b"stco", n_chunks, 4, 8, s, e)
        offsets = list(struct.unpack_from(f">{n_chunks}I", data, s + 8))
    else:
        s, e = table(b"co64")
        (n_chunks,) = struct.unpack_from(">I", data, s + 4)
        n_chunks = checked_count(b"co64", n_chunks, 8, 8, s, e)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, s + 8))

    # sample -> chunk runs
    s, e = table(b"stsc")
    (n_runs,) = struct.unpack_from(">I", data, s + 4)
    n_runs = checked_count(b"stsc", n_runs, 12, 8, s, e)
    runs = [
        struct.unpack_from(">III", data, s + 8 + 12 * i)[:2]
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk)

    # timing: stts (count, delta) runs at mdhd timescale
    s, e = table(b"stts")
    (n_tt,) = struct.unpack_from(">I", data, s + 4)
    n_tt = checked_count(b"stts", n_tt, 8, 8, s, e)
    deltas: list[int] = []
    for i in range(n_tt):
        cnt, delta = struct.unpack_from(">II", data, s + 8 + 8 * i)
        deltas.extend([delta] * min(cnt, n_samples - len(deltas)))
        if len(deltas) >= n_samples:
            break
    if len(deltas) < n_samples:
        raise ValueError("MP4 stts covers fewer samples than stsz")

    # ctts: composition (presentation) offsets — B-frame reordering.
    # start_ms below is the PRESENTATION time (decode time + offset);
    # rows stay in decode/container order, so PTS need not be monotonic
    comp: list[int] | None = None
    if b"ctts" in tables:
        s, e = tables[b"ctts"]
        cv, _ = _full_box(data, s)
        (n_ct,) = struct.unpack_from(">I", data, s + 4)
        n_ct = checked_count(b"ctts", n_ct, 8, 8, s, e)
        comp = []
        for i in range(n_ct):
            cnt, off = struct.unpack_from(">II", data, s + 8 + 8 * i)
            if cv == 1 and off >= 1 << 31:  # v1 offsets are signed
                off -= 1 << 32
            comp.extend([off] * min(cnt, n_samples - len(comp)))
            if len(comp) >= n_samples:
                break
        if len(comp) < n_samples:
            raise ValueError("MP4 ctts covers fewer samples than stsz")

    shift_units = _elst_shift_units(data, tables, timescale)

    # walk chunks, laying samples contiguously inside each; stsc runs are
    # spec-ordered by first_chunk, so a single forward pointer gives each
    # chunk's samples-per-chunk in O(n_chunks + n_runs) — a rescan per
    # chunk is quadratic on real per-chunk-entry tables
    out: list[tuple[int, int, int, int]] = []
    start_units = 0
    si = 0
    ri = 0
    per = 0
    for ci in range(len(offsets)):
        while ri < len(runs) and runs[ri][0] <= ci + 1:
            per = runs[ri][1]
            ri += 1
        pos = offsets[ci]
        for _ in range(per):
            if si >= n_samples:
                return out
            size = sizes[si]
            if pos + size > len(data):
                raise ValueError("MP4 sample extends past the file end")
            pres = start_units + shift_units + (comp[si] if comp else 0)
            start_ms = pres * 1000 // timescale
            delay_ms = deltas[si] * 1000 // timescale
            out.append((start_ms, delay_ms, pos, size))
            start_units += deltas[si]
            pos += size
            si += 1
    if si < n_samples:
        raise ValueError("MP4 chunk layout covers fewer samples than stsz")
    return out


# ---------------------------------------------------------- fixture writer
def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def encode_mp4_mjpeg(
    jpeg_frames: list[bytes],
    delays_ms: list[int],
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    samples_per_chunk: int = 2,
    sample_type: bytes = b"jpeg",
    sync_samples: list[int] | None = None,
    composition_offsets_ms: list[int] | None = None,
    elst_media_time_ms: int | None = None,
    elst_empty_ms: int = 0,
    use_stz2: bool = False,
    handler: bytes = b"vide",
    channels: int = 2,
    sample_rate: int = 48000,
) -> bytes:
    """Spec-built MP4 fixture: one video track (``sample_type``-coded,
    'jpeg' by default) whose mdat carries the given payloads in
    ``samples_per_chunk``-sample chunks with per-sample stts timing —
    exercises the demuxer's chunk walk, multi-run stsc, and timescale
    arithmetic. ``sample_type=b"avc1"`` (with arbitrary payload bytes)
    builds the real-codec shape :func:`parse_mp4_timeline` reads
    metadata-only; ``sync_samples`` (1-based) writes an stss box so
    keyframe flags are exercised. ``composition_offsets_ms`` writes a
    per-sample ctts box (version 1 when any offset is negative) — the
    B-frame presentation-reorder shape; ``elst_media_time_ms`` writes
    an edts/elst with one rate-1 edit at that media time (how muxers
    cancel the initial composition delay), optionally preceded by an
    ``elst_empty_ms`` empty edit that delays the track;
    ``use_stz2`` stores sample sizes in the compact 16-bit stz2 box
    instead of stsz. ``handler=b"soun"`` writes an AUDIO track instead
    (AudioSampleEntry with ``channels``/``sample_rate``, smhd) — the
    fixture shape for parse_mp4_timeline's ``media="audio"`` mode."""
    if len(jpeg_frames) != len(delays_ms):
        raise ValueError("one delay per frame, please")
    if composition_offsets_ms is not None and \
            len(composition_offsets_ms) != len(jpeg_frames):
        raise ValueError("one composition offset per frame, please")
    if len(sample_type) != 4:
        raise ValueError("sample_type is a 4CC")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(jpeg_frames)
    mdat_base = len(ftyp) + 8  # samples start here

    sizes = [len(f) for f in jpeg_frames]
    chunks: list[int] = []  # offset per chunk
    pos = mdat_base
    for i in range(0, len(sizes), samples_per_chunk):
        chunks.append(pos)
        pos += sum(sizes[i : i + samples_per_chunk])

    duration = sum(delays_ms) * timescale // 1000
    stsd = _stsd_box(sample_type, width, height, handler=handler,
                     channels=channels, sample_rate=sample_rate)
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(sizes)) + b"".join(
        struct.pack(">II", 1, d * timescale // 1000) for d in delays_ms
    ))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 1) + struct.pack(
        ">III", 1, samples_per_chunk, 1,
    ))
    if use_stz2:  # compact 16-bit sample sizes
        if any(s > 0xFFFF for s in sizes):
            raise ValueError("stz2-16 cannot hold a >65535-byte sample")
        stsz = _full(b"stz2", 0, 0, struct.pack(
            ">3xBI", 16, len(sizes),
        ) + b"".join(struct.pack(">H", s) for s in sizes))
    else:
        stsz = _full(b"stsz", 0, 0, struct.pack(
            ">II", 0, len(sizes),
        ) + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunks)) + b"".join(
        struct.pack(">I", c) for c in chunks
    ))
    stss = b""
    if sync_samples is not None:
        bad = [k for k in sync_samples if not 1 <= k <= len(sizes)]
        if bad:
            raise ValueError(f"sync_samples out of range: {bad}")
        stss = _full(
            b"stss", 0, 0,
            struct.pack(">I", len(sync_samples)) + b"".join(
                struct.pack(">I", k) for k in sorted(sync_samples)
            ),
        )
    ctts = b""
    if composition_offsets_ms is not None:
        units = [o * timescale // 1000 for o in composition_offsets_ms]
        cv = 1 if any(u < 0 for u in units) else 0
        ctts = _full(b"ctts", cv, 0, struct.pack(">I", len(units)) + b"".join(
            struct.pack(">Ii" if cv else ">II", 1, u) for u in units
        ))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss + ctts)
    edts = b""
    if elst_media_time_ms is not None or elst_empty_ms:
        entries = []
        if elst_empty_ms:  # empty edit: duration at the MOVIE timescale
            entries.append(struct.pack(
                ">IihH", elst_empty_ms * timescale // 1000, -1, 1, 0,
            ))
        entries.append(struct.pack(
            ">IihH", duration,
            (elst_media_time_ms or 0) * timescale // 1000, 1, 0,
        ))
        edts = _box(b"edts", _full(
            b"elst", 0, 0,
            struct.pack(">I", len(entries)) + b"".join(entries),
        ))
    moov = _moov_box(width, height, timescale, duration, stbl, edts=edts,
                     handler=handler)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _unity_matrix() -> bytes:
    return struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
    )


def _stsd_box(
    sample_type: bytes, width: int, height: int,
    handler: bytes = b"vide", channels: int = 2, sample_rate: int = 48000,
) -> bytes:
    """stsd with one Visual-, Audio-, or subtitle SampleEntry — shared
    by the fixture writers so the entry layouts cannot drift between
    them."""
    if handler in (b"text", b"sbtl", b"subt"):
        if sample_type == b"wvtt":
            # WVTTSampleEntry (ISO 14496-30): a vttC config box with
            # the WebVTT file header
            conf = _box(b"vttC", b"WEBVTT\n")
        else:
            # tx3g TextSampleEntry (3GPP TS 26.245): displayFlags,
            # justification, background color, default text box,
            # default style record — all zero is legal
            conf = b"\x00" * 30
        entry = (struct.pack(">I4s6xH", 16 + len(conf), sample_type, 1)
                 + conf)
        return _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    if handler == b"soun":
        entry = (
            struct.pack(">I4s6xH", 36, sample_type, 1)  # size/type/dref
            + b"\x00" * 8                               # reserved
            + struct.pack(">HH", channels, 16)  # channelcount, samplesize
            + b"\x00" * 4                       # pre_defined + reserved
            + struct.pack(">I", sample_rate << 16)       # 16.16 fixed
        )
    else:
        entry = (
            struct.pack(">I4s6xH", 86, sample_type, 1)  # size, type, dref
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)                     # frame count
            + b"\x00" * 32                             # compressor name
            + struct.pack(">Hh", 24, -1)               # depth, color table
        )
    return _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)


def _moov_box(
    width: int, height: int, timescale: int, duration: int, stbl: bytes,
    edts: bytes = b"", mvex: bytes = b"", handler: bytes = b"vide",
) -> bytes:
    """moov with one video or audio trak around the given stbl — the
    assembly shared by the plain and fragmented fixture writers."""
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(
        b"url ", 0, 1, b"",
    ))
    if handler == b"vide":
        mhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    elif handler == b"soun":
        mhd = _full(b"smhd", 0, 0, b"\x00" * 4)
    else:  # subtitle/text tracks take the null media header
        mhd = _full(b"nmhd", 0, 0, b"")
    minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12
                 + b"MediaHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0,
    ))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    # tkhd v0: creation, modification, track_ID, RESERVED(4), duration
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">III4xI", 0, 0, 1, duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                 + _unity_matrix()
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + edts + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration,
    ) + struct.pack(">IH2x8x", 0x00010000, 0x0100) + _unity_matrix()
        + b"\x00" * 24 + struct.pack(">I", 2))
    return _box(b"moov", mvhd + trak + mvex)


def encode_mp4_fragmented(
    frames: list[bytes],
    delays_ms: list[int],
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    sample_type: bytes = b"avc1",
    frames_per_fragment: int = 2,
    sync_first_only: bool = True,
    composition_offsets_ms: list[int] | None = None,
) -> bytes:
    """Spec-built FRAGMENTED MP4 fixture (the DASH/CMAF shape): a moov
    whose sample tables are empty (mvex/trex carries the defaults), then
    one ``moof`` + ``mdat`` pair per ``frames_per_fragment`` samples —
    tfhd with default-base-is-moof, tfdt decode times, trun with
    per-sample durations/sizes/flags (first sample of each fragment
    sync, the rest non-sync when ``sync_first_only``) and optional
    per-sample composition offsets. Exercises the moof/traf/trun walk
    end-to-end."""
    if len(frames) != len(delays_ms):
        raise ValueError("one delay per frame, please")
    if composition_offsets_ms is not None and \
            len(composition_offsets_ms) != len(frames):
        raise ValueError("one composition offset per frame, please")
    if len(sample_type) != 4:
        raise ValueError("sample_type is a 4CC")
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5dash")
    duration = sum(delays_ms) * timescale // 1000
    stbl = _box(
        b"stbl",
        _stsd_box(sample_type, width, height)
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0)),
    )
    # trex: track 1 defaults (unused here — truns carry every field —
    # but required by the spec for a fragmented movie)
    mvex = _box(b"mvex", _full(b"trex", 0, 0, struct.pack(
        ">IIIII", 1, 1, 0, 0, 0x00010000,
    )))
    moov = _moov_box(width, height, timescale, duration, stbl, mvex=mvex)

    out = ftyp + moov
    decode_units = 0
    seq = 1
    for i in range(0, len(frames), frames_per_fragment):
        chunk = frames[i : i + frames_per_fragment]
        delays = delays_ms[i : i + frames_per_fragment]
        ctos = (composition_offsets_ms[i : i + frames_per_fragment]
                if composition_offsets_ms is not None else None)
        tr_flags = 0x001 | 0x100 | 0x200 | 0x400 | (0x800 if ctos else 0)
        rows = b""
        for j, (fb, d) in enumerate(zip(chunk, delays)):
            fl = 0 if (j == 0 or not sync_first_only) else 0x00010000
            rows += struct.pack(">III", d * timescale // 1000, len(fb), fl)
            if ctos:
                rows += struct.pack(">i", ctos[j] * timescale // 1000)
        cv = 1 if ctos and any(c < 0 for c in ctos) else 0
        # data_offset backpatched once the moof size is known
        trun = _full(b"trun", cv, tr_flags,
                     struct.pack(">Ii", len(chunk), 0) + rows)
        tfhd = _full(b"tfhd", 0, 0x20000, struct.pack(">I", 1))
        tfdt = _full(b"tfdt", 0, 0, struct.pack(">I", decode_units))
        traf = _box(b"traf", tfhd + tfdt + trun)
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        moof = bytearray(_box(b"moof", mfhd + traf))
        # the trun data offset field sits 8 bytes into the trun payload
        # counting from ... locate it: last 4 + len(rows) bytes back
        doff_at = len(moof) - len(rows) - 4
        struct.pack_into(">i", moof, doff_at, len(moof) + 8)
        out += bytes(moof) + _box(b"mdat", b"".join(chunk))
        decode_units += sum(delays) * timescale // 1000
        seq += 1
    return out
