"""Single-scan media triage — the FIRST pass a crawled-media corpus
runs at 100 TB. One row per payload: container, mime, dimensions,
duration, audio shape, and embedded-text counts (tags + subtitle
cues), all from header/table walks — NO pixel or sample decode, so
per-payload work is O(header bytes) for every container family.

The operator keeps a row for EVERY payload: a corrupt or unrecognized
blob gets its row with an ``error`` string instead of disappearing —
triage must account for every byte it was given, and the error
distribution is itself corpus telemetry.

Composes the per-container walkers this package already ships
(:mod:`~sed_binning_spark.pipeline.mp4`, :mod:`.webm`, :mod:`.ogg`,
:mod:`.mp3`, :mod:`.aac`, :mod:`.tags`, :mod:`.subtitles`,
:mod:`.multimodal`); no counterpart exists in the reference repo
(photoemission binning, no media code)."""

from __future__ import annotations

import struct

_IMAGE_MIMES = {
    "png": "image/png", "gif": "image/gif", "jpeg": "image/jpeg",
    "webp": "image/webp", "bmp": "image/bmp", "ppm": "image/x-portable-pixmap",
}


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JPEG stream."""
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker walk lost sync")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("JPEG segment extends past the file")
        # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC) carry the frame dims
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 7:
                raise ValueError("JPEG SOF segment too short")
            h, w = struct.unpack_from(">HH", data, pos + 5)
            return w, h
        pos += 2 + seg_len
    raise ValueError("JPEG stream has no SOF marker")


def _image_dims(data: bytes) -> tuple[str, int, int]:
    """(kind, width, height) from an image header — no pixel decode."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) < 24 or data[12:16] != b"IHDR":
            raise ValueError("PNG stream truncated before its IHDR")
        w, h = struct.unpack_from(">II", data, 16)
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) < 10:
            raise ValueError("GIF truncated inside its logical screen")
        w, h = struct.unpack_from("<HH", data, 6)
        return "gif", w, h
    if data[:2] == b"\xff\xd8":
        w, h = _jpeg_dims(data)
        return "jpeg", w, h
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from sed_binning_spark.pipeline.multimodal import parse_webp_header

        _variant, w, h = parse_webp_header(data)
        return "webp", w, h
    if data[:2] == b"BM":
        if len(data) < 26:
            raise ValueError("BMP truncated inside its info header")
        hdr = struct.unpack_from("<I", data, 14)[0]
        if hdr == 12:  # OS/2 BITMAPCOREHEADER: 16-bit width/height
            w, h = struct.unpack_from("<HH", data, 18)
            return "bmp", w, h
        if hdr < 40:
            raise ValueError(
                f"BMP DIB header size {hdr} is not a known layout",
            )
        w, h = struct.unpack_from("<ii", data, 18)
        return "bmp", w, abs(h)
    if data[:2] == b"P6":
        from sed_binning_spark.pipeline.multimodal import decode_image_ppm

        img = decode_image_ppm(data)
        return "ppm", img.shape[1], img.shape[0]
    raise ValueError("not a recognized image container")


def _flac_streaminfo(data: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, duration_ms) from STREAMINFO only —
    no frame decode."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    if len(data) < 8 + 34 or (data[4] & 0x7F) != 0:
        raise ValueError("FLAC stream without a leading STREAMINFO")
    si = data[8 : 8 + 34]
    bits = int.from_bytes(si[10:18], "big")
    rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    total = bits & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC STREAMINFO declares a zero sample rate")
    return rate, channels, total * 1000 // rate


def _wav_header(data: bytes) -> tuple[int, int, int | None]:
    """(sample_rate, channels, duration_ms) from the fmt/fact/data
    chunks — samples are never read."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(data)
    fmt = None
    fact_samples = None
    data_size = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", data, pos)
        if pos + 8 + size > n:
            raise ValueError(f"RIFF chunk {cid!r} extends past the file")
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif cid == b"fact" and size >= 4:
            fact_samples = struct.unpack_from("<I", data, pos + 8)[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise ValueError("WAVE file without an fmt chunk")
    _tag, channels, rate, byte_rate, _align, _bits = fmt
    if rate == 0:
        raise ValueError("WAVE fmt declares a zero sample rate")
    if fact_samples is not None:
        dur = fact_samples * 1000 // rate
    elif data_size is not None and byte_rate:
        dur = data_size * 1000 // byte_rate
    else:
        dur = None
    return rate, channels, dur


def _ogg_info(data: bytes) -> tuple[int, int, int | None]:
    """(sample_rate, channels, duration_ms) of the first Ogg stream —
    CODEC-AGNOSTIC: the identification header in the BOS packet names
    rate and channels at fixed offsets for all three mappings (Vorbis
    I §4.2.2, OpusHead RFC 7845 §5.1, Ogg FLAC mapping §3), and the
    last page's granule position IS the total sample count on the
    stream's granule clock (RFC 3533 §6) — so even Vorbis, whose
    per-packet timing would need a codebook decode, triages fully
    from page headers."""
    from sed_binning_spark.pipeline.ogg import _iter_pages

    serial0 = None
    head = None
    last_granule = None
    pre_skip = 0
    clock = None  # granule ticks per second
    rate = channels = None
    for flags, granule, serial, _seq, segments, body_at in \
            _iter_pages(data):
        if serial0 is None:
            serial0 = serial
            head = data[body_at : body_at + sum(segments)]
        if serial != serial0:
            continue
        if granule >= 0:  # -1 marks a page with no finished packet
            last_granule = granule
    if head is None:
        raise ValueError("Ogg stream has no pages")
    if head[:7] == b"\x01vorbis":
        if len(head) < 28:
            raise ValueError("Vorbis identification header truncated")
        channels = head[11]
        rate = struct.unpack_from("<I", head, 12)[0]
        clock = rate
    elif head[:8] == b"OpusHead":
        if len(head) < 19:
            raise ValueError("OpusHead truncated")
        channels = head[9]
        pre_skip = struct.unpack_from("<H", head, 10)[0]
        rate = struct.unpack_from("<I", head, 12)[0]
        clock = 48_000  # Opus granules run on the 48 kHz clock
    elif head[:5] == b"\x7fFLAC":
        # the BOS packet wraps the native fLaC magic + STREAMINFO —
        # delegate the bit extraction to the native-FLAC reader
        at = head.find(b"fLaC")
        if at < 0:
            raise ValueError("Ogg FLAC BOS packet lacks STREAMINFO")
        rate, channels, _dur = _flac_streaminfo(head[at:])
        clock = rate
    else:
        raise ValueError(
            "Ogg BOS packet is not Vorbis, Opus, or FLAC",
        )
    if not rate or not clock:
        raise ValueError("Ogg identification header declares a zero "
                         "sample rate")
    dur = None
    if last_granule is not None:
        samples = max(0, last_granule - pre_skip)
        dur = samples * 1000 // clock
    return rate, channels, dur


def _timeline_duration(samples) -> int | None:
    if not samples:
        return None
    start, delay = samples[-1][0], samples[-1][1]
    return start + (delay if delay is not None else 0)


def manifest_one(data: bytes) -> dict:
    """The triage facts of one payload — see the module docstring for
    the field meanings; raises the media tier's ValueError family on
    structural defects (the Spark operator converts those into the
    ``error`` column)."""
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS
    from sed_binning_spark.pipeline.subtitles import parse_subtitles
    from sed_binning_spark.pipeline.tags import parse_media_tags

    out = {
        "container": None, "mime": None, "width": None, "height": None,
        "duration_ms": None, "sample_rate": None, "channels": None,
        "n_tags": 0, "n_cues": 0, "error": None,
    }

    def _count_tags():
        try:
            out["n_tags"] = len(parse_media_tags(data)["tags"])
        except _DECODE_ERRORS:
            pass  # a tag-block defect doesn't void the triage row

    def _count_cues():
        try:
            cues = parse_subtitles(data)["cues"]
        except _DECODE_ERRORS:
            return
        out["n_cues"] = len(cues)
        if out["duration_ms"] is None and cues:
            # a subtitle-only container's extent IS its cue span
            out["duration_ms"] = max(e for _i, _s, e, _t in cues)

    def _av_walk(parse_fn, container, video_mime, audio_mime):
        """Shared video-then-audio timeline attempt: the facts the walk
        CAN derive are kept; a timeline refusal lands in ``error``
        instead of voiding the container row (the tag/cue counts still
        run — triage keeps what it learned)."""
        out["container"] = container
        out["mime"] = video_mime
        got = None
        last_err = None
        for media in ("video", "audio"):
            try:
                got = parse_fn(data, media=media)
                break
            except _DECODE_ERRORS as exc:
                last_err = exc
        if got is not None:
            out["width"] = got.get("width") or None
            out["height"] = got.get("height") or None
            rate = got.get("sample_rate")
            out["sample_rate"] = int(rate) if rate else None
            out["channels"] = got.get("channels")
            out["duration_ms"] = _timeline_duration(got["samples"])
            if rate:
                out["mime"] = audio_mime
        else:
            out["error"] = str(last_err)[:200]
        _count_tags()
        _count_cues()
        return out

    if data[:4] == b"\x1aE\xdf\xa3":
        from sed_binning_spark.pipeline.webm import parse_webm_timeline

        return _av_walk(parse_webm_timeline, "webm", "video/webm",
                        "audio/webm")
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from sed_binning_spark.pipeline.mp4 import parse_mp4_timeline

        return _av_walk(parse_mp4_timeline, "mp4", "video/mp4",
                        "audio/mp4")
    if data[:4] == b"fLaC":
        out["container"] = "flac"
        out["mime"] = "audio/flac"
        rate, ch, dur = _flac_streaminfo(data)
        out["sample_rate"], out["channels"] = rate, ch
        out["duration_ms"] = dur
        _count_tags()
        return out
    if data[:4] == b"OggS":
        out["container"] = "ogg"
        out["mime"] = "audio/ogg"
        try:
            rate, ch, dur = _ogg_info(data)
            out["sample_rate"], out["channels"] = rate, ch
            out["duration_ms"] = dur
        except _DECODE_ERRORS as exc:
            # an unknown BOS codec (Speex, Theora) or a truncated page
            # walk keeps the container row — triage keeps what it
            # learned and notes what it could not
            out["error"] = str(exc)[:200]
        _count_tags()
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        out["container"] = "wav"
        out["mime"] = "audio/wav"
        rate, ch, dur = _wav_header(data)
        out["sample_rate"], out["channels"] = rate, ch
        out["duration_ms"] = dur
        _count_tags()
        return out
    # images (incl. RIFF/WEBP) before the MPEG-audio sniffs — a JPEG's
    # 0xFFD8 would otherwise look like an MPEG sync word
    try:
        kind, w, h = _image_dims(data)
    except _DECODE_ERRORS:
        kind = None
    if kind is not None:
        out["container"] = kind
        out["mime"] = _IMAGE_MIMES[kind]
        out["width"], out["height"] = w, h
        _count_tags()
        return out
    from sed_binning_spark.pipeline.aac import looks_like_adts

    is_adts = looks_like_adts(data)
    if (data[:3] == b"ID3" or is_adts
            or (len(data) >= 4 and data[0] == 0xFF
                and data[1] & 0xE0 == 0xE0)):
        # triage tolerates the download-truncated final frame — the
        # single most common crawl defect — keeping the clean-frame
        # facts and noting the drop
        if is_adts:
            from sed_binning_spark.pipeline.aac import parse_adts_timeline

            got = parse_adts_timeline(data, tolerate_truncated_tail=True)
            out["container"], out["mime"] = "aac", "audio/aac"
        else:
            from sed_binning_spark.pipeline.mp3 import parse_mp3_timeline

            got = parse_mp3_timeline(data, tolerate_truncated_tail=True)
            out["container"] = got["codec"]
            out["mime"] = "audio/mpeg"
        out["sample_rate"] = got["sample_rate"]
        out["channels"] = got["channels"]
        out["duration_ms"] = _timeline_duration(got["samples"])
        if got.get("bytes_dropped"):
            out["error"] = (f"truncated tail: {got['bytes_dropped']} "
                            f"bytes dropped")
        # ONE frame walk yields both the tag texts and the podcast
        # CHAP chapters (cues) — tags with embedded artwork run to
        # megabytes, so a second walk would double the per-payload cost
        from sed_binning_spark.pipeline.tags import (
            parse_id3v1,
            parse_id3v2_full,
        )

        try:
            id3_tags, chapters, _end = parse_id3v2_full(data)
            if not id3_tags:
                id3_tags = parse_id3v1(data)
            out["n_tags"] = len(id3_tags)
            out["n_cues"] = len(chapters)
        except _DECODE_ERRORS:
            pass  # a tag-block defect doesn't void the triage row
        return out
    # subtitle documents (text payloads)
    got = parse_subtitles(data)
    out["container"] = got["format"]
    out["mime"] = {
        "srt": "application/x-subrip", "vtt": "text/vtt",
        "ass": "text/x-ssa",
    }.get(got["format"], "text/plain")
    out["n_cues"] = len(got["cues"])
    ends = [e for _i, _s, e, _t in got["cues"]]
    out["duration_ms"] = max(ends) if ends else None
    return out


def media_manifest(
    df,
    payload_column: str = "payload",
    id_column: str = "media_id",
):
    """One triage row per payload — ``(media_id, container, mime,
    n_bytes, width, height, duration_ms, sample_rate, channels,
    n_tags, n_cues, error)``. Unlike the extraction operators, a
    payload that fails to parse KEEPS its row (container NULL, the
    ValueError text in ``error``) — at 100 TB the corrupt-payload
    distribution is telemetry, not noise to drop.

    Distribution shape: one ``mapInPandas`` stage, Arrow-batched,
    partition-local, no shuffle, no driver collect; every walk is
    header/table bytes only (no pixel or PCM decode), so per-payload
    work is independent of media size."""
    import pandas as pd

    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    schema = (f"{id_column} long, container string, mime string, "
              f"n_bytes long, width int, height int, duration_ms long, "
              f"sample_rate int, channels int, n_tags int, n_cues int, "
              f"error string")
    cols = [id_column, "container", "mime", "n_bytes", "width",
            "height", "duration_ms", "sample_rate", "channels",
            "n_tags", "n_cues", "error"]

    def _batches(batches):
        for pdf in batches:
            rows = []
            # walk each DISTINCT payload once per batch: the manifest row
            # is a pure function of the bytes (dedup-before-decode; the
            # memo dies with the batch, so memory stays bounded)
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    rows.append((mid, None, None, 0, None, None, None,
                                 None, None, 0, 0, "null payload"))
                    continue
                blob = bytes(payload)
                tail = memo.get(blob)
                if tail is None:
                    try:
                        got = manifest_one(blob)
                        tail = (
                            got["container"], got["mime"], len(blob),
                            got["width"], got["height"], got["duration_ms"],
                            got["sample_rate"], got["channels"],
                            got["n_tags"], got["n_cues"], got["error"],
                        )
                    except _DECODE_ERRORS as exc:
                        tail = (None, None, len(blob), None, None,
                                None, None, None, 0, 0,
                                str(exc)[:200] or type(exc).__name__)
                    memo[blob] = tail
                rows.append((mid, *tail))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_batches, schema=schema)
