"""Minimal MPEG audio (MP3) frame walking for the audio-timeline path —
the third speech/music-corpus container after MP4/WebM and Ogg. No
MPEG audio decoder ships here, but none is needed for a timeline: every
frame's byte length and sample count are fully determined by its 4-byte
header (ISO/IEC 11172-3 §2.4.1 / 13818-3), so an MP3 yields per-frame
timing and extents from a pure header walk.

Implemented from the public spec:

- frame sync (11 set bits), MPEG version 1/2/2.5, Layers I/II/III,
  the published bitrate and sample-rate tables, padding;
- frame length: Layer I ``(12·bitrate/rate + pad)·4``, Layers II/III
  ``samples/8 · bitrate/rate + pad`` (1152 samples for Layer II and
  MPEG-1 Layer III, 576 for MPEG-2/2.5 Layer III, 384 for Layer I);
- a leading ID3v2 tag (syncsafe size) and a trailing ID3v1 ``TAG``
  block are skipped; the "free" bitrate index refuses loudly (frame
  length would be a guess), as do reserved version/layer/rate codes
  and any non-frame bytes between frames — resync-by-scanning can
  silently skip real audio, which is not this module's posture;
- an opt-in ``tolerate_truncated_tail`` mode accepts the one defect
  a loud default throws real audio away over — a final frame cut off
  by a truncated download — stopping at the last complete frame and
  reporting the dropped byte count (see parse_mp3_timeline);
- Xing/Info (LAME) and VBRI (Fraunhofer) metadata frames: nearly
  every encoder since LAME writes one as the FIRST frame, and it
  carries no audio — a walk that counts it as an audio frame shifts
  every timestamp by one frame and overcounts the duration. The walk
  detects the tag at its spec offset (Xing/Info: right after the
  side info — 17/32 bytes for MPEG-1 mono/stereo, 9/17 for MPEG-2;
  VBRI: fixed 32 bytes past the header), excludes the frame from the
  timeline, and reports the tag's declared frame/byte counts.

Malformed framing raises ValueError naming the defect, like every codec
in :mod:`~sed_binning_spark.pipeline.multimodal`; the Spark operator
catches and degrades per its documented posture.
"""

# bitrate tables in kbps, index 1-14 (0 = free, 15 = invalid)
_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          25: (11025, 12000, 8000)}


def _parse_header(b0: int, b1: int, b2: int, b3: int):
    """(version, layer, bitrate_bps, sample_rate, padding, channels,
    frame_bytes, frame_samples) of a 4-byte MPEG audio frame header."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("MPEG audio frame without sync bits")
    vcode = (b1 >> 3) & 0x03
    if vcode == 1:
        raise ValueError("MPEG audio reserved version code")
    version = {0: 25, 2: 2, 3: 1}[vcode]
    lcode = (b1 >> 1) & 0x03
    if lcode == 0:
        raise ValueError("MPEG audio reserved layer code")
    layer = 4 - lcode  # code 3 → Layer I, 2 → II, 1 → III
    br_idx = (b2 >> 4) & 0x0F
    if br_idx == 0:
        raise ValueError(
            "MPEG audio free-format bitrate unsupported (frame length "
            "would be a guess)",
        )
    if br_idx == 15:
        raise ValueError("MPEG audio invalid bitrate index")
    table = _BITRATES[(1 if version == 1 else 2, layer)]
    bitrate = table[br_idx - 1] * 1000
    sr_idx = (b2 >> 2) & 0x03
    if sr_idx == 3:
        raise ValueError("MPEG audio reserved sample-rate code")
    rate = _RATES[version][sr_idx]
    padding = (b2 >> 1) & 0x01
    channels = 1 if (b3 >> 6) & 0x03 == 3 else 2
    if layer == 1:
        samples = 384
        frame = (12 * bitrate // rate + padding) * 4
    else:
        samples = 576 if (layer == 3 and version != 1) else 1152
        frame = samples // 8 * bitrate // rate + padding
    return version, layer, bitrate, rate, padding, channels, frame, samples


def _side_info_bytes(version: int, channels: int) -> int:
    """Layer III side-information length (ISO/IEC 11172-3 §2.4.1.7 /
    13818-3): MPEG-1 17 bytes mono / 32 stereo, MPEG-2/2.5 9 / 17."""
    if version == 1:
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def _vbr_header(
    data: bytes, pos: int, frame: int,
    version: int, channels: int,
) -> dict | None:
    """Detect a Xing/Info/VBRI metadata frame. ``pos`` is the frame's
    header offset, ``frame`` its declared length. Returns ``{"tag":
    "xing"|"info"|"vbri", "frames": int|None, "bytes": int|None}`` or
    None when the frame carries no tag. A tag whose declared fields run
    past the frame extent is malformed and refuses loudly — the magic
    at the exact spec offset is not a coincidence byte pattern.

    The declared counts are REPORTED, not enforced against the walk:
    they are an advisory duration hint written by the encoder, and
    crawled files are routinely re-cut after encoding (truncated
    downloads, stream rips) with every remaining frame still valid —
    refusing on a stale hint would throw away header-verified audio."""
    end = pos + frame
    at = pos + 4 + _side_info_bytes(version, channels)
    magic = data[at : at + 4]
    if magic in (b"Xing", b"Info"):
        if at + 8 > end:
            raise ValueError("MPEG audio Xing tag truncated by its frame")
        flags = int.from_bytes(data[at + 4 : at + 8], "big")
        fld = at + 8
        n_frames = n_bytes = None
        if flags & 0x1:
            if fld + 4 > end:
                raise ValueError(
                    "MPEG audio Xing frame-count field truncated",
                )
            n_frames = int.from_bytes(data[fld : fld + 4], "big")
            fld += 4
        if flags & 0x2:
            if fld + 4 > end:
                raise ValueError(
                    "MPEG audio Xing byte-count field truncated",
                )
            n_bytes = int.from_bytes(data[fld : fld + 4], "big")
        return {
            "tag": "xing" if magic == b"Xing" else "info",
            "frames": n_frames, "bytes": n_bytes,
        }
    at = pos + 4 + 32  # VBRI sits at a fixed offset (Fraunhofer spec)
    if data[at : at + 4] == b"VBRI":
        if at + 22 > end:
            raise ValueError("MPEG audio VBRI tag truncated by its frame")
        return {
            "tag": "vbri",
            "frames": int.from_bytes(data[at + 14 : at + 18], "big"),
            "bytes": int.from_bytes(data[at + 10 : at + 14], "big"),
        }
    return None


def parse_mp3_timeline(
    data: bytes, max_frames: int | None = None,
    tolerate_truncated_tail: bool = False,
) -> dict:
    """Per-frame timeline of an MPEG audio stream — ``{"codec":
    "mp3"/"mp2"/"mp1", "channels": int, "sample_rate": int,
    "bytes_dropped": int, "samples":
    [(start_ms, delay_ms, offset, n_bytes, keyframe), ...]}``, the same
    row shape as the other container timelines (every MPEG audio frame
    is independently decodable → keyframe True). A leading ID3v2 tag
    and a trailing ID3v1 block are skipped; codec/channels/rate come
    from the first frame and a mid-stream change of version/layer/rate
    refuses loudly (one stream, one clock).

    ``tolerate_truncated_tail=True`` opts into accepting the single
    most common defect in crawled MP3s: a FINAL frame cut off by a
    truncated download. When the last frame's declared length extends
    past EOF (or fewer than 4 header bytes remain after a clean frame
    boundary), the walk stops at the last complete frame and reports
    the dropped byte count as ``bytes_dropped`` instead of raising —
    recovering hours of valid audio per thousand crawled files without
    guessing at anything: every EMITTED row is still a complete,
    header-verified frame. Only the tail is tolerated; a header that
    fails to parse mid-stream stays loud (resync-by-scanning can
    silently skip real audio), and the default remains the loud
    refusal.

    A Xing/Info/VBRI metadata frame at the stream head (nearly every
    LAME/Fraunhofer encode has one) is excluded from ``samples`` — it
    carries no audio, so timestamps start at 0 on the first REAL frame
    — and surfaces as ``vbr_tag`` (``"xing"``/``"info"``/``"vbri"`` or
    None) with the tag's declared ``vbr_frames``/``vbr_bytes`` counts
    (None when absent; advisory, see _vbr_header)."""
    pos, n = 0, len(data)
    if data[:3] == b"ID3" and n >= 10:
        size = 0
        for byte in data[6:10]:  # syncsafe: 7 bits per byte
            if byte & 0x80:
                raise ValueError("ID3v2 size bytes must be syncsafe")
            size = (size << 7) | byte
        pos = 10 + size
        if data[5] & 0x10:  # ID3v2.4 footer: 10 bytes past the size
            pos += 10
    if n >= 128 and data[n - 128 : n - 125] == b"TAG":
        n -= 128
    if pos + 4 > n:
        raise ValueError("MPEG audio stream with no room for a frame")
    first = None
    out = []
    t_samples = 0
    dropped = 0
    vbr = None
    at_head = True
    while pos < n:
        # the cap check comes FIRST: frames past it must not be able to
        # abort an otherwise-valid capped parse (Ogg does the same)
        if max_frames is not None and len(out) >= int(max_frames):
            break
        if pos + 4 > n:
            if tolerate_truncated_tail and first is not None:
                dropped = n - pos
                break
            raise ValueError(
                "MPEG audio stream ends inside a frame header",
            )
        version, layer, _br, rate, _pad, channels, frame, samples = \
            _parse_header(*data[pos : pos + 4])
        if first is None:
            first = (version, layer, rate, channels)
        elif (version, layer, rate, channels) != first:
            raise ValueError(
                "MPEG audio stream changes version/layer/rate/channels "
                "mid-stream",
            )
        if pos + frame > n:
            # by construction this can only be the FINAL frame: the
            # walk stops here either way, so tolerating it never skips
            # mid-stream bytes
            if tolerate_truncated_tail and first is not None:
                dropped = n - pos
                break
            raise ValueError("MPEG audio frame extends past the file end")
        if at_head:
            at_head = False
            vbr = _vbr_header(data, pos, frame, version, channels)
            if vbr is not None:
                # the tag frame carries no audio: no timeline row, no
                # clock advance — the first REAL frame starts at 0
                pos += frame
                continue
        out.append((
            (t_samples * 1000 + rate // 2) // rate,
            (samples * 1000 + rate // 2) // rate,
            pos, frame, True,
        ))
        t_samples += samples
        pos += frame
    if first is None or not out:
        # covers the untolerated empty stream AND a tolerated tail that
        # left zero COMPLETE frames — an empty timeline over a file
        # that is 100% dropped bytes would just be a quieter refusal
        raise ValueError("MPEG audio stream has no frames")
    return {
        "codec": {1: "mp1", 2: "mp2", 3: "mp3"}[first[1]],
        "decodable": False,  # no MPEG audio decoder ships here
        "width": 0,
        "height": 0,
        "channels": first[3],
        "sample_rate": first[2],
        "bytes_dropped": dropped,
        "vbr_tag": vbr["tag"] if vbr else None,
        "vbr_frames": vbr["frames"] if vbr else None,
        "vbr_bytes": vbr["bytes"] if vbr else None,
        "samples": out,
    }


def encode_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 96,
    sample_rate: int = 32000,
    mono: bool = True,
    fill: int = 0,
    vbr_tag: bytes | None = None,
) -> bytes:
    """Spec-built MPEG-1 Layer III fixture: ``n_frames`` frames of the
    given constant bitrate/rate (the header walk needs only headers —
    payload bytes are ``fill``). 32 kHz makes the frame duration an
    exact 36 ms and common bitrates divide evenly, so fixture timing is
    closed-form. Rates that need padding refuse (keep fixtures exact).

    ``vbr_tag`` (``b"Xing"``/``b"Info"``/``b"VBRI"``) prepends a
    metadata frame the way LAME/Fraunhofer encoders do — same header
    as the audio frames, the tag at its spec offset, declaring
    ``n_frames`` audio frames and the total stream byte count."""
    table = _BITRATES[(1, 3)]
    if bitrate_kbps not in table:
        raise ValueError(f"bitrate {bitrate_kbps} not in the MPEG-1 "
                         f"Layer III table")
    rates = _RATES[1]
    if sample_rate not in rates:
        raise ValueError(f"sample rate {sample_rate} not an MPEG-1 rate")
    if (144 * bitrate_kbps * 1000) % sample_rate:
        raise ValueError(
            "bitrate/rate pair needs padding frames — pick an exact pair",
        )
    frame = 144 * bitrate_kbps * 1000 // sample_rate
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,           # MPEG-1, Layer III
        (table.index(bitrate_kbps) + 1) << 4
        | rates.index(sample_rate) << 2,           # no padding
        (3 << 6) if mono else 0,                   # mono / stereo
    ])
    one = hdr + bytes([fill]) * (frame - 4)
    if vbr_tag is None:
        return one * n_frames
    if vbr_tag not in (b"Xing", b"Info", b"VBRI"):
        raise ValueError(f"unknown VBR tag {vbr_tag!r}")
    tag = bytearray(one)
    total = frame * (n_frames + 1)
    if vbr_tag == b"VBRI":
        at = 4 + 32
        fields = (vbr_tag + (1).to_bytes(2, "big")      # version
                  + (0).to_bytes(2, "big")              # delay
                  + (0).to_bytes(2, "big")              # quality
                  + total.to_bytes(4, "big")
                  + n_frames.to_bytes(4, "big"))
    else:
        at = 4 + _side_info_bytes(1, 1 if mono else 2)
        fields = (vbr_tag + (0x3).to_bytes(4, "big")
                  + n_frames.to_bytes(4, "big")
                  + total.to_bytes(4, "big"))
    if at + len(fields) > frame:
        raise ValueError("frame too small to carry the VBR tag")
    tag[at : at + len(fields)] = fields
    return bytes(tag) + one * n_frames
