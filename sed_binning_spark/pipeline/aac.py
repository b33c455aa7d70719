"""ADTS (AAC) frame walking for the audio-timeline path — the framing
that carries most crawled AAC outside MP4: raw ``.aac`` files, HLS
audio segments, internet-radio rips. No AAC decoder ships here (same
posture as avc1/Opus/MPEG audio), but none is needed for a timeline:
every ADTS frame header carries the frame's full byte length as an
explicit 13-bit field and a fixed 1024-samples-per-raw-data-block
clock (ISO/IEC 14496-3 §1.A.2.2 / 13818-7 §6.2), so a pure header
walk yields exact per-frame timing and byte extents.

Implemented from the public spec:

- 12-bit syncword, the MPEG-4/MPEG-2 ID bit, layer (must be ``00`` —
  this is also what separates ADTS from an MPEG audio stream, whose
  valid layer codes are all non-zero), protection_absent (a CRC
  header is 9 bytes instead of 7; the CRC bytes are accounted in the
  walk's extents but not verified — ADTS CRC protects decoder-level
  raw-block boundaries, which belongs to a decoder, exactly as the
  MP3 walk treats its protection bit);
- profile (reported as the MPEG-4 audioObjectType name: Main/LC/SSR/
  LTP), the published sampling-frequency-index table (escape index 15
  refuses loudly — the rate would be a guess), channel_configuration
  (0, "defined in an inband PCE", refuses loudly: reporting a channel
  count we did not parse would be a lie);
- aac_frame_length (includes the header and CRC); zero-payload frames
  refuse; number_of_raw_data_blocks_in_frame scales the frame's
  sample count by ``1024 * (n + 1)``;
- a leading ID3v2 tag and a trailing ID3v1 block are skipped (crawled
  .aac files carry them like MP3s do); mid-stream parameter changes
  (ID/profile/rate/channels) refuse loudly — one stream, one clock;
- the same opt-in ``tolerate_truncated_tail`` contract as the MP3
  walk: a FINAL frame cut off by a truncated download stops the walk
  at the last complete frame and reports the dropped bytes, while
  mid-stream garbage stays loud in both modes.

Malformed framing raises ValueError naming the defect, like every
codec in :mod:`~sed_binning_spark.pipeline.multimodal`; the Spark
operator catches and degrades per its documented posture. No
counterpart exists in the reference repo (photoemission binning, no
media code); the format knowledge is the public ISO ADTS layout only.
"""

_RATE_TABLE = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)
_PROFILES = ("main", "lc", "ssr", "ltp")


def _skip_id3(data: bytes) -> tuple[int, int]:
    """(start, end) of the MPEG-audio-style payload region after a
    leading ID3v2 tag and before a trailing ID3v1 ``TAG`` block — the
    same tag grammar the MP3 walk skips (crawled .aac files carry
    them too)."""
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
    return pos, n


def looks_like_adts(data: bytes) -> bool:
    """True when the payload (past any leading ID3v2 tag) starts with
    an ADTS sync: 12 sync bits plus layer ``00``. The layer field is
    the discriminator against MPEG audio — a valid MP3/MP2/MP1 header
    always has a non-zero layer code, so the two walks cannot claim
    the same bytes."""
    try:
        pos, n = _skip_id3(data)
    except ValueError:
        return False
    h = data[pos : pos + 2]
    return (len(h) == 2 and pos + 2 <= n and h[0] == 0xFF
            and (h[1] & 0xF6) == 0xF0)


def parse_adts_timeline(
    data: bytes, max_frames: int | None = None,
    tolerate_truncated_tail: bool = False,
) -> dict:
    """Per-frame timeline of an ADTS AAC stream — ``{"codec":
    "aac-main"/"aac-lc"/"aac-ssr"/"aac-ltp", "channels": int,
    "sample_rate": int, "bytes_dropped": int, "samples": [(start_ms,
    delay_ms, offset, n_bytes, keyframe), ...]}`` — the same row shape
    as the other container timelines. Every ADTS frame is
    independently decodable → keyframe True. Frame duration is
    ``1024 · (raw_data_blocks + 1)`` samples on the stream's clock;
    start/delay are rounded to integer milliseconds exactly like the
    MP3 walk (the sample clock itself never accumulates rounding).

    ``tolerate_truncated_tail=True`` keeps the complete frames of a
    download-truncated file and reports the dangling byte count as
    ``bytes_dropped`` (see the MP3 walk for the contract rationale);
    the default refuses loudly."""
    pos, n = _skip_id3(data)
    if pos + 7 > n:
        raise ValueError("ADTS stream with no room for a frame header")
    first = None
    out = []
    t_samples = 0
    dropped = 0
    while pos < n:
        if max_frames is not None and len(out) >= int(max_frames):
            break
        if pos + 7 > n:
            if tolerate_truncated_tail and first is not None:
                dropped = n - pos
                break
            raise ValueError("ADTS stream ends inside a frame header")
        h = data[pos : pos + 7]
        if h[0] != 0xFF or (h[1] & 0xF0) != 0xF0:
            raise ValueError("ADTS frame without its sync bits")
        if (h[1] >> 1) & 0x3:
            raise ValueError("ADTS layer bits must be 00")
        protection_absent = h[1] & 0x1
        profile = (h[2] >> 6) & 0x3
        sf_idx = (h[2] >> 2) & 0xF
        if sf_idx >= len(_RATE_TABLE):
            raise ValueError(
                f"ADTS reserved sampling-frequency index {sf_idx}",
            )
        rate = _RATE_TABLE[sf_idx]
        channels = ((h[2] & 0x1) << 2) | (h[3] >> 6)
        if channels == 0:
            raise ValueError(
                "ADTS channel configuration 0 (inband PCE) unsupported",
            )
        if channels == 7:
            channels = 8  # config 7 is the 7.1 layout (spec table)
        frame = ((h[3] & 0x3) << 11) | (h[4] << 3) | (h[5] >> 5)
        blocks = (h[6] & 0x3) + 1
        header_len = 7 if protection_absent else 9
        if frame <= header_len:
            raise ValueError(
                f"ADTS frame length {frame} leaves no payload",
            )
        key = (h[1] >> 3) & 0x1, profile, rate, channels
        if first is None:
            first = key
        elif key != first:
            raise ValueError(
                "ADTS stream changes ID/profile/rate/channels mid-stream",
            )
        if pos + frame > n:
            # by construction only the FINAL frame can land here: the
            # walk stops either way, so tolerating never skips bytes
            if tolerate_truncated_tail:
                dropped = n - pos
                break
            raise ValueError("ADTS frame extends past the file end")
        samples = 1024 * blocks
        out.append((
            (t_samples * 1000 + rate // 2) // rate,
            (samples * 1000 + rate // 2) // rate,
            pos, frame, True,
        ))
        t_samples += samples
        pos += frame
    if first is None or not out:
        raise ValueError("ADTS stream has no frames")
    return {
        "codec": f"aac-{_PROFILES[first[1]]}",
        "decodable": False,  # no AAC decoder ships here
        "width": 0,
        "height": 0,
        "channels": first[3],
        "sample_rate": first[2],
        "bytes_dropped": dropped,
        "samples": out,
    }


def encode_adts_frames(
    payload_sizes: list[int],
    sample_rate: int = 16000,
    channels: int = 1,
    profile: int = 1,
    fill: int = 0,
) -> bytes:
    """Spec-built ADTS fixture: one protection-absent 7-byte header
    per frame, payload byte counts from ``payload_sizes`` (content is
    ``fill`` — the walk reads only headers). 16 kHz makes each
    1024-sample frame an exact 64 ms, so fixture timing is
    closed-form."""
    if sample_rate not in _RATE_TABLE:
        raise ValueError(f"sample rate {sample_rate} not an ADTS index")
    if not 1 <= channels <= 6:
        raise ValueError("fixture channel configuration must be 1-6")
    sf_idx = _RATE_TABLE.index(sample_rate)
    out = bytearray()
    for size in payload_sizes:
        frame = 7 + int(size)
        if size < 1 or frame > 0x1FFF:
            raise ValueError(f"payload size {size} out of ADTS range")
        out += bytes([
            0xFF,
            0xF0 | 0x1,                                 # MPEG-4, no CRC
            (profile << 6) | (sf_idx << 2) | (channels >> 2),
            ((channels & 0x3) << 6) | (frame >> 11),
            (frame >> 3) & 0xFF,
            ((frame & 0x7) << 5) | 0x1F,                # fullness hi
            0xFC,                                       # fullness lo, 1 block
        ])
        out += bytes([fill]) * int(size)
    return bytes(out)
