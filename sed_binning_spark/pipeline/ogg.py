"""Minimal Ogg/Opus demuxing for the audio-timeline path — the
speech-corpus sibling of :mod:`~sed_binning_spark.pipeline.mp4` and
:mod:`~sed_binning_spark.pipeline.webm`. No Opus decoder ships here,
but per-packet durations do NOT need one: RFC 6716 §3.1 derives every
packet's duration from its first byte (the TOC: config → frame size,
count code → frame count), so an Ogg Opus file yields a complete
per-packet timeline — timing, byte extents, channel count, pre-skip —
from container bytes plus one public-spec table lookup per packet.

Implemented from the public specs (RFC 3533 Ogg framing, RFC 7845 Ogg
Opus mapping, RFC 6716 Opus TOC):

- page walk: capture pattern, version 0, header flags, granule
  position, serial, sequence, CRC (verified — the polynomial is part of
  RFC 3533), segment lacing table; packets end at a lacing value < 255;
- the FIRST stream whose BOS packet starts with ``OpusHead`` is the
  track; its version/channels/pre-skip/input-rate come from that
  header, the following ``OpusTags`` packet is skipped;
- per-packet duration from the TOC byte: frame-size table by config
  (SILK 10/20/40/60 ms, hybrid 10/20, CELT 2.5/5/10/20 across the four
  bandwidths) × frame count (code 0→1, 1/2→2, 3→count byte & 0x3F,
  bounded by the spec's 120 ms packet ceiling);
- Vorbis streams refuse loudly: their per-packet timing requires
  codebook setup — emitting page-granule guesses would be dishonest;
- a packet continued across pages refuses loudly too (its bytes are
  not contiguous, so a (pos, size) extent would lie).

Malformed framing raises ValueError naming the defect, like every codec
in :mod:`~sed_binning_spark.pipeline.multimodal`; the Spark operator
catches and degrades per its documented posture.
"""
import struct
import zlib

import numpy as np

OGG_MAGIC = b"OggS"

# Opus TOC config → frame size in 48 kHz samples (RFC 6716 §3.1)
_OPUS_FRAME_SAMPLES = (
    [480, 960, 1920, 2880] * 3      # configs 0-11: SILK NB/MB/WB
    + [480, 960] * 2                # 12-15: hybrid SWB/FB
    + [120, 240, 480, 960] * 4      # 16-31: CELT NB/WB/SWB/FB
)

_CRC_TABLE = None

# 256-entry bit-reversal table for the fast CRC path (numpy take =
# memory-speed byte reflection)
_BITREV = np.array(
    [int(format(i, "08b")[::-1], 2) for i in range(256)], dtype=np.uint8,
)


def _ogg_crc_bytewise(data: bytes) -> int:
    """RFC 3533 page CRC, spec-literal: poly 0x04C11DB7, init 0, no
    reflection, no final xor — the table-driven byte walk straight from
    the polynomial. Kept as the reference implementation the fast path
    is pinned against (tests cross-check them on random pages); the
    walk itself uses :func:`_ogg_crc`."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        table = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000
                     else r << 1) & 0xFFFFFFFF
            table.append(r)
        _CRC_TABLE = table
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC via its reflected twin: an MSB-first CRC with
    init 0 / xorout 0 equals the bit-reversed LSB-first CRC of the
    byte-wise bit-reversed message over the same polynomial
    (0x04C11DB7 reflected = 0xEDB88320 — exactly ``zlib.crc32``'s).
    So the page check costs one numpy table ``take`` (the byte
    reflection) plus one C-speed ``zlib.crc32`` instead of a Python
    loop over every payload byte — the other container walks never
    touch payload bytes, and with this neither does Ogg's hot loop.
    ``zlib.crc32(t, 0xFFFFFFFF) ^ 0xFFFFFFFF`` strips zlib's fixed
    init/xorout conditioning to recover the raw init-0 register."""
    t = _BITREV[np.frombuffer(data, dtype=np.uint8)].tobytes()
    v = zlib.crc32(t, 0xFFFFFFFF) ^ 0xFFFFFFFF
    # reverse the 32-bit result back to MSB-first bit order
    v = ((v & 0x55555555) << 1) | ((v >> 1) & 0x55555555)
    v = ((v & 0x33333333) << 2) | ((v >> 2) & 0x33333333)
    v = ((v & 0x0F0F0F0F) << 4) | ((v >> 4) & 0x0F0F0F0F)
    return int.from_bytes((v & 0xFFFFFFFF).to_bytes(4, "little"), "big")


def opus_packet_samples(toc: int, count_byte: int | None = None) -> int:
    """Duration of an Opus packet in 48 kHz samples from its TOC byte
    (and, for frame-count code 3, the following byte)."""
    frame = _OPUS_FRAME_SAMPLES[toc >> 3]
    code = toc & 0x03
    if code == 0:
        n = 1
    elif code in (1, 2):
        n = 2
    else:
        if count_byte is None:
            raise ValueError(
                "Opus packet with frame-count code 3 but no count byte",
            )
        n = count_byte & 0x3F
        if n == 0:
            raise ValueError("Opus packet declares zero frames")
    if n * frame > 5760:  # the spec's 120 ms packet ceiling
        raise ValueError(
            f"Opus packet declares {n} frames of {frame} samples "
            f"(> the 120 ms ceiling)",
        )
    return n * frame


def _iter_pages(data: bytes):
    """Yield (flags, granule, serial, seq, segments, body_start) per
    page, where segments is the lacing-value list. CRC-checked."""
    pos, n = 0, len(data)
    while pos < n:
        if data[pos : pos + 4] != OGG_MAGIC:
            raise ValueError("Ogg page without the OggS capture pattern")
        if pos + 27 > n:
            raise ValueError("truncated Ogg page header")
        (version, flags, granule, serial, seq, crc, nseg) = struct.unpack_from(
            "<BBqIIIB", data, pos + 4,
        )
        if version != 0:
            raise ValueError(f"Ogg page version {version} unsupported")
        seg_end = pos + 27 + nseg
        if seg_end > n:
            raise ValueError("Ogg page truncates its segment table")
        segments = list(data[pos + 27 : seg_end])
        body_len = sum(segments)
        if seg_end + body_len > n:
            raise ValueError("Ogg page body extends past the file end")
        page = bytearray(data[pos : seg_end + body_len])
        page[22:26] = b"\x00" * 4  # CRC field zeroed for the check
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page {seq} fails its CRC check")
        yield flags, granule, serial, seq, segments, seg_end
        pos = seg_end + body_len


def parse_ogg_opus_timeline(
    data: bytes, max_frames: int | None = None,
) -> dict:
    """Per-packet timeline of the first Opus stream of an Ogg file —
    ``{"codec": "opus", "channels": int, "sample_rate": int (the
    OpusHead input rate; timing is at Opus's 48 kHz clock),
    "pre_skip": int, "samples": [(start_ms, delay_ms, offset, n_bytes,
    keyframe), ...]}`` — the same row shape as the MP4/WebM timelines
    (every Opus packet is independently decodable → keyframe True).
    ``start_ms``/``delay_ms`` come from the cumulative TOC-derived
    durations, rounded to nearest ms."""
    if data[:4] != OGG_MAGIC:
        raise ValueError("not an Ogg stream")
    opus_serial = None
    channels = rate = pre_skip = 0
    skipped_tags = False
    out = []
    t_samples = 0
    for flags, granule, serial, seq, segments, body_at in _iter_pages(data):
        if flags & 0x02:  # BOS
            body = data[body_at : body_at + sum(segments)]
            if body.startswith(b"OpusHead") and opus_serial is None:
                if len(body) < 19:
                    raise ValueError("OpusHead shorter than its fixed part")
                channels = body[9]
                pre_skip, rate = struct.unpack_from("<HI", body, 10)
                opus_serial = serial
                continue
            if body.startswith(b"\x01vorbis"):
                raise ValueError(
                    "Ogg Vorbis unsupported: per-packet timing requires "
                    "codebook decode (Opus carries it in the TOC byte)",
                )
            continue
        if serial != opus_serial:
            continue
        if flags & 0x01:
            raise ValueError(
                "Ogg packet continued across pages unsupported "
                "(its bytes are not contiguous, an extent would lie)",
            )
        if not skipped_tags:
            # the comment-header page must actually BE OpusTags —
            # blindly skipping it would silently drop a page of real
            # audio from a malformed stream
            body = data[body_at : body_at + sum(segments)]
            if not body.startswith(b"OpusTags"):
                raise ValueError(
                    "Ogg Opus stream without an OpusTags page where "
                    "RFC 7845 requires one",
                )
            skipped_tags = True
            continue
        pos = body_at
        plen = 0
        for i, lace in enumerate(segments):
            plen += lace
            if lace < 255:  # packet ends here
                if plen == 0:
                    # a zero-byte packet has no TOC and is invalid per
                    # RFC 7845 — refuse, don't silently drop it
                    raise ValueError("Ogg Opus zero-length packet")
                if max_frames is not None and len(out) >= int(max_frames):
                    return _result(channels, rate, pre_skip, out)
                toc = data[pos]
                nb = data[pos + 1] if plen > 1 else None
                dur = opus_packet_samples(toc, nb)
                out.append((
                    (t_samples * 1000 + 24000) // 48000,
                    (dur * 1000 + 24000) // 48000,
                    pos, plen, True,
                ))
                t_samples += dur
                pos += plen
                plen = 0
        if plen:  # trailing lacing value of 255: continues past the page
            raise ValueError(
                "Ogg packet continued across pages unsupported "
                "(its bytes are not contiguous, an extent would lie)",
            )
    if opus_serial is None:
        raise ValueError("Ogg stream has no Opus track")
    return _result(channels, rate, pre_skip, out)


def _result(channels, rate, pre_skip, samples) -> dict:
    return {
        "codec": "opus",
        "decodable": False,  # no Opus decoder ships here
        "width": 0,
        "height": 0,
        "channels": int(channels),
        "sample_rate": int(rate),
        "pre_skip": int(pre_skip),
        "samples": samples,
    }


# ---------------------------------------------------------- fixture writer
def _page(flags: int, granule: int, serial: int, seq: int,
          packets: list[bytes]) -> bytes:
    segments = []
    for p in packets:
        full, rest = divmod(len(p), 255)
        segments += [255] * full + [rest]
    if len(segments) > 255:
        raise ValueError("Ogg page with more than 255 segments")
    head = (OGG_MAGIC + struct.pack(
        "<BBqIIIB", 0, flags, granule, serial, seq, 0, len(segments),
    ) + bytes(segments))
    page = head + b"".join(packets)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def encode_ogg_opus(
    packets: list[bytes],
    channels: int = 1,
    sample_rate: int = 16000,
    pre_skip: int = 312,
    packets_per_page: int = 2,
    serial: int = 0x1234,
    comment_payload: bytes | None = None,
) -> bytes:
    """Spec-built Ogg Opus fixture: OpusHead BOS page + OpusTags page +
    data pages of ``packets_per_page`` packets each. Every packet's
    first byte must be a valid TOC (the writer derives granule
    positions from the same table the parser uses). Payload bytes after
    the TOC are arbitrary — no encoder exists here. ``comment_payload``
    replaces the default empty Vorbis-comment structure behind the
    ``OpusTags`` magic (RFC 7845 §5.2) — pass
    :func:`~sed_binning_spark.pipeline.tags.encode_vorbis_comment_block`
    output to build a tagged stream."""
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0))
    if comment_payload is None:
        comment_payload = (struct.pack("<I", 4) + b"spec"
                           + struct.pack("<I", 0))
    tags = b"OpusTags" + comment_payload
    out = _page(0x02, 0, serial, 0, [head])
    out += _page(0, 0, serial, 1, [tags])
    seq = 2
    # RFC 7845 §4: a data page's granule position is the cumulative
    # count of 48 kHz samples decoded through that page — pre-skip
    # samples are part of that count already, so the running total
    # starts at ZERO (seeding it at pre_skip would overcount every
    # page's position by pre_skip; pre_skip lives only in OpusHead)
    granule = 0
    for i in range(0, len(packets), packets_per_page):
        chunk = packets[i : i + packets_per_page]
        for p in chunk:
            nb = p[1] if len(p) > 1 else None
            granule += opus_packet_samples(p[0], nb)
        last = i + packets_per_page >= len(packets)
        out += _page(0x04 if last else 0, granule, serial, seq, chunk)
        seq += 1
    return out
