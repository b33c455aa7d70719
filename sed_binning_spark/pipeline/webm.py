"""Minimal WebM/Matroska (EBML) demuxing for the video frame-sampling
path — the metadata-only twin of :mod:`~sed_binning_spark.pipeline.mp4`
for the OTHER half of web-crawled video. No VP8/VP9/AV1 decoder ships
here (same posture as H.264): the container still yields every block's
presentation time, byte extent, and keyframe flag, which is what
frame-rate/duration/keyframe analyses and ``keyframes_only`` sampling
run on.

Implemented from the public Matroska/EBML specs (RFC 8794 + the
matroska.org element registry):

- EBML varints (IDs keep their marker bits, sizes strip them; the
  all-ones UNKNOWN size is honored for Segment — common in finalized
  files written by streaming muxers — and refused loudly for Cluster,
  where recovering the extent requires resynchronizing on sibling IDs);
- ``Segment → Info.TimestampScale`` (ns per tick, default 1,000,000 =
  1 ms), ``Tracks → TrackEntry`` (TrackNumber, TrackType, CodecID,
  DefaultDuration, Video.PixelWidth/PixelHeight), ``Cluster →
  Timestamp + SimpleBlock / BlockGroup(Block, BlockDuration,
  ReferenceBlock)``;
- SimpleBlock keyframe = its flags bit; Block-in-group keyframe = the
  group carries no ReferenceBlock;
- all three LACING formats (how real muxers pack small Opus/Vorbis
  packets — Xiph 255-run bytes, EBML delta-coded varints, fixed even
  division) decode to one row per laced frame with EXACT byte extents:
  every lacing format encodes exact sizes (RFC 8794 / Matroska
  §lacing), so nothing is guessed. Laced frame TIMESTAMPS step by the
  track's DefaultDuration (the spec's interpolation rule), else by an
  evenly dividing BlockDuration, else the frames share the block
  timestamp with a NULL delay — the container genuinely carries no
  finer clock.

Malformed framing raises ValueError naming the defect, like every codec
in :mod:`~sed_binning_spark.pipeline.multimodal`; the Spark operator
catches and degrades per its documented posture.
"""
import struct

EBML_MAGIC = b"\x1aE\xdf\xa3"

# element IDs (with marker bits, as they appear in the stream)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQUENCY = 0xB5  # EBML float (4 or 8 bytes)
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_BLOCK_DURATION = 0x9B
_REFERENCE_BLOCK = 0xFB


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    IDs keep the length-marker bit, sizes strip it; a stripped all-ones
    value means UNKNOWN size and returns None."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    if keep_marker:
        val = 0
        for b in data[pos : pos + length]:
            val = (val << 8) | b
    else:
        val = first & (0xFF >> length)
        all_ones = val == (0xFF >> length)
        for b in data[pos + 1 : pos + length]:
            val = (val << 8) | b
            all_ones = all_ones and b == 0xFF
        if all_ones:
            return None, pos + length
    return val, pos + length


def _iter_elements(data: bytes, pos: int, end: int,
                   allow_unknown: bool = False):
    """Yield (element_id, payload_start, payload_end) for the EBML
    elements in data[pos:end]. An element with the all-ones UNKNOWN
    size refuses unless ``allow_unknown`` (only the top level passes
    it, for streamed Segments) — with it, the element yields
    payload_end None and MUST be the last one consumed (its extent is
    undefined without schema knowledge). Refusing centrally keeps a
    nested 0xFF size byte from escaping as a non-ValueError into the
    Spark batch."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size is None:
            if not allow_unknown:
                raise ValueError(
                    f"EBML element 0x{eid:X} with unknown size "
                    f"(only a top-level Segment may omit its size here)",
                )
            yield eid, pos, None
            return
        if pos + size > end:
            raise ValueError(
                f"EBML element 0x{eid:X} declares {size} bytes, "
                f"{end - pos} available",
            )
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes, s: int, e: int, default: int = 0) -> int:
    """EBML unsigned integer; a ZERO-LENGTH element takes the schema
    default per RFC 8794 §6.1, not zero."""
    if e - s > 8:
        raise ValueError("EBML unsigned integer wider than 8 bytes")
    if e == s:
        return default
    return int.from_bytes(data[s:e], "big")


def _read_uint_vint(data: bytes, pos: int):
    """EBML varint as a PLAIN unsigned integer — for block track
    numbers and lace sizes, where the all-ones pattern is just a
    value (RFC 8794 reserves it as 'unknown' only for element DATA
    SIZES; a 1-byte 0xFF here means 127, and refusing it would reject
    valid third-party files)."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    val = first & (0xFF >> length)
    for b in data[pos + 1 : pos + length]:
        val = (val << 8) | b
    return val, pos + length


def _read_svint(data: bytes, pos: int):
    """EBML SIGNED varint (lace-size deltas): the unsigned value minus
    the length's bias 2^(7·len−1) − 1, per RFC 8794 §4 — all-ones is
    a representable value here (+bias + 1 ... i.e. the maximum), not
    a reserved pattern."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    length = 8 - data[pos].bit_length() + 1
    val, nxt = _read_uint_vint(data, pos)
    return val - ((1 << (7 * length - 1)) - 1), nxt


def _lace_sizes(data, p, e, lacing):
    """Per-frame byte sizes of a laced (Simple)Block body
    ``data[p:e]`` — all three Matroska lacing formats encode EXACT
    sizes (RFC 8794 / Matroska §lacing): Xiph as 255-run bytes, EBML
    as a plain vint then signed-vint deltas, fixed by even division;
    the LAST frame is always the remainder. Returns
    ``(sizes, frames_start)``."""
    if p >= e:
        raise ValueError("Matroska laced block with no frame count")
    n_frames = data[p] + 1
    p += 1
    sizes = []
    if lacing == 0x02:  # Xiph: 255-run bytes for all but the last
        for _ in range(n_frames - 1):
            size = 0
            while True:
                if p >= e:
                    raise ValueError(
                        "Matroska Xiph lacing truncates its size runs",
                    )
                size += data[p]
                last = data[p] < 255
                p += 1
                if last:
                    break
            sizes.append(size)
    elif lacing == 0x06:  # EBML: first plain, then signed deltas
        if n_frames > 1:
            size, p = _read_uint_vint(data, p)
            sizes.append(size)
            for _ in range(n_frames - 2):
                delta, p = _read_svint(data, p)
                size += delta
                if size < 0:
                    raise ValueError(
                        "Matroska EBML lacing walks a size below zero",
                    )
                sizes.append(size)
            if p > e:
                raise ValueError(
                    "Matroska EBML lacing truncates its size vints",
                )
    else:  # 0x04 fixed: the remainder divides evenly
        body = e - p
        if body % n_frames:
            raise ValueError(
                f"Matroska fixed lacing: {body} body bytes do not "
                f"divide into {n_frames} equal frames",
            )
        sizes = [body // n_frames] * (n_frames - 1)
    rem = (e - p) - sum(sizes)
    if rem < 0:
        raise ValueError(
            "Matroska lace sizes exceed the block body",
        )
    sizes.append(rem)  # the final frame is whatever bytes remain
    return sizes, p


def _parse_block(data, s, e, video_track, keyframe):
    """(rel_ts, [(pos, size), ...], keyframe) of a (Simple)Block when
    it belongs to ``video_track``, else None — one extent per frame,
    so a LACED block (how real muxers pack small Opus/Vorbis packets)
    yields every frame it carries with exact byte extents: all three
    lacing formats encode exact sizes, nothing is guessed. ``keyframe``
    None means 'read the SimpleBlock flags bit' (a laced block's flag
    covers every frame in it)."""
    # the track number is a plain unsigned vint — 0xFF means track
    # 127, not 'unknown size' (that reservation is for element sizes)
    track, p = _read_uint_vint(data, s)
    if p + 3 > e:
        raise ValueError("Matroska block shorter than its fixed header")
    if track != video_track:
        return None
    (rel,) = struct.unpack_from(">h", data, p)
    flags = data[p + 2]
    p += 3
    lacing = flags & 0x06
    if lacing:
        sizes, p = _lace_sizes(data, p, e, lacing)
    else:
        sizes = [e - p]
    if keyframe is None:
        keyframe = bool(flags & 0x80)
    extents = []
    for sz in sizes:
        extents.append((p, sz))
        p += sz
    return rel, extents, keyframe


def _ebml_float(data: bytes, s: int, e: int, default: float = 0.0) -> float:
    """EBML float (4/8 bytes); zero length → the schema default."""
    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    if e == s:
        return default
    raise ValueError(f"EBML float of {e - s} bytes")


def parse_webm_timeline(
    data: bytes, max_frames: int | None = None, media: str = "video",
) -> dict:
    """Container timeline of the FIRST video (or, with
    ``media="audio"``, audio) track of a WebM/Matroska stream — no
    payload decode: ``{"codec": str, "width": int, "height": int,
    "samples": [(start_ms, delay_ms, offset, n_bytes, keyframe), ...]}``,
    the same shape as
    :func:`~sed_binning_spark.pipeline.mp4.parse_mp4_timeline`; the
    audio mode adds ``channels`` and ``sample_rate`` (from the
    TrackEntry's Audio element) — the no-decode treatment for
    Opus/Vorbis speech corpora.

    ``start_ms`` = (cluster Timestamp + block relative timestamp) ×
    TimestampScale, in ms. ``delay_ms`` is the BlockGroup's
    BlockDuration when present, else the track's DefaultDuration, else
    None — Matroska does not require per-frame durations. Rows stay in
    container order. LACED blocks (Xiph/EBML/fixed — the normal shape
    of Matroska audio) contribute one row per laced frame with exact
    byte extents; their timestamps step by the track's DefaultDuration
    when it is declared (the spec's interpolation rule for laced
    frames), else by an evenly dividing BlockDuration, else all frames
    carry the block's timestamp and a NULL delay."""
    if media not in ("video", "audio"):
        raise ValueError(f"media must be 'video' or 'audio', got {media!r}")
    want_type = 1 if media == "video" else 2
    if data[:4] != EBML_MAGIC:
        raise ValueError("not an EBML (WebM/Matroska) stream")
    segment = None
    for eid, s, e in _iter_elements(data, 0, len(data), allow_unknown=True):
        if eid == _SEGMENT:
            segment = (s, len(data) if e is None else e)
            break
        if e is None:
            raise ValueError(
                f"EBML element 0x{eid:X} with unknown size before the "
                f"Segment",
            )
    if segment is None:
        raise ValueError("EBML stream has no Segment")

    scale_ns = 1_000_000
    video_track = None
    codec = ""
    width = height = 0
    audio_meta = (1, 8000.0)
    default_ms = None
    tracks_seen = False
    out = []
    for eid, s, e in _iter_elements(data, *segment):
        if eid == _INFO:
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 == _TIMESTAMP_SCALE:
                    scale_ns = _uint(data, s2, e2, default=1_000_000)
                    if scale_ns == 0:
                        raise ValueError("Matroska TimestampScale of zero")
        elif eid == _TRACKS and video_track is None:
            tracks_seen = True
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 != _TRACK_ENTRY:
                    continue
                num = ttype = None
                cid = ""
                w = h = 0
                chans, rate = 1, 8000.0  # Matroska audio defaults
                dd = None
                for i3, s3, e3 in _iter_elements(data, s2, e2):
                    if i3 == _TRACK_NUMBER:
                        num = _uint(data, s3, e3)
                    elif i3 == _TRACK_TYPE:
                        ttype = _uint(data, s3, e3)
                    elif i3 == _CODEC_ID:
                        cid = data[s3:e3].decode("ascii", "replace")
                    elif i3 == _DEFAULT_DURATION:
                        dd = _uint(data, s3, e3)
                    elif i3 == _VIDEO:
                        for i4, s4, e4 in _iter_elements(data, s3, e3):
                            if i4 == _PIXEL_WIDTH:
                                w = _uint(data, s4, e4)
                            elif i4 == _PIXEL_HEIGHT:
                                h = _uint(data, s4, e4)
                    elif i3 == _AUDIO:
                        for i4, s4, e4 in _iter_elements(data, s3, e3):
                            if i4 == _SAMPLING_FREQUENCY:
                                rate = _ebml_float(data, s4, e4,
                                                   default=8000.0)
                            elif i4 == _CHANNELS:
                                chans = _uint(data, s4, e4, default=1)
                if ttype == want_type and num is not None:  # first match
                    video_track, codec, width, height = num, cid, w, h
                    audio_meta = (chans, rate)
                    if dd:
                        default_ms = dd // 1_000_000  # ns → ms
                    break
        elif eid == _CLUSTER:
            if video_track is None:
                # distinguish a valid file that simply has no track of
                # the requested kind from a mis-ordered/malformed one
                raise ValueError(
                    f"Matroska stream has no {media} track"
                    if tracks_seen else
                    f"Matroska Cluster before any {media} TrackEntry",
                )

            def _emit(rel, extents, kf, total_ms=None):
                """Rows for one (possibly laced) block. Frame 0 starts
                at the block's timestamp; successive LACED frames step
                by the track's DefaultDuration (the spec's own
                interpolation rule for laced frames), else by an evenly
                dividing BlockDuration (it covers the whole block), else
                they share the block timestamp with a NULL delay —
                Matroska genuinely carries no finer per-frame clock."""
                base_ms = (cluster_ts + rel) * scale_ns // 1_000_000
                n = len(extents)
                if n == 1:
                    d = total_ms if total_ms is not None else default_ms
                    out.append((base_ms, d, *extents[0], kf))
                    return
                step = default_ms
                if step is None and total_ms is not None \
                        and total_ms % n == 0:
                    step = total_ms // n
                for i, (pos, size) in enumerate(extents):
                    out.append((
                        base_ms + i * step if step is not None else base_ms,
                        step, pos, size, kf,
                    ))

            cluster_ts = 0
            for i2, s2, e2 in _iter_elements(data, s, e):
                if max_frames is not None and len(out) >= int(max_frames):
                    return _result(codec, width, height,
                                   out[: int(max_frames)], media,
                                   audio_meta)
                if i2 == _CLUSTER_TIMESTAMP:
                    cluster_ts = _uint(data, s2, e2)
                elif i2 == _SIMPLE_BLOCK:
                    got = _parse_block(data, s2, e2, video_track, None)
                    if got is not None:
                        _emit(*got)
                elif i2 == _BLOCK_GROUP:
                    block = None
                    dur = None
                    referenced = False
                    for i3, s3, e3 in _iter_elements(data, s2, e2):
                        if i3 == _BLOCK:
                            block = (s3, e3)
                        elif i3 == _BLOCK_DURATION:
                            dur = _uint(data, s3, e3)
                        elif i3 == _REFERENCE_BLOCK:
                            referenced = True
                    if block is None:
                        raise ValueError(
                            "Matroska BlockGroup without a Block",
                        )
                    # keyframe ⇔ the group references no other block
                    got = _parse_block(
                        data, block[0], block[1], video_track,
                        not referenced,
                    )
                    if got is not None:
                        rel, extents, kf = got
                        # BlockDuration spans the WHOLE block (the sum
                        # over laced frames), in timestamp ticks
                        _emit(rel, extents, kf,
                              dur * scale_ns // 1_000_000
                              if dur is not None else None)
    if video_track is None:
        raise ValueError(f"Matroska stream has no {media} track")
    if max_frames is not None:
        out = out[: int(max_frames)]  # one laced block can overshoot
    return _result(codec, width, height, out, media, audio_meta)


def _result(codec, width, height, samples, media="video",
            audio_meta=(1, 8000.0)) -> dict:
    out = {
        "codec": codec,
        # VP8/VP9/AV1/Opus/Vorbis: no decoder ships here
        "decodable": False,
        "width": int(width),
        "height": int(height),
        "samples": samples,
    }
    if media == "audio":
        out["channels"] = int(audio_meta[0])
        out["sample_rate"] = float(audio_meta[1])
    return out


# ---------------------------------------------------------- fixture writer
def _vint_size(value: int) -> bytes:
    """Encode an EBML SIZE (marker bit in the first byte)."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:  # all-ones is reserved
            out = value | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError(f"EBML size {value} too large")


def _elem(eid: int, payload: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + _vint_size(len(payload)) + payload


def _uint_elem(eid: int, value: int) -> bytes:
    width = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(width, "big"))


def _svint(value: int) -> bytes:
    """Encode an EBML SIGNED varint (lace-size delta): pick the
    shortest length whose bias covers the value, store value + bias."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= value <= bias:
            return ((value + bias) | (1 << (7 * length))).to_bytes(
                length, "big",
            )
    raise ValueError(f"EBML signed varint {value} too large")


def _lace_bytes(frames: list[bytes], lacing: str) -> bytes:
    """Lacing header (count byte + size data) for a laced block whose
    LAST frame's size is implicit (the remainder)."""
    out = bytes([len(frames) - 1])
    if lacing == "xiph":
        for f in frames[:-1]:
            full, rest = divmod(len(f), 255)
            out += bytes([255] * full + [rest])
    elif lacing == "ebml":
        if len(frames) > 1:
            out += _vint_size(len(frames[0]))
            for prev, cur in zip(frames, frames[1:-1]):
                out += _svint(len(cur) - len(prev))
    elif lacing == "fixed":
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing requires equal frame sizes")
    else:
        raise ValueError(f"unknown lacing {lacing!r}")
    return out


def encode_webm(
    frames: list[bytes],
    times_ms: list[int],
    keyframes: list[bool] | None = None,
    width: int = 0,
    height: int = 0,
    codec_id: str = "V_VP9",
    blocks_per_cluster: int = 2,
    default_duration_ms: int | None = None,
    use_block_groups: bool = False,
    track_number: int = 1,
    track_type: int = 1,
    channels: int = 1,
    sample_rate: float = 48000.0,
    lacing: str | None = None,
    frames_per_block: int = 1,
) -> bytes:
    """Spec-built WebM fixture: one video track whose Clusters carry the
    given payloads as SimpleBlocks (or BlockGroups with
    ``use_block_groups`` — keyframes become absent ReferenceBlocks and
    per-block durations are written from the time deltas). Cluster
    Timestamps anchor each group of ``blocks_per_cluster`` blocks; the
    block-relative timestamps carry the remainder. ``track_type=2``
    writes an AUDIO track (Audio element with ``channels`` and a
    float64 ``sample_rate``) — the fixture shape for
    parse_webm_timeline's ``media="audio"`` mode.

    ``lacing`` ("xiph" / "ebml" / "fixed") packs ``frames_per_block``
    consecutive payloads into ONE laced (Simple)Block — how real muxers
    write Opus/Vorbis — whose timestamp and keyframe flag come from the
    block's FIRST frame; the laced frames' own times are implied by the
    track clock (write a ``default_duration_ms`` to make them
    recoverable), so only each block's first entry of ``times_ms`` is
    written to the container."""
    if len(frames) != len(times_ms):
        raise ValueError("one timestamp per frame, please")
    if keyframes is not None and len(keyframes) != len(frames):
        raise ValueError("one keyframe flag per frame, please")
    if lacing is not None and frames_per_block < 1:
        raise ValueError("frames_per_block must be >= 1")
    header = _elem(0x1A45DFA3, b"".join([
        _uint_elem(0x4286, 1),            # EBMLVersion
        _uint_elem(0x42F7, 1),            # EBMLReadVersion
        _uint_elem(0x42F2, 4),            # EBMLMaxIDLength
        _uint_elem(0x42F3, 8),            # EBMLMaxSizeLength
        _elem(0x4282, b"webm"),           # DocType
        _uint_elem(0x4287, 2),            # DocTypeVersion
        _uint_elem(0x4285, 2),            # DocTypeReadVersion
    ]))
    info = _elem(_INFO, _uint_elem(_TIMESTAMP_SCALE, 1_000_000))
    if track_type == 2:
        media_elem = _elem(_AUDIO, _elem(
            _SAMPLING_FREQUENCY, struct.pack(">d", sample_rate),
        ) + _uint_elem(_CHANNELS, channels))
    else:
        media_elem = _elem(_VIDEO, _uint_elem(_PIXEL_WIDTH, width)
                           + _uint_elem(_PIXEL_HEIGHT, height))
    entry = (_uint_elem(_TRACK_NUMBER, track_number)
             + _uint_elem(_TRACK_TYPE, track_type)
             + _elem(_CODEC_ID, codec_id.encode("ascii")))
    if default_duration_ms is not None:
        entry += _uint_elem(_DEFAULT_DURATION, default_duration_ms * 1_000_000)
    entry += media_elem
    tracks = _elem(_TRACKS, _elem(_TRACK_ENTRY, entry))
    # group payloads into blocks: singleton blocks normally, runs of
    # frames_per_block under lacing (a block's time/keyframe = its
    # first frame's)
    fpb = frames_per_block if lacing is not None else 1
    blocks = [list(range(i, min(i + fpb, len(frames))))
              for i in range(0, len(frames), fpb)]
    clusters = b""
    for i in range(0, len(blocks), blocks_per_cluster):
        base = times_ms[blocks[i][0]]
        body = _uint_elem(_CLUSTER_TIMESTAMP, base)
        for grp_ids in blocks[i : i + blocks_per_cluster]:
            j = grp_ids[0]
            kf = keyframes[j] if keyframes is not None else True
            rel = times_ms[j] - base
            payload = [frames[k] for k in grp_ids]
            lace_flag = 0
            lace_hdr = b""
            if lacing is not None:
                lace_flag = {"xiph": 0x02, "fixed": 0x04,
                             "ebml": 0x06}[lacing]
                lace_hdr = _lace_bytes(payload, lacing)
            blk = (_vint_size(track_number)
                   + struct.pack(">h", rel)
                   + bytes([(0x80 if (kf and not use_block_groups) else 0)
                            | lace_flag])
                   + lace_hdr + b"".join(payload))
            if use_block_groups:
                grp = _elem(_BLOCK, blk)
                last = grp_ids[-1]
                nxt = times_ms[last + 1] if last + 1 < len(frames) else None
                if nxt is not None:
                    # BlockDuration spans the WHOLE (laced) block
                    grp += _uint_elem(_BLOCK_DURATION, nxt - times_ms[j])
                if not kf:
                    grp += _elem(_REFERENCE_BLOCK, b"\x7f")
                body += _elem(_BLOCK_GROUP, grp)
            else:
                body += _elem(_SIMPLE_BLOCK, blk)
        clusters += _elem(_CLUSTER, body)
    segment = _elem(_SEGMENT, info + tracks + clusters)
    return header + segment
