"""Media TAG extraction — the metadata-mining half of the media tier.
A training-data pipeline wants the title/artist/lyrics/comment text
embedded in crawled audio and video files (it is caption-grade text
paired with the media), and every mainstream container carries it in
one of five public tag grammars, all implemented here from their
public specs:

- **ID3v2.2/2.3/2.4** (id3.org informal standards) on MPEG-audio and
  ADTS streams: text frames (``T***`` incl. ``TXXX``), comments
  (``COMM``) and lyrics (``USLT``), all four text encodings (latin-1,
  UTF-16 with BOM, UTF-16BE, UTF-8), unsynchronisation (global in
  v2.3, per-frame in v2.4), extended headers, v2.3/v2.4 frame flags
  (zlib-compressed frames are inflated; encrypted frames are skipped
  — their content is unreadable by construction), padding, and the
  v2.2 3-byte frame grammar;
- **ID3v1** (the trailing 128-byte ``TAG`` block) as the fallback when
  no v2 tag exists;
- **Vorbis comments** (the Xiph spec) behind three carriers: the FLAC
  ``VORBIS_COMMENT`` metadata block (RFC 9639 §8.6), the Ogg Opus
  ``OpusTags`` header packet (RFC 7845 §5.2), and the Ogg Vorbis
  comment header packet (``\\x03vorbis``, framing bit verified);
- **MP4 ilst** (the iTunes-style ISO 14496-12 ``moov→udta→meta→ilst``
  path): UTF-8 ``data`` atoms (type indicator 1) under the well-known
  ``©nam``-family keys; binary atoms (artwork, ``trkn``) are skipped;
- **RIFF LIST-INFO** chunks in WAV files (the Multimedia Programming
  Interface spec): ``INAM``-family ASCII values;
- **Exif** (TIFF 6.0 IFDs per Exif 2.x) behind JPEG ``APP1`` segments
  and WebP ``EXIF`` chunks — Make/Model/DateTime/ImageDescription/
  Artist/Copyright/Software/Orientation plus the Exif sub-IFD's
  DateTimeOriginal and UserComment (charset prefix honored) — with
  JPEG ``COM`` comment segments alongside;
- **PNG textual chunks** (W3C PNG §11.3): ``tEXt``, ``zTXt``
  (deflate), and ``iTXt`` (UTF-8, optionally deflate), CRC-verified;
- **GIF comment extensions** (GIF89a §24), image data skipped by
  sub-block lengths without LZW decode;
- **Matroska/WebM native tags** (matroska.org element registry):
  the Segment ``Title`` in Info and ``Tags → Tag → SimpleTag``
  name/string pairs (nested SimpleTags included), via the same EBML
  walk as :mod:`~sed_binning_spark.pipeline.webm`.

Keys are normalized to one lowercase vocabulary (``title``,
``artist``, ``album``, ``date``, ``genre``, ``comment``, ``lyrics``,
...) so downstream text analyses are container-agnostic; frames
without a canonical name keep their lowercased native id. Repeated
keys yield repeated pairs — the Spark operator emits one row per tag,
and joining is the consumer's choice.

Malformed tag structures raise ValueError naming the defect, the same
loud posture as every codec in the media tier; the Spark operator
(:func:`extract_media_tags`) catches per payload and degrades that
payload to zero rows, keeping the batch alive.

No counterpart exists in the reference repo (photoemission binning,
no media code); the format knowledge is the public specs named above.
"""

from __future__ import annotations

import struct
import zlib

_ID3_KEYMAP = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TDRC": "date", "TYER": "date", "TCON": "genre", "TRCK": "track",
    "TLEN": "length", "TSSE": "encoder", "TPE2": "album_artist",
    "TCOM": "composer", "TPUB": "publisher", "TCOP": "copyright",
    "TLAN": "language", "TIT3": "subtitle", "TIT1": "grouping",
    "TDRL": "release_date", "TOPE": "original_artist",
    "TSOT": "title_sort", "TSOP": "artist_sort",
}
_ID3_22_KEYMAP = {
    "TT2": "title", "TP1": "artist", "TAL": "album", "TYE": "date",
    "TCO": "genre", "TRK": "track", "TP2": "album_artist",
    "TCM": "composer", "TCR": "copyright", "TLA": "language",
    "TSS": "encoder", "TLE": "length",
}
_ILST_KEYMAP = {
    b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album",
    b"\xa9day": "date", b"\xa9gen": "genre", b"\xa9cmt": "comment",
    b"\xa9too": "encoder", b"\xa9lyr": "lyrics",
    b"aART": "album_artist", b"\xa9wrt": "composer",
    b"cprt": "copyright",
    # the podcast shapes: iTunes description/long-description/keywords
    b"desc": "description", b"ldes": "description",
    b"\xa9des": "description", b"keyw": "keywords",
    b"purl": "podcast_url", b"tvsh": "show",
}
_RIFF_KEYMAP = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album",
    b"ICRD": "date", b"IGNR": "genre", b"ICMT": "comment",
    b"ISFT": "encoder", b"ICOP": "copyright", b"ILNG": "language",
}
_ENCODINGS = ("latin-1", "utf-16", "utf-16-be", "utf-8")


def _syncsafe(raw: bytes) -> int:
    out = 0
    for byte in raw:
        if byte & 0x80:
            raise ValueError("ID3v2 syncsafe byte with its top bit set")
        out = (out << 7) | byte
    return out


def _de_unsync(raw: bytes) -> bytes:
    """Reverse ID3v2 unsynchronisation: every 0xFF 0x00 pair was the
    escape for a raw 0xFF byte."""
    return raw.replace(b"\xff\x00", b"\xff")


def _id3_texts(enc: int, raw: bytes) -> list[str]:
    """Decode an ID3v2 text body: encoding byte semantics per the
    spec, null-terminated/null-separated value lists, padding
    stripped."""
    if enc >= len(_ENCODINGS):
        raise ValueError(f"ID3v2 text encoding {enc} is not defined")
    term = b"\x00\x00" if enc in (1, 2) else b"\x00"
    step = len(term)
    parts, pos = [], 0
    while pos < len(raw):
        at = raw.find(term, pos)
        # UTF-16 terminators must be code-unit aligned
        while at != -1 and step == 2 and (at - pos) % 2:
            at = raw.find(term, at + 1)
        if at == -1:
            parts.append(raw[pos:])
            break
        parts.append(raw[pos:at])
        pos = at + step
    out = []
    for p in parts:
        if not p:
            continue
        try:
            out.append(p.decode(_ENCODINGS[enc]))
        except UnicodeDecodeError as exc:
            raise ValueError(f"ID3v2 text fails to decode: {exc}") from exc
    return out


def _id3_split_desc(enc: int, raw: bytes) -> tuple[str, str]:
    """(description, text) of a TXXX/COMM/USLT body (past the language
    bytes): the description ends at the encoding's terminator."""
    term = b"\x00\x00" if enc in (1, 2) else b"\x00"
    at = raw.find(term)
    while at != -1 and len(term) == 2 and at % 2:
        at = raw.find(term, at + 1)
    if at == -1:
        raise ValueError("ID3v2 frame body without its description "
                         "terminator")
    desc = _id3_texts(enc, raw[:at])
    text = _id3_texts(enc, raw[at + len(term) :])
    return ("; ".join(desc), "; ".join(text))


def parse_id3v2(data: bytes) -> tuple[list[tuple[str, str]], int]:
    """``(tags, tag_end)`` of a leading ID3v2 tag — ``([], 0)`` when
    the payload does not start with one. ``tag_end`` is the offset of
    the first byte past the tag (including a v2.4 footer), which is
    where the audio stream starts."""
    tags, _chapters, tag_end = parse_id3v2_full(data)
    return tags, tag_end


def parse_id3v2_full(
    data: bytes,
) -> tuple[list[tuple[str, str]], list[tuple[int, int, int, str]],
           int]:
    """``(tags, chapters, tag_end)`` of a leading ID3v2 tag in ONE
    frame walk — the entry for callers that want both (the manifest
    triage pass); chapters carry ``(index, start_ms, end_ms, title)``
    sorted by start time. ``([], [], 0)`` when the payload does not
    start with an ID3v2 tag."""
    if data[:3] != b"ID3" or len(data) < 10:
        return [], [], 0
    major, _rev, flags = data[3], data[4], data[5]
    if major not in (2, 3, 4):
        raise ValueError(f"ID3v2.{major} is not a published tag version")
    if major == 2:
        size = _syncsafe(data[6:10])
        end = 10 + size
        if end > len(data):
            raise ValueError("ID3v2 tag extends past the file end")
        body = data[10:end]
        if flags & 0x40:
            # v2.2 defines no compression scheme; the spec's own advice
            # is that a compressed tag is unreadable
            raise ValueError("ID3v2.2 compression flag set — "
                             "unreadable by spec")
        if flags & 0x80:
            body = _de_unsync(body)
        # v2.2 predates the chapter addendum
        return _parse_id3v22_frames(body), [], end
    body, pos, major, tag_end = _id3v2_tag_body(data)
    tags: list[tuple[str, str]] = []
    chapters: list[tuple[int, int, str]] = []
    for key, fbody in _id3v2_frames(body, major, pos):
        if key == "TXXX":
            desc, text = _id3_split_desc(fbody[0], fbody[1:])
            tags.append((desc.lower() or "txxx", text))
        elif key in ("COMM", "USLT"):
            if len(fbody) < 4:
                raise ValueError(f"ID3v2 {key} frame too short for its "
                                 f"language bytes")
            _desc, text = _id3_split_desc(fbody[0], fbody[4:])
            tags.append((
                "comment" if key == "COMM" else "lyrics", text,
            ))
        elif key == "APIC":
            # artwork: report the declared mime, no image decode
            mime, _, _rest = fbody[1:].partition(b"\x00")
            tags.append(("artwork", mime.decode("latin-1")))
        elif key == "CHAP":
            chapters.append(_parse_chap_frame(fbody, major))
        elif key.startswith("T"):
            tags.append((
                _ID3_KEYMAP.get(key, key.lower()),
                "; ".join(_id3_texts(fbody[0], fbody[1:])),
            ))
        # other non-text frames (UFID, GEOB, ...) carry no tag text
    chapters.sort(key=lambda c: c[0])
    return tags, [
        (i + 1, s, e, t) for i, (s, e, t) in enumerate(chapters)
    ], tag_end


def _parse_chap_frame(
    fbody: bytes, major: int,
) -> tuple[int, int, str]:
    """(start_ms, end_ms, title) of one CHAP frame body (the id3.org
    Chapter Frame Addendum): element id, 32-bit times, byte offsets
    (ignored), then embedded ordinary frames — the title is the
    embedded TIT2."""
    _elem, _, rest = fbody.partition(b"\x00")
    if len(rest) < 16:
        raise ValueError("CHAP frame too short for its time/offset "
                         "fields")
    start, end_t = struct.unpack_from(">II", rest, 0)
    if end_t < start:
        raise ValueError(
            f"CHAP ends at {end_t} ms before it starts at {start} ms",
        )
    title = ""
    for sk, sb in _id3v2_frames(rest, major, 16):
        if sk == "TIT2":
            title = "; ".join(_id3_texts(sb[0], sb[1:]))
            break
    return start, end_t, title


def _id3v2_frames(body: bytes, major: int, pos: int = 0):
    """Yield ``(frame_id, body)`` per v2.3/v2.4 frame in
    ``body[pos:]`` with every frame-level flag transform applied
    (grouping byte, unsynchronisation, data-length indicator, zlib
    inflation); encrypted frames are skipped (unreadable by
    construction). Shared by the tag walk and the CHAP chapter walk
    (chapters embed ordinary frames)."""
    while pos + 10 <= len(body):
        fid = body[pos : pos + 4]
        if fid[0] == 0:  # zero padding ends the frame region
            return
        if not all(0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A for b in fid):
            raise ValueError(f"ID3v2 frame id {fid!r} is not A-Z0-9")
        if major == 4:
            fsize = _syncsafe(body[pos + 4 : pos + 8])
        else:
            fsize = struct.unpack_from(">I", body, pos + 4)[0]
        fflags = struct.unpack_from(">H", body, pos + 8)[0]
        fbody = body[pos + 10 : pos + 10 + fsize]
        if len(fbody) != fsize:
            raise ValueError("ID3v2 frame extends past the tag")
        pos += 10 + fsize
        encrypted = fflags & (0x0040 if major == 3 else 0x0004)
        if encrypted:
            continue  # unreadable by construction — skip the frame
        if major == 3:
            compressed = fflags & 0x0080
            if compressed:
                fbody = fbody[4:]  # 4-byte decompressed size first
            if fflags & 0x0020:
                fbody = fbody[1:]  # grouping identity byte
            if compressed:
                fbody = zlib.decompress(fbody)
        else:
            if fflags & 0x0040:
                fbody = fbody[1:]  # grouping identity byte
            if fflags & 0x0002:
                fbody = _de_unsync(fbody)
            dli = fflags & 0x0001
            if dli:
                fbody = fbody[4:]  # syncsafe data-length indicator
            if fflags & 0x0008:
                if not dli:
                    raise ValueError(
                        "ID3v2.4 compressed frame without its data-"
                        "length indicator",
                    )
                fbody = zlib.decompress(fbody)
        yield fid.decode("ascii"), fbody


def _id3v2_tag_body(data: bytes) -> tuple[bytes, int, int, int]:
    """(body, frame_start, major, tag_end) of a leading v2.3/v2.4 tag
    with tag-level unsync reversed and the extended header skipped —
    ([], ...) shapes raise like parse_id3v2; v2.2 is not chaptered."""
    major, _rev, flags = data[3], data[4], data[5]
    size = _syncsafe(data[6:10])
    end = 10 + size
    if end > len(data):
        raise ValueError("ID3v2 tag extends past the file end")
    tag_end = end + 10 if (major == 4 and flags & 0x10) else end
    body = data[10:end]
    if major == 3 and flags & 0x80:
        body = _de_unsync(body)
    pos = 0
    if flags & 0x40:
        if major == 3:
            pos = 4 + struct.unpack_from(">I", body, 0)[0]
        else:
            pos = _syncsafe(body[0:4])
        if pos > len(body):
            raise ValueError("ID3v2 extended header exceeds the tag")
    return body, pos, major, tag_end


def parse_id3v2_chapters(
    data: bytes,
) -> list[tuple[int, int, int, str]]:
    """``(index, start_ms, end_ms, title)`` chapters of a leading
    ID3v2.3/2.4 tag's ``CHAP`` frames (the id3.org Chapter Frame
    Addendum — how podcasts carry their chapter list), sorted by
    start time; ``[]`` when the payload has no ID3v2 tag or no CHAP
    frames. See :func:`parse_id3v2_full` for the single-walk form."""
    _tags, chapters, _end = parse_id3v2_full(data)
    return chapters


def _parse_id3v22_frames(body: bytes) -> list[tuple[str, str]]:
    tags: list[tuple[str, str]] = []
    pos = 0
    while pos + 6 <= len(body):
        fid = body[pos : pos + 3]
        if fid[0] == 0:
            break
        fsize = int.from_bytes(body[pos + 3 : pos + 6], "big")
        fbody = body[pos + 6 : pos + 6 + fsize]
        if len(fbody) != fsize:
            raise ValueError("ID3v2.2 frame extends past the tag")
        pos += 6 + fsize
        key = fid.decode("ascii", "replace")
        if key == "TXX":
            desc, text = _id3_split_desc(fbody[0], fbody[1:])
            tags.append((desc.lower() or "txx", text))
        elif key == "COM":
            _desc, text = _id3_split_desc(fbody[0], fbody[4:])
            tags.append(("comment", text))
        elif key.startswith("T"):
            tags.append((
                _ID3_22_KEYMAP.get(key, key.lower()),
                "; ".join(_id3_texts(fbody[0], fbody[1:])),
            ))
    return tags


def parse_id3v1(data: bytes) -> list[tuple[str, str]]:
    """Tags of a trailing ID3v1 block — ``[]`` when absent. Fields are
    fixed-width latin-1, NUL/space padded; the genre byte is a table
    index and is not reported (no text)."""
    if len(data) < 128 or data[-128:-125] != b"TAG":
        return []
    blk = data[-128:]

    def _f(a: int, b: int) -> str:
        return blk[a:b].split(b"\x00")[0].decode("latin-1").strip()

    out = [("title", _f(3, 33)), ("artist", _f(33, 63)),
           ("album", _f(63, 93)), ("date", _f(93, 97))]
    # ID3v1.1: comment truncated to 28 bytes + NUL + track byte
    if blk[125] == 0 and blk[126] != 0:
        out.append(("comment", _f(97, 125)))
        out.append(("track", str(blk[126])))
    else:
        out.append(("comment", _f(97, 127)))
    return [(k, v) for k, v in out if v]


def parse_vorbis_comments(
    buf: bytes, framing: bool = False,
) -> list[tuple[str, str]]:
    """Tag pairs of a Vorbis-comment structure (the Xiph spec):
    little-endian vendor length/string, comment count, ``KEY=value``
    UTF-8 entries. ``framing=True`` additionally requires the Vorbis
    framing bit after the last comment (the Ogg Vorbis carrier sets
    it; FLAC and OpusTags do not)."""
    if len(buf) < 8:
        raise ValueError("Vorbis comment block too short for its header")
    vlen = struct.unpack_from("<I", buf, 0)[0]
    pos = 4 + vlen
    if pos + 4 > len(buf):
        raise ValueError("Vorbis comment vendor string overruns the block")
    count = struct.unpack_from("<I", buf, pos)[0]
    pos += 4
    tags: list[tuple[str, str]] = []
    for _ in range(count):
        if pos + 4 > len(buf):
            raise ValueError("Vorbis comment count overruns the block")
        clen = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        if pos + clen > len(buf):
            raise ValueError("Vorbis comment entry overruns the block")
        entry = buf[pos : pos + clen]
        pos += clen
        eq = entry.find(b"=")
        if eq < 1:
            raise ValueError("Vorbis comment entry without KEY=value")
        key = entry[:eq].decode("ascii", "strict").lower()
        if key == "metadata_block_picture":
            # the Xiph artwork convention: a base64 FLAC PICTURE block
            import base64
            import binascii

            try:
                blk = base64.b64decode(entry[eq + 1 :], validate=True)
            except binascii.Error as exc:
                raise ValueError(
                    f"METADATA_BLOCK_PICTURE is not base64: {exc}",
                ) from exc
            tags.append(_flac_picture(blk))
            continue
        tags.append((key, entry[eq + 1 :].decode("utf-8")))
    if framing and not (pos < len(buf) and buf[pos] & 0x1):
        raise ValueError("Vorbis comment header without its framing bit")
    return tags


def _flac_picture(buf: bytes) -> tuple[str, str]:
    """``("artwork", "<mime> <w>x<h>")`` of a FLAC PICTURE block body
    (RFC 9639 §8.8) — the block declares its own dimensions, no image
    decode needed."""
    if len(buf) < 8:
        raise ValueError("FLAC PICTURE block too short for its header")
    mlen = int.from_bytes(buf[4:8], "big")
    pos = 8 + mlen
    if pos + 4 > len(buf):
        raise ValueError("FLAC PICTURE mime string overruns the block")
    mime = buf[8:pos].decode("latin-1")
    dlen = int.from_bytes(buf[pos : pos + 4], "big")
    pos += 4 + dlen
    if pos + 16 > len(buf):
        raise ValueError("FLAC PICTURE description overruns the block")
    width = int.from_bytes(buf[pos : pos + 4], "big")
    height = int.from_bytes(buf[pos + 4 : pos + 8], "big")
    return ("artwork", f"{mime} {width}x{height}")


def _flac_tags(data: bytes) -> list[tuple[str, str]]:
    pos, n = 4, len(data)
    comments: list[tuple[str, str]] = []
    pictures: list[tuple[str, str]] = []
    while True:
        if pos + 4 > n:
            raise ValueError("FLAC metadata block header truncated")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + size > n:
            raise ValueError("FLAC metadata block extends past the file")
        if btype == 4:
            comments += parse_vorbis_comments(data[pos + 4 : pos + 4 + size])
        elif btype == 6:
            pictures.append(_flac_picture(data[pos + 4 : pos + 4 + size]))
        pos += 4 + size
        if last:
            return comments + pictures


def _ogg_packets(data: bytes, limit: int):
    """The first ``limit`` packets of the FIRST Ogg stream, assembled
    across lacing and page continuation (header packets — comment
    blocks with artwork — routinely span pages)."""
    from sed_binning_spark.pipeline.ogg import _iter_pages

    serial0 = None
    packets: list[bytes] = []
    partial = bytearray()
    for flags, _g, serial, _q, segments, body_at in _iter_pages(data):
        if serial0 is None:
            serial0 = serial
        if serial != serial0:
            continue
        if not (flags & 0x1) and partial:
            raise ValueError(
                "Ogg page drops a continued packet mid-assembly",
            )
        at = body_at
        for lace in segments:
            partial += data[at : at + lace]
            at += lace
            if lace < 255:
                packets.append(bytes(partial))
                partial.clear()
                if len(packets) >= limit:
                    return packets
    return packets


def _ogg_tags(data: bytes) -> list[tuple[str, str]]:
    pkts = _ogg_packets(data, 3)
    if not pkts:
        raise ValueError("Ogg stream has no packets")
    head = pkts[0]
    if head[:8] == b"OpusHead":
        if len(pkts) < 2 or pkts[1][:8] != b"OpusTags":
            raise ValueError("Ogg Opus stream without its OpusTags "
                             "packet")
        return parse_vorbis_comments(pkts[1][8:])
    if head[:7] == b"\x01vorbis":
        if len(pkts) < 2 or pkts[1][:7] != b"\x03vorbis":
            raise ValueError("Ogg Vorbis stream without its comment "
                             "header")
        return parse_vorbis_comments(pkts[1][7:], framing=True)
    if head[:5] == b"\x7fFLAC":
        # Ogg FLAC mapping: the BOS packet wraps the native fLaC magic
        # + STREAMINFO at offset 9; later header packets are raw
        # metadata blocks — find the VORBIS_COMMENT one
        for pkt in pkts[1:]:
            if pkt and (pkt[0] & 0x7F) == 4:
                size = int.from_bytes(pkt[1:4], "big")
                if 4 + size > len(pkt):
                    raise ValueError(
                        "Ogg FLAC comment block overruns its packet",
                    )
                return parse_vorbis_comments(pkt[4 : 4 + size])
        return []
    raise ValueError("Ogg stream is not Opus, Vorbis, or FLAC")


def _mp4_tags(data: bytes) -> list[tuple[str, str]]:
    from sed_binning_spark.pipeline.mp4 import (
        _find, _full_box, _iter_boxes,
    )

    n = len(data)
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    udta = _find(data, moov[0], moov[1], b"udta")
    meta = (_find(data, udta[0], udta[1], b"meta")
            if udta is not None else None)
    if meta is None:
        # some writers hang meta directly off moov, skipping udta
        meta = _find(data, moov[0], moov[1], b"meta")
    if meta is None:
        return []
    # meta is a FULL box: 4 bytes of version/flags before its children
    ilst = _find(data, meta[0] + 4, meta[1], b"ilst")
    if ilst is None:
        return []
    tags: list[tuple[str, str]] = []
    for item, s, e in _iter_boxes(data, ilst[0], ilst[1]):
        d = _find(data, s, e, b"data")
        if d is None:
            continue
        _v, dtype = _full_box(data, d[0])
        if item == b"covr" and dtype in (13, 14):
            # cover art: the data-atom type indicator names the codec
            tags.append((
                "artwork", "image/jpeg" if dtype == 13 else "image/png",
            ))
            continue
        if dtype != 1:
            continue  # not UTF-8 text (trkn, binary, ...) — no tag text
        text = data[d[0] + 8 : d[1]].decode("utf-8")
        if item == b"----":
            # the freeform shape: mean/name boxes carry the key
            name = _find(data, s, e, b"name")
            key = (data[name[0] + 4 : name[1]].decode("utf-8").lower()
                   if name else "----")
        else:
            key = _ILST_KEYMAP.get(
                item, item.decode("latin-1").strip().lower())
        tags.append((key, text))
    return tags


def _riff_tags(data: bytes) -> list[tuple[str, str]]:
    if len(data) < 12 or data[8:12] != b"WAVE":
        raise ValueError("RIFF payload is not a WAVE file")
    pos, n = 12, len(data)
    tags: list[tuple[str, str]] = []
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"RIFF chunk {cid!r} extends past the file")
        if cid == b"bext" and size >= 256 + 32 + 32 + 10 + 8:
            # EBU Broadcast Wave (BWF, EBU Tech 3285): fixed-width
            # latin-1 description/originator + origination date/time —
            # how archival speech corpora carry their provenance
            def _bw(a: int, b: int) -> str:
                return body[a:b].split(b"\x00")[0].decode(
                    "latin-1").strip()

            for key, val in (
                ("description", _bw(0, 256)),
                ("originator", _bw(256, 288)),
                ("date", _bw(320, 330)),
            ):
                if val:
                    tags.append((key, val))
        elif cid == b"LIST" and body[:4] == b"INFO":
            at = 4
            while at + 8 <= size:
                sid, ssz = struct.unpack_from("<4sI", body, at)
                val = body[at + 8 : at + 8 + ssz]
                if len(val) != ssz:
                    raise ValueError(
                        f"RIFF INFO entry {sid!r} extends past its LIST",
                    )
                text = val.split(b"\x00")[0].decode(
                    "utf-8", "replace").strip()
                if text:
                    tags.append((
                        _RIFF_KEYMAP.get(
                            sid, sid.decode("latin-1").strip().lower()),
                        text,
                    ))
                at += 8 + ssz + (ssz & 1)  # word-aligned
        pos += 8 + size + (size & 1)
    return tags


# ---------------------------------------------------------------------------
# image containers: Exif (TIFF 6.0 IFDs) in JPEG APP1 / WebP EXIF,
# JPEG COM comments, PNG tEXt/zTXt/iTXt, GIF comment extensions

_EXIF_KEYMAP = {
    0x010E: "description", 0x010F: "make", 0x0110: "model",
    0x0112: "orientation", 0x0131: "encoder", 0x0132: "date",
    0x013B: "artist", 0x8298: "copyright",
}
_EXIF_SUB_KEYMAP = {0x9003: "date_original", 0x9286: "comment"}
_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
_PNG_KEYMAP = {
    "title": "title", "author": "artist", "description": "description",
    "comment": "comment", "copyright": "copyright",
    "software": "encoder", "creation time": "date", "source": "source",
}


def parse_tiff_exif(data: bytes) -> list[tuple[str, str]]:
    """Tag pairs of a TIFF/Exif blob (TIFF 6.0 + Exif 2.x): IFD0's
    text-bearing fields plus the Exif sub-IFD (0x8769) ones —
    DateTimeOriginal and UserComment (charset prefix honored). ASCII
    fields decode as latin-1 (byte-preserving; crawled Exif routinely
    lies about its encoding); SHORT/LONG scalars (orientation) render
    as decimal strings; structural overruns raise ValueError."""
    if data[:6] == b"Exif\x00\x00":  # the APP1/WebP chunk prefix
        data = data[6:]
    if data[:4] == b"II*\x00":
        en = "<"
    elif data[:4] == b"MM\x00*":
        en = ">"
    else:
        raise ValueError("Exif payload lacks the TIFF II*/MM* header")
    n = len(data)

    def _value(typ: int, cnt: int, at: int) -> bytes:
        size = _TIFF_TYPE_SIZES[typ] * cnt
        if size <= 4:
            return data[at : at + size]
        off = struct.unpack_from(en + "I", data, at)[0]
        if off + size > n:
            raise ValueError("TIFF value extends past the file")
        return data[off : off + size]

    def _rationals(raw: bytes, cnt: int) -> list[float]:
        out = []
        for i in range(cnt):
            num, den = struct.unpack_from(en + "II", raw, 8 * i)
            if den == 0:
                raise ValueError("TIFF rational with a zero denominator")
            out.append(num / den)
        return out

    def _gps_walk(off: int) -> str | None:
        """``DD.DDDDDD[NS] DD.DDDDDD[EW]`` of a GPS sub-IFD (Exif 2.x
        GPSLatitude/Longitude degree-minute-second rationals) — the
        geo-PII a curation pipeline scrubs or filters on."""
        if off + 2 > n:
            raise ValueError("GPS IFD offset past the file")
        cnt = struct.unpack_from(en + "H", data, off)[0]
        if off + 2 + 12 * cnt + 4 > n:
            raise ValueError("GPS IFD entry table extends past the file")
        refs, coords = {}, {}
        for i in range(cnt):
            at = off + 2 + 12 * i
            tag, typ, vc = struct.unpack_from(en + "HHI", data, at)
            if tag in (1, 3) and typ == 2:  # LatitudeRef / LongitudeRef
                raw = _value(typ, vc, at + 8)
                refs[tag] = raw.split(b"\x00")[0].decode("latin-1")
            elif tag in (2, 4) and typ == 5 and vc == 3:  # D/M/S
                d, m, s = _rationals(_value(typ, vc, at + 8), 3)
                coords[tag] = d + m / 60 + s / 3600
        if 2 in coords and 4 in coords:
            return (f"{coords[2]:.6f}{refs.get(1, '?')} "
                    f"{coords[4]:.6f}{refs.get(3, '?')}")
        return None

    def _walk(off: int, keymap: dict) -> tuple[list, int | None]:
        if off + 2 > n:
            raise ValueError("TIFF IFD offset past the file")
        cnt = struct.unpack_from(en + "H", data, off)[0]
        if off + 2 + 12 * cnt + 4 > n:
            raise ValueError("TIFF IFD entry table extends past the file")
        got, sub = [], None
        for i in range(cnt):
            at = off + 2 + 12 * i
            tag, typ, vc = struct.unpack_from(en + "HHI", data, at)
            if typ not in _TIFF_TYPE_SIZES:
                continue  # valid TIFF we don't mine text from
            if tag == 0x8769 and typ == 4:
                sub = struct.unpack_from(en + "I", data, at + 8)[0]
                continue
            if tag == 0x8825 and typ == 4:  # GPSInfo pointer
                gps = _gps_walk(
                    struct.unpack_from(en + "I", data, at + 8)[0],
                )
                if gps is not None:
                    got.append(("gps", gps))
                continue
            key = keymap.get(tag)
            if key is None:
                continue
            raw = _value(typ, vc, at + 8)
            if typ == 2:
                text = raw.split(b"\x00")[0].decode("latin-1").strip()
            elif typ in (3, 4):
                fmt = en + ("H" if typ == 3 else "I")
                text = str(struct.unpack_from(fmt, raw, 0)[0])
            elif typ == 7 and tag == 0x9286:
                charset, body = raw[:8], raw[8:]
                if charset == b"ASCII\x00\x00\x00":
                    text = body.decode("latin-1").rstrip("\x00 ")
                elif charset == b"UNICODE\x00":
                    text = body.decode(
                        "utf-16-le" if en == "<" else "utf-16-be",
                    ).rstrip("\x00")
                else:
                    text = body.decode("latin-1").rstrip("\x00 ")
            else:
                continue
            if text:
                got.append((key, text))
        return got, sub

    ifd0 = struct.unpack_from(en + "I", data, 4)[0]
    tags, sub = _walk(ifd0, _EXIF_KEYMAP)
    if sub is not None:
        more, _ = _walk(sub, _EXIF_SUB_KEYMAP)
        tags += more
    return tags


def _jpeg_tags(data: bytes) -> list[tuple[str, str]]:
    """APP1-Exif + COM tags of a JPEG stream: the marker walk stops at
    SOS (metadata segments precede entropy-coded data by spec)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tags: list[tuple[str, str]] = []
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker walk lost sync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code (the repo's image decoder accepts them too)
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS — no metadata past here
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("JPEG segment extends past the file")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tags += parse_tiff_exif(body[6:])
        elif marker == 0xFE:  # COM
            try:
                text = body.decode("utf-8")
            except UnicodeDecodeError:
                text = body.decode("latin-1")
            if text:
                tags.append(("comment", text))
        pos += 2 + seg_len
    return tags


def _png_tags(data: bytes) -> list[tuple[str, str]]:
    """tEXt / zTXt / iTXt textual chunks of a PNG stream (W3C PNG §11.3),
    chunk CRCs verified."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    tags: list[tuple[str, str]] = []
    pos, n = 8, len(data)
    while pos + 8 <= n:
        size, ctype = struct.unpack_from(">I4s", data, pos)
        end = pos + 8 + size
        if end + 4 > n:
            raise ValueError(f"PNG chunk {ctype!r} extends past the file")
        body = data[pos + 8 : end]
        crc = struct.unpack_from(">I", data, end)[0]
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG chunk {ctype!r} fails its CRC")
        if ctype == b"tEXt":
            key, _, val = body.partition(b"\x00")
            tags.append((_png_key(key), val.decode("latin-1")))
        elif ctype == b"zTXt":
            key, _, rest = body.partition(b"\x00")
            if not rest or rest[0] != 0:
                raise ValueError("zTXt compression method is not deflate")
            tags.append((
                _png_key(key), zlib.decompress(rest[1:]).decode("latin-1"),
            ))
        elif ctype == b"iTXt":
            key, _, rest = body.partition(b"\x00")
            if len(rest) < 2:
                raise ValueError("iTXt chunk truncated before its flags")
            compressed, method = rest[0], rest[1]
            rest = rest[2:]
            _lang, _, rest = rest.partition(b"\x00")
            _tkey, _, raw = rest.partition(b"\x00")
            if compressed:
                if method != 0:
                    raise ValueError(
                        "iTXt compression method is not deflate",
                    )
                raw = zlib.decompress(raw)
            tags.append((_png_key(key), raw.decode("utf-8")))
        elif ctype == b"IEND":
            break
        pos = end + 4
    return tags


def _png_key(raw: bytes) -> str:
    key = raw.decode("latin-1")
    return _PNG_KEYMAP.get(key.lower(), key.lower())


def _gif_tags(data: bytes) -> list[tuple[str, str]]:
    """Comment-extension text of a GIF stream (GIF89a §24): the block
    walk skips image data by its sub-block lengths, no LZW decode."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("GIF truncated inside its logical screen")
    flags = data[10]
    pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    n = len(data)
    tags: list[tuple[str, str]] = []

    def _skip_subblocks(at: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if at >= n:
                raise ValueError("GIF sub-blocks run past the file")
            ln = data[at]
            if ln == 0:
                return b"".join(chunks), at + 1
            chunks.append(data[at + 1 : at + 1 + ln])
            if at + 1 + ln > n:
                raise ValueError("GIF sub-block extends past the file")
            at += 1 + ln

    while pos < n:
        blk = data[pos]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension
            if pos + 2 > n:
                raise ValueError("GIF extension truncated")
            label = data[pos + 1]
            body, pos = _skip_subblocks(pos + 2)
            if label == 0xFE and body:
                tags.append(("comment", body.decode("latin-1")))
        elif blk == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise ValueError("GIF image descriptor truncated")
            iflags = data[pos + 9]
            pos += 10 + (3 * (2 << (iflags & 0x07)) if iflags & 0x80
                         else 0)
            if pos >= n:
                raise ValueError("GIF image truncated before its LZW "
                                 "code size")
            _, pos = _skip_subblocks(pos + 1)
        else:
            raise ValueError(f"GIF block type 0x{blk:02x} is not defined")
    return tags


def _webp_tags(data: bytes) -> list[tuple[str, str]]:
    """Exif tags of a WebP container: the RIFF chunk walk finds the
    ``EXIF`` chunk (WebP container spec; VP8X extended files)."""
    pos, n = 12, len(data)
    while pos + 8 <= n:
        cc, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"WebP chunk {cc!r} extends past the file")
        if cc == b"EXIF":
            return parse_tiff_exif(body)
        pos += 8 + size + (size & 1)
    return []


# ---------------------------------------------------------------------------
# Matroska/WebM native tags (matroska.org element registry):
# Segment → Info.Title and Segment → Tags → Tag → SimpleTag

_MKV_INFO = 0x1549A966
_MKV_TITLE = 0x7BA9
_MKV_TAGS = 0x1254C367
_MKV_TAG = 0x7373
_MKV_SIMPLE_TAG = 0x67C8
_MKV_TAG_NAME = 0x45A3
_MKV_TAG_STRING = 0x4487
_MKV_KEYMAP = {"date_released": "date", "description": "description"}


def _matroska_simple_tag(
    data: bytes, s: int, e: int, out: list, depth: int = 0,
) -> None:
    from sed_binning_spark.pipeline.webm import _iter_elements

    if depth > 16:
        # each EBML level costs ≥ 2 header bytes, so a crafted payload
        # could nest ~len/2 deep — bound it before the recursion does
        raise ValueError("SimpleTag nesting deeper than 16 levels")
    name = value = None
    nested = []
    for eid, s2, e2 in _iter_elements(data, s, e):
        if eid == _MKV_TAG_NAME:
            name = data[s2:e2].decode("utf-8")
        elif eid == _MKV_TAG_STRING:
            value = data[s2:e2].decode("utf-8")
        elif eid == _MKV_SIMPLE_TAG:
            nested.append((s2, e2))
    if name and value is not None:
        key = name.lower()
        out.append((_MKV_KEYMAP.get(key, key), value))
    for s2, e2 in nested:  # spec: SimpleTags nest (e.g. part numbers)
        _matroska_simple_tag(data, s2, e2, out, depth + 1)


def _matroska_tags(data: bytes) -> list[tuple[str, str]]:
    """Segment Title + Tags/SimpleTag pairs of a WebM/Matroska stream.
    SimpleTag names normalize to the same lowercase vocabulary (the
    registry's names are uppercase by convention — TITLE, ARTIST,
    DATE_RELEASED, ...)."""
    from sed_binning_spark.pipeline.webm import (
        _SEGMENT, _iter_elements,
    )

    segment = None
    for eid, s, e in _iter_elements(data, 0, len(data),
                                    allow_unknown=True):
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
    tags: list[tuple[str, str]] = []
    for eid, s, e in _iter_elements(data, *segment):
        if eid == _MKV_INFO:
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 == _MKV_TITLE:
                    title = data[s2:e2].decode("utf-8")
                    if title:
                        tags.append(("title", title))
        elif eid == _MKV_TAGS:
            for i2, s2, e2 in _iter_elements(data, s, e):
                if i2 == _MKV_TAG:
                    for i3, s3, e3 in _iter_elements(data, s2, e2):
                        if i3 == _MKV_SIMPLE_TAG:
                            _matroska_simple_tag(data, s3, e3, tags)
    return tags


def parse_media_tags(data: bytes) -> dict:
    """``{"container": str, "tags": [(key, value), ...]}`` of a media
    payload, dispatched on its magic — the five tag grammars in the
    module docstring. MPEG-audio/ADTS payloads prefer the leading
    ID3v2 tag and fall back to a trailing ID3v1 block; a recognized
    container with no tags returns an empty list (that is an answer,
    not a defect); an unrecognized payload refuses loudly."""
    if data[:4] == b"fLaC":
        return {"container": "flac", "tags": _flac_tags(data)}
    if data[:4] == b"OggS":
        return {"container": "ogg", "tags": _ogg_tags(data)}
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return {"container": "mp4", "tags": _mp4_tags(data)}
    if data[:4] == b"RIFF":
        if data[8:12] == b"WEBP":
            return {"container": "webp", "tags": _webp_tags(data)}
        return {"container": "wav", "tags": _riff_tags(data)}
    if data[:4] == b"\x1aE\xdf\xa3":
        return {"container": "webm", "tags": _matroska_tags(data)}
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return {"container": "png", "tags": _png_tags(data)}
    if data[:2] == b"\xff\xd8":
        return {"container": "jpeg", "tags": _jpeg_tags(data)}
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return {"container": "gif", "tags": _gif_tags(data)}
    from sed_binning_spark.pipeline.aac import looks_like_adts

    is_adts = looks_like_adts(data)
    if (data[:3] == b"ID3" or is_adts
            or (len(data) >= 4 and data[0] == 0xFF
                and data[1] & 0xE0 == 0xE0)
            or (len(data) >= 128 and data[-128:-125] == b"TAG")):
        tags, _end = parse_id3v2(data)
        if not tags:
            tags = parse_id3v1(data)
        return {"container": "aac" if is_adts else "mp3", "tags": tags}
    raise ValueError("payload carries no recognized tag container")


# ---------------------------------------------------------------------------
# fixture builders (spec-built, used by tests and the oracle legs)

def encode_id3v2(
    frames: list[tuple[str, str]], version: int = 3,
    unsync: bool = False,
) -> bytes:
    """Spec-built ID3v2.3/2.4 tag block: text frames from ``(frame_id,
    text)`` pairs (``TXXX:desc`` ids become TXXX frames; ``COMM:desc``
    comments; ``USLT:desc`` lyrics). Encoding picks itself: latin-1
    when the text fits (utf-8 for v2.4 otherwise, utf-16 with BOM for
    v2.3). ``unsync=True`` applies v2.3 global unsynchronisation."""
    if version not in (3, 4):
        raise ValueError("fixture supports ID3v2.3 / v2.4 only")
    body = bytearray()
    for fid, text in frames:
        desc = None
        if ":" in fid:
            fid, desc = fid.split(":", 1)
        if fid == "APIC":
            # text = the mime; a tiny deterministic payload stands in
            # for the image (the parser reports the mime, not pixels)
            fbody = (b"\x00" + text.encode("latin-1") + b"\x00"
                     + b"\x03\x00" + b"\x89PNGfake")
            size = (_to_syncsafe(len(fbody)) if version == 4
                    else len(fbody).to_bytes(4, "big"))
            body += b"APIC" + size + b"\x00\x00" + fbody
            continue
        try:
            enc, raw = 0, text.encode("latin-1")
        except UnicodeEncodeError:
            enc, raw = ((3, text.encode("utf-8")) if version == 4
                        else (1, text.encode("utf-16")))
        term = b"\x00\x00" if enc == 1 else b"\x00"
        if fid == "TXXX":
            fbody = bytes([enc]) + (
                desc or "").encode("latin-1" if enc == 0 else "utf-8") \
                + term + raw
            if enc == 1:
                fbody = bytes([enc]) + (desc or "").encode("utf-16") \
                    + term + raw
        elif fid in ("COMM", "USLT"):
            dd = (desc or "").encode("latin-1") if enc == 0 else b""
            if enc == 1:
                dd = (desc or "").encode("utf-16")
            elif enc == 3:
                dd = (desc or "").encode("utf-8")
            fbody = bytes([enc]) + b"eng" + dd + term + raw
        else:
            fbody = bytes([enc]) + raw
        size = (_to_syncsafe(len(fbody)) if version == 4
                else len(fbody).to_bytes(4, "big"))
        body += fid.encode("ascii") + size + b"\x00\x00" + fbody
    flags = 0
    if unsync:
        if version != 3:
            raise ValueError("fixture unsync is the v2.3 global form")
        body = bytearray(bytes(body).replace(b"\xff", b"\xff\x00"))
        flags |= 0x80
    return (b"ID3" + bytes([version, 0, flags])
            + _to_syncsafe(len(body)) + bytes(body))


def encode_id3v2_chapters(
    chapters: list[tuple[int, int, str]],
    version: int = 3,
    frames: list[tuple[str, str]] | None = None,
) -> bytes:
    """An ID3v2 tag whose ``CHAP`` frames carry ``(start_ms, end_ms,
    title)`` chapters (embedded TIT2 sub-frames, offsets unused =
    0xFFFFFFFF per the addendum), optionally alongside ordinary
    ``frames`` — prepend to an MPEG audio stream for a chaptered
    podcast fixture."""
    if version not in (3, 4):
        raise ValueError("fixture supports ID3v2.3 / v2.4 only")
    base = encode_id3v2(frames or [], version=version)
    body = bytearray(base[10:])
    for i, (start, end, title) in enumerate(chapters):
        sub = bytes([0]) + title.encode("latin-1")
        sub_size = (_to_syncsafe(len(sub)) if version == 4
                    else len(sub).to_bytes(4, "big"))
        embedded = b"TIT2" + sub_size + b"\x00\x00" + sub
        fbody = (f"ch{i}".encode("ascii") + b"\x00"
                 + struct.pack(">IIII", start, end,
                               0xFFFFFFFF, 0xFFFFFFFF)
                 + embedded)
        size = (_to_syncsafe(len(fbody)) if version == 4
                else len(fbody).to_bytes(4, "big"))
        body += b"CHAP" + size + b"\x00\x00" + fbody
    return (base[:6] + _to_syncsafe(len(body)) + bytes(body))


def _to_syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("size too large for a syncsafe int")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def encode_id3v1(
    title: str = "", artist: str = "", album: str = "",
    year: str = "", comment: str = "", track: int = 0,
) -> bytes:
    """The trailing 128-byte ID3v1(.1) block — append to an MPEG audio
    stream. Fields are latin-1, NUL-padded to their fixed widths; a
    nonzero ``track`` selects the v1.1 shape (comment truncated to 28
    bytes + NUL + track byte)."""
    def _w(text: str, width: int) -> bytes:
        raw = text.encode("latin-1")
        if len(raw) > width:
            raise ValueError(f"ID3v1 field {text!r} exceeds {width} bytes")
        return raw + b"\x00" * (width - len(raw))

    blk = b"TAG" + _w(title, 30) + _w(artist, 30) + _w(album, 30) \
        + _w(year, 4)
    if track:
        if not 1 <= track <= 255:
            raise ValueError("ID3v1.1 track must be 1..255")
        blk += _w(comment, 28) + b"\x00" + bytes([track])
    else:
        blk += _w(comment, 30)
    return blk + b"\xff"  # genre 255 = unset


def encode_vorbis_comment_block(
    tags: list[tuple[str, str]], vendor: str = "sed-binning-spark",
) -> bytes:
    """A raw Vorbis-comment structure (no carrier framing)."""
    v = vendor.encode("utf-8")
    out = struct.pack("<I", len(v)) + v + struct.pack("<I", len(tags))
    for k, val in tags:
        entry = k.upper().encode("ascii") + b"=" + val.encode("utf-8")
        out += struct.pack("<I", len(entry)) + entry
    return out


def add_flac_vorbis_comments(
    flac: bytes, tags: list[tuple[str, str]],
    vendor: str = "sed-binning-spark",
) -> bytes:
    """Splice a VORBIS_COMMENT metadata block into a native FLAC
    stream right after STREAMINFO (whose last-block flag moves to the
    new block when it was set)."""
    if flac[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    size = int.from_bytes(flac[5:8], "big")
    head_end = 8 + size
    last = flac[4] & 0x80
    block = encode_vorbis_comment_block(tags, vendor)
    hdr = bytes([(0x80 if last else 0) | 4]) + len(block).to_bytes(3, "big")
    return (flac[:4] + bytes([flac[4] & 0x7F]) + flac[5:head_end]
            + hdr + block + flac[head_end:])


def encode_flac_picture_block(
    mime: str = "image/png", width: int = 8, height: int = 6,
    payload: bytes = b"\x89PNGfake",
) -> bytes:
    """A FLAC PICTURE block body (RFC 9639 §8.8) with declared
    dimensions — splice with :func:`add_flac_picture` or base64 it
    into a ``METADATA_BLOCK_PICTURE`` Vorbis comment."""
    m = mime.encode("latin-1")
    return (
        (3).to_bytes(4, "big")  # picture type: front cover
        + len(m).to_bytes(4, "big") + m
        + (0).to_bytes(4, "big")  # empty description
        + width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + (24).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + len(payload).to_bytes(4, "big") + payload
    )


def add_flac_picture(flac: bytes, block: bytes) -> bytes:
    """Splice a PICTURE metadata block into a native FLAC stream right
    after STREAMINFO (last-block flag handled like
    :func:`add_flac_vorbis_comments`)."""
    if flac[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    size = int.from_bytes(flac[5:8], "big")
    head_end = 8 + size
    last = flac[4] & 0x80
    hdr = bytes([(0x80 if last else 0) | 6]) + len(block).to_bytes(3, "big")
    return (flac[:4] + bytes([flac[4] & 0x7F]) + flac[5:head_end]
            + hdr + block + flac[head_end:])


def encode_mp4_tags_fixture(
    tags: list[tuple[bytes, str]],
    artwork: bytes | None = None,
    artwork_type: int = 13,
) -> bytes:
    """A minimal tag-bearing MP4: ftyp + moov(mvhd + udta(meta(hdlr +
    ilst))) with one UTF-8 ``data`` atom per ``(item_4cc, text)``;
    ``artwork`` adds a ``covr`` data atom of the given type indicator
    (13 = JPEG, 14 = PNG)."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    items = b""
    for item, text in tags:
        raw = text.encode("utf-8")
        items += box(item, box(
            b"data", (1).to_bytes(4, "big") + b"\x00" * 4 + raw))
    if artwork is not None:
        items += box(b"covr", box(
            b"data",
            artwork_type.to_bytes(4, "big") + b"\x00" * 4 + artwork,
        ))
    meta = box(b"meta", b"\x00" * 4 + box(
        b"hdlr", b"\x00" * 8 + b"mdir" + b"\x00" * 10,
    ) + box(b"ilst", items))
    mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8
               + (1000).to_bytes(4, "big") + b"\x00" * 84)
    return (box(b"ftyp", b"isom\x00\x00\x02\x00isom")
            + box(b"moov", mvhd + box(b"udta", meta)))


def add_riff_info(wav: bytes, tags: list[tuple[bytes, str]]) -> bytes:
    """Append a LIST-INFO chunk to a WAV file (RIFF size fixed up)."""
    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    body = b"INFO"
    for sid, text in tags:
        raw = text.encode("utf-8") + b"\x00"
        raw += b"\x00" * (len(raw) & 1)  # word-aligned
        body += sid + struct.pack("<I", len(raw)) + raw
    out = wav + b"LIST" + struct.pack("<I", len(body)) + body
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def encode_tiff_exif(
    main: list[tuple[int, object]],
    exif: list[tuple[int, object]] | None = None,
    little: bool = True,
    gps: list[tuple[int, object]] | None = None,
) -> bytes:
    """Spec-built TIFF/Exif blob: IFD0 from ``(tag_id, value)`` pairs
    (str → ASCII with NUL, int → SHORT, bytes → UNDEFINED, list of
    ``(num, den)`` tuples → RATIONAL), plus an Exif sub-IFD behind an
    0x8769 pointer when ``exif`` is given and a GPS sub-IFD behind
    0x8825 when ``gps`` is given. Out-of-line values land after the
    IFDs, offsets absolute from the TIFF header as the spec
    requires."""
    en = "<" if little else ">"

    def _entry_raw(val: object) -> tuple[int, int, bytes]:
        if isinstance(val, str):
            raw = val.encode("latin-1") + b"\x00"
            return 2, len(raw), raw
        if isinstance(val, bytes):
            return 7, len(val), val
        if isinstance(val, list):  # RATIONALs as (num, den) tuples
            raw = b"".join(
                struct.pack(en + "II", num, den) for num, den in val
            )
            return 5, len(val), raw
        return 3, 1, struct.pack(en + "H", val)

    pointers = [(0x8769, exif), (0x8825, gps)]
    n0 = len(main) + sum(1 for _t, sub in pointers if sub)
    ifd0_len = 2 + 12 * n0 + 4
    sub_offs = {}
    at = 8 + ifd0_len
    for ptag, sub in pointers:
        if sub:
            sub_offs[ptag] = at
            at += 2 + 12 * len(sub) + 4
    extra_at = [at]
    extra = bytearray()

    def _build(entries: list[tuple[int, object]],
               with_pointers: bool = False) -> bytes:
        items = list(entries)
        if with_pointers:
            items += [(pt, None) for pt, sub in pointers if sub]
        out = struct.pack(en + "H", len(items))
        for tag, val in sorted(items):
            if val is None and tag in sub_offs:
                out += struct.pack(en + "HHII", tag, 4, 1,
                                   sub_offs[tag])
                continue
            typ, cnt, raw = _entry_raw(val)
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))
            else:
                field = struct.pack(en + "I", extra_at[0] + len(extra))
                extra.extend(raw)
            out += struct.pack(en + "HHI", tag, typ, cnt) + field
        return out + struct.pack(en + "I", 0)

    head = _build(main, with_pointers=True)
    for _ptag, sub in pointers:
        if sub:
            head += _build(sub)
    magic = b"II*\x00" if little else b"MM\x00*"
    return magic + struct.pack(en + "I", 8) + head + bytes(extra)


def user_comment(text: str, unicode: bool = False) -> bytes:
    """An Exif UserComment (0x9286) UNDEFINED value with its 8-byte
    charset prefix — pass as the ``bytes`` value to
    :func:`encode_tiff_exif`."""
    if unicode:
        return b"UNICODE\x00" + text.encode("utf-16-le")
    return b"ASCII\x00\x00\x00" + text.encode("ascii")


def add_jpeg_metadata(
    jpeg: bytes, exif: bytes | None = None, comment: str | None = None,
) -> bytes:
    """Splice an APP1-Exif segment and/or a COM comment right after a
    JPEG's SOI marker."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    inject = b""
    if exif is not None:
        body = b"Exif\x00\x00" + exif
        inject += b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    if comment is not None:
        raw = comment.encode("utf-8")
        inject += b"\xff\xfe" + struct.pack(">H", len(raw) + 2) + raw
    return jpeg[:2] + inject + jpeg[2:]


def add_png_text(
    png: bytes, items: list[tuple[str, str, str]],
) -> bytes:
    """Insert textual chunks before a PNG's IEND: ``items`` are
    ``(keyword, text, kind)`` with kind ∈ {"tEXt", "zTXt", "iTXt",
    "iTXt-z"} (the -z form deflates the UTF-8 text)."""
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    iend = png.rfind(b"IEND")
    if iend < 12:
        raise ValueError("PNG has no IEND chunk")
    at = iend - 4  # chunk start (length field)
    chunks = b""
    for keyword, text, kind in items:
        key = keyword.encode("latin-1")
        if kind == "tEXt":
            ctype, body = b"tEXt", key + b"\x00" + text.encode("latin-1")
        elif kind == "zTXt":
            ctype = b"zTXt"
            body = key + b"\x00\x00" + zlib.compress(
                text.encode("latin-1"))
        elif kind in ("iTXt", "iTXt-z"):
            ctype = b"iTXt"
            raw = text.encode("utf-8")
            flag = b"\x01\x00" if kind == "iTXt-z" else b"\x00\x00"
            if kind == "iTXt-z":
                raw = zlib.compress(raw)
            body = key + b"\x00" + flag + b"\x00" + b"\x00" + raw
        else:
            raise ValueError(f"unknown PNG text chunk kind {kind!r}")
        chunks += (struct.pack(">I", len(body)) + ctype + body
                   + struct.pack(">I", zlib.crc32(ctype + body)))
    return png[:at] + chunks + png[at:]


def add_gif_comment(gif: bytes, text: str) -> bytes:
    """Insert a comment extension before a GIF's trailer byte."""
    if gif[:6] not in (b"GIF87a", b"GIF89a") or gif[-1:] != b"\x3b":
        raise ValueError("not a terminated GIF stream")
    raw = text.encode("latin-1")
    body = b""
    for i in range(0, len(raw), 255):
        part = raw[i : i + 255]
        body += bytes([len(part)]) + part
    return gif[:-1] + b"\x21\xfe" + body + b"\x00" + gif[-1:]


def add_matroska_tags(
    mkv: bytes,
    tags: list[tuple[str, str]],
    title: str | None = None,
) -> bytes:
    """Splice a ``Tags`` element (one Tag of SimpleTags) into a
    WebM/Matroska stream, and optionally a Segment ``Title`` into its
    Info element — the Segment is rebuilt with canonical sizes.
    SimpleTag names are written uppercase per registry convention."""
    from sed_binning_spark.pipeline.webm import (
        _SEGMENT, _elem, _read_vint,
    )

    if mkv[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML (WebM/Matroska) stream")

    def _children(data: bytes, pos: int, end: int):
        out = []
        while pos < end:
            eid, pos = _read_vint(data, pos, keep_marker=True)
            size, pos = _read_vint(data, pos, keep_marker=False)
            if size is None:
                raise ValueError("fixture splice wants explicit sizes")
            out.append((eid, data[pos : pos + size]))
            pos += size
        return out

    simple = b"".join(
        _elem(_MKV_SIMPLE_TAG,
              _elem(_MKV_TAG_NAME, k.upper().encode("utf-8"))
              + _elem(_MKV_TAG_STRING, v.encode("utf-8")))
        for k, v in tags
    )
    tags_elem = _elem(_MKV_TAGS, _elem(_MKV_TAG, simple))
    out = b""
    for eid, body in _children(mkv, 0, len(mkv)):
        if eid == _SEGMENT:
            parts = []
            for cid, cbody in _children(body, 0, len(body)):
                if cid == _MKV_INFO and title is not None:
                    cbody += _elem(
                        _MKV_TITLE, title.encode("utf-8"))
                parts.append(_elem(cid, cbody))
            body = b"".join(parts) + tags_elem
        out += _elem(eid, body)
    return out


def add_webp_exif(webp: bytes, exif: bytes) -> bytes:
    """Append an EXIF chunk to a VP8X WebP container (EXIF flag set,
    RIFF size fixed up)."""
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    if webp[12:16] != b"VP8X":
        raise ValueError("EXIF chunks require the VP8X extended shape")
    chunk = b"EXIF" + struct.pack("<I", len(exif)) + exif
    if len(exif) & 1:
        chunk += b"\x00"
    out = bytearray(webp + chunk)
    out[20] |= 0x08  # VP8X flags: EXIF present
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def extract_media_tags(
    df,
    payload_column: str = "payload",
    id_column: str = "media_id",
):
    """One row per embedded tag of each media payload — ``(media_id,
    container, key, value)`` with the normalized lowercase key
    vocabulary of :func:`parse_media_tags`. The metadata-mining
    operator for A/V corpora: titles, artists, comments, and lyrics
    are caption-grade text paired with the media.

    Distribution shape: one ``mapInPandas`` stage, Arrow-batched,
    partition-local, no shuffle, no driver collect — tag blocks are
    header bytes, so per-payload work is independent of media size
    except the Ogg page walk (CRC-verified, numpy-vectorized). A
    payload that fails to parse degrades to ZERO rows (keeping the
    batch alive); a recognized container without tags also yields no
    rows — both are 'nothing mined here', and a pipeline that needs
    the distinction should join back on the id column."""
    import pandas as pd

    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    schema = (f"{id_column} long, container string, "
              f"key string, value string")

    def _batches(batches):
        for pdf in batches:
            rows = []
            # walk each DISTINCT payload once per batch: the tag list is a
            # pure function of the bytes (dedup-before-decode; the memo
            # dies with the batch, so memory stays bounded)
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    continue
                b = bytes(payload)
                tail = memo.get(b)
                if tail is None:
                    try:
                        got = parse_media_tags(b)
                        tail = [
                            (got["container"], k, v) for k, v in got["tags"]
                        ]
                    except _DECODE_ERRORS:
                        tail = []
                    memo[b] = tail
                rows.extend((mid, *t) for t in tail)
            yield pd.DataFrame(
                rows, columns=[id_column, "container", "key", "value"],
            )

    return df.mapInPandas(_batches, schema=schema)
