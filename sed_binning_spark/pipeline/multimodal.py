"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture — schema contract, Arrow batch shape,
mapInPandas partition-parallel decode, metadata projection — is shared by
two decode modes:

- ``decode_stub=False`` (real): pure-stdlib/NumPy codecs for baseline
  AND progressive JPEG (Huffman + IDCT + chroma upsampling,
  ``pipeline.jpeg``), PNG
  (zlib inflate + filter reconstruction), and GIF87a/89a (LZW + interlace
  + transparency) — the three formats that dominate
  real crawl corpora — plus PPM (P6), uncompressed 8/24/32-bit BMP, and
  WAV audio (the PCM/float/extensible matrix, one int16 contract), dispatched by payload magic bytes; any other payload
  gets honest byte-statistics features. No image/audio libraries exist
  in this environment, so every codec is written from the public
  specification with zlib/struct/NumPy alone; a Pillow/soundfile codec
  drops into :func:`decode_payload` without touching the distributed
  plan.
- ``decode_stub=True`` (fixture): a deterministic md5-seeded fake
  featurizer, kept for plumbing tests and the SQL-oracle query (the fake
  is reproducible in any engine with md5; real pixel stats are not).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract schema for a media table: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feat", ArrayType(FloatType()), True),
])


# ------------------------------------------------------------- real codecs

def decode_image_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255) into an (h, w, 3) uint8 RGB
    array. Pure header-token parse + one frombuffer — no image library."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments allowed between tokens
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    if pix.size != n:
        raise ValueError("truncated PPM pixel data")
    return pix.reshape(h, w, 3)


def decode_image_bmp(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode an uncompressed BMP — 8-bit palette, 24-bit BGR, or 32-bit
    BGRX — into an (h, w, 3) uint8 RGB array (4-byte row padding,
    bottom-up row order, palette resolved through the BGRA color table;
    the 32-bit fourth byte is padding/ignored per the classic DIB
    contract). RLE/bitfields compression and other depths raise.
    ``max_pixels`` (default :data:`MAX_PIXELS`) bounds w*h before any
    allocation, matching the other decoders."""
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    if len(data) < 54:  # file header (14) + BITMAPINFOHEADER (40)
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("BMP declares a zero-size raster")
    if w * h > budget:
        raise ValueError(
            f"BMP raster {w}x{h} exceeds the {budget}-pixel decode budget",
        )
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(
            f"only uncompressed 8/24/32-bit BMP supported "
            f"(bpp={bpp}, compression={compression})",
        )
    stride = (w * bpp // 8 + 3) // 4 * 4
    if pixel_offset + stride * h > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pixel_offset).reshape(h, stride)
    if bpp == 8:
        (nclr,) = struct.unpack_from("<I", data, 46)
        nclr = nclr or 256
        if 14 + header_size + 4 * nclr > len(data):
            # checked BEFORE frombuffer, whose own error names buffers,
            # not the container structure
            raise ValueError("truncated BMP color table")
        pal = np.frombuffer(data, np.uint8, count=4 * nclr,
                            offset=14 + header_size)
        pal = pal.reshape(nclr, 4)[:, 2::-1]  # BGRX quads -> RGB
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= nclr:
            raise ValueError("BMP pixel index beyond its color table")
        img = pal[idx]
    elif bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    else:  # 32-bit BGRX
        img = rows[:, : w * 4].reshape(h, w, 4)[..., 2::-1]
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail (the leading 2 bytes carry
# the actual format code)
_WAV_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")

# ITU-T G.711 companded telephony audio (WAV format tags 6 = A-law,
# 7 = μ-law). The 256-entry expansion tables below implement the
# canonical public-domain reference arithmetic (Sun g711.c, the same
# tables the ITU spec normalizes): exact integers, so windowed
# statistics over G.711 fixtures stay closed-form and oracle-able.
_G711_TABLES: dict[int, np.ndarray] = {}


def _g711_table(law: int) -> np.ndarray:
    """256-entry code → linear int16 expansion table for ``law`` (the
    WAV format tag: 6 = A-law, 7 = μ-law). μ-law: invert the code, then
    ((quant << 3) + 0x84) << segment, bias-corrected, sign from bit 7
    (range ±32124). A-law: XOR 0x55, quant << 4 plus the per-segment
    step offset, doubled per segment above 1, sign from bit 7 (range
    ±32256)."""
    tab = _G711_TABLES.get(law)
    if tab is None:
        codes = np.arange(256, dtype=np.int32)
        if law == 7:  # μ-law
            u = ~codes & 0xFF
            t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
            tab = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
        else:  # A-law
            a = codes ^ 0x55
            t = (a & 0x0F) << 4
            seg = (a & 0x70) >> 4
            t = np.where(
                seg == 0, t + 8,
                np.where(seg == 1, t + 0x108,
                         (t + 0x108) << np.maximum(seg - 1, 0)),
            )
            tab = np.where(a & 0x80, t, -t).astype(np.int16)
        _G711_TABLES[law] = tab
    return tab


# IMA/DVI ADPCM (WAV format tag 0x11): 4-bit codes against the public
# IMA spec's 89-entry step table and 8-entry index-adaptation table.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_adpcm_decode(
    raw: bytes, n_channels: int, block_align: int, spb: int,
) -> np.ndarray:
    """IMA-ADPCM WAV data chunk → (n_samples, n_channels) int16. Block
    layout per the public IMA/Microsoft spec: a 4-byte header per
    channel (predictor int16 LE = the block's exact first sample, step
    index, reserved), then the 4-bit codes in 4-byte per-channel groups,
    low nibble first. The predictor recursion is serial only WITHIN a
    block — blocks are independent, so the loop below runs spb-1 steps
    over vectors spanning ALL blocks at once (an hour of 8 kHz mono is
    ~57k blocks wide per step, not 28M scalar iterations). A trailing
    partial block decodes to however many samples its bytes carry."""
    ch, ba = n_channels, block_align
    if ba < 4 * ch + 4 * ch or (ba - 4 * ch) % (4 * ch):
        raise ValueError(
            f"IMA-ADPCM block align {ba} is not 4·ch header + 4-byte "
            f"per-channel groups for {ch} channel(s)",
        )
    max_spb = (ba - 4 * ch) * 2 // ch + 1
    if not 1 <= spb <= max_spb:
        raise ValueError(
            f"IMA-ADPCM declares {spb} samples/block but the {ba}-byte "
            f"block holds at most {max_spb}",
        )
    if len(raw) < 4 * ch:
        raise ValueError("IMA-ADPCM data shorter than one block header")
    nb = (len(raw) + ba - 1) // ba
    buf = np.zeros(nb * ba, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    blocks = buf.reshape(nb, ba)
    hdr = blocks[:, : 4 * ch].reshape(nb, ch, 4).astype(np.int32)
    pred = ((hdr[:, :, 0] | (hdr[:, :, 1] << 8)) ^ 0x8000) - 0x8000
    index = np.clip(hdr[:, :, 2], 0, 88)
    g = blocks[:, 4 * ch :].reshape(nb, -1, ch, 4)
    nibs = np.stack([g & 0x0F, g >> 4], axis=-1)  # low nibble first
    nibs = nibs.reshape(nb, -1, ch, 8).transpose(0, 2, 1, 3).reshape(nb, ch, -1)
    out = np.empty((nb, ch, spb), np.int16)
    out[:, :, 0] = pred
    for s in range(spb - 1):
        code = nibs[:, :, s].astype(np.int32)
        step = _IMA_STEPS[index]
        diff = ((step >> 3)
                + np.where(code & 1, step >> 2, 0)
                + np.where(code & 2, step >> 1, 0)
                + np.where(code & 4, step, 0))
        pred = np.clip(pred + np.where(code & 8, -diff, diff),
                       -32768, 32767)
        index = np.clip(index + _IMA_INDEX[code & 7], 0, 88)
        out[:, :, s + 1] = pred
    out = out.transpose(0, 2, 1).reshape(-1, ch)
    tail = len(raw) - (nb - 1) * ba  # bytes in the final block
    if tail < 4 * ch:
        raise ValueError("IMA-ADPCM final block truncates its header")
    last_n = min(spb, (tail - 4 * ch) * 2 // ch + 1)
    return out[: (nb - 1) * spb + last_n]


def _ima_adpcm_encode(
    samples: np.ndarray, block_align: int,
) -> tuple[bytes, int]:
    """Linear int16 (n, ch) → IMA-ADPCM data chunk (fixtures/sinks).
    Block-parallel like the decoder: each block's first sample goes in
    its header verbatim, the step index carries across blocks (the
    conventional encoder behavior), codes picked by the spec's
    successive-subtraction rule. The final block zero-pads; callers trim
    on decode via the fact chunk. Returns (data, samples_per_block)."""
    s = np.ascontiguousarray(np.atleast_2d(samples.T).T, dtype=np.int16)
    n, ch = s.shape
    ba = block_align
    spb = (ba - 4 * ch) * 2 // ch + 1
    nb = (n + spb - 1) // spb
    padded = np.zeros((nb * spb, ch), np.int16)
    padded[:n] = s
    blk = padded.reshape(nb, spb, ch).transpose(0, 2, 1).astype(np.int32)
    pred = blk[:, :, 0].copy()
    # carry the index across blocks serially (cheap: nb iterations), so
    # header indexes match what a running conventional encoder stores
    start_index = np.zeros((nb, ch), np.int32)
    codes = np.empty((nb, ch, spb - 1), np.uint8)
    index = np.zeros(ch, np.int32)
    for b in range(nb):
        start_index[b] = index
        p = pred[b].copy()
        ix = index
        for t in range(spb - 1):
            step = _IMA_STEPS[ix]
            diff = blk[b, :, t + 1] - p
            code = np.where(diff < 0, 8, 0)
            mag = np.abs(diff)
            c4 = mag >= step
            mag = mag - c4 * step
            c2 = mag >= (step >> 1)
            mag = mag - c2 * (step >> 1)
            c1 = mag >= (step >> 2)
            code = code | c4 * 4 | c2 * 2 | c1 * 1
            codes[b, :, t] = code
            rec = ((step >> 3)
                   + np.where(code & 1, step >> 2, 0)
                   + np.where(code & 2, step >> 1, 0)
                   + np.where(code & 4, step, 0))
            p = np.clip(p + np.where(code & 8, -rec, rec), -32768, 32767)
            ix = np.clip(ix + _IMA_INDEX[code & 7], 0, 88)
        index = ix
    hdr = np.zeros((nb, ch, 4), np.uint8)
    hdr[:, :, 0] = pred & 0xFF
    hdr[:, :, 1] = (pred >> 8) & 0xFF
    hdr[:, :, 2] = start_index
    # nibbles back into 4-byte per-channel groups, low nibble first
    c = np.concatenate(
        [codes, np.zeros((nb, ch, -(spb - 1) % 8), np.uint8)], axis=2,
    ).reshape(nb, ch, -1, 8)
    byts = (c[..., 0::2] | (c[..., 1::2] << 4)).transpose(0, 2, 1, 3)
    data = np.concatenate(
        [hdr.reshape(nb, -1), byts.reshape(nb, -1)], axis=1,
    )
    return data.tobytes(), spb


# Microsoft ADPCM (WAV format tag 2): 4-bit codes against a two-tap
# linear predictor; tables from the public Microsoft multimedia spec.
_MS_COEFS = np.array([
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232),
], np.int64)
_MS_ADAPT = np.array([
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
], np.int64)


def _trunc_div_256(x: np.ndarray) -> np.ndarray:
    """C-style division by 256 (truncation toward zero, the reference
    msadpcm.c arithmetic) — floor division differs on negatives."""
    return np.sign(x) * (np.abs(x) >> 8)


def _ms_adpcm_decode(
    raw: bytes, n_channels: int, block_align: int, spb: int,
) -> np.ndarray:
    """MS-ADPCM WAV data chunk → (n_samples, n_channels) int16. Block
    layout per the public spec, field-major across channels: predictor
    indexes (1 byte/ch), initial deltas (int16/ch), sample1s, sample2s —
    sample2 then sample1 ARE the block's first two output samples — then
    4-bit signed codes, HIGH nibble first, channels alternating per
    nibble. Block-parallel like the IMA decoder: the recursion loops
    spb-2 vector steps across all blocks."""
    ch, ba = n_channels, block_align
    if ba < 7 * ch + 1:
        raise ValueError(
            f"MS-ADPCM block align {ba} cannot hold the 7-byte-per-"
            f"channel header for {ch} channel(s)",
        )
    max_spb = (ba - 7 * ch) * 2 // ch + 2
    if not 2 <= spb <= max_spb:
        raise ValueError(
            f"MS-ADPCM declares {spb} samples/block but the {ba}-byte "
            f"block holds at most {max_spb}",
        )
    if len(raw) < 7 * ch:
        raise ValueError("MS-ADPCM data shorter than one block header")
    nb = (len(raw) + ba - 1) // ba
    buf = np.zeros(nb * ba, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    blocks = buf.reshape(nb, ba)
    pidx = blocks[:, :ch].astype(np.int64)
    if int(pidx.max(initial=0)) >= len(_MS_COEFS):
        raise ValueError(
            f"MS-ADPCM predictor index {int(pidx.max())} beyond the "
            f"7-entry coefficient table",
        )
    c1 = _MS_COEFS[pidx, 0]
    c2 = _MS_COEFS[pidx, 1]

    def _i16(col0: int) -> np.ndarray:
        b = blocks[:, col0 : col0 + 2 * ch].reshape(nb, ch, 2).astype(np.int64)
        return ((b[:, :, 0] | (b[:, :, 1] << 8)) ^ 0x8000) - 0x8000

    delta = _i16(ch)
    s1 = _i16(3 * ch)
    s2 = _i16(5 * ch)
    data = blocks[:, 7 * ch :]
    nib = np.stack([data >> 4, data & 0x0F], axis=-1).reshape(nb, -1)
    nib = nib[:, : (spb - 2) * ch].reshape(nb, spb - 2, ch)
    signed = (nib.astype(np.int64) ^ 8) - 8  # sign-extend 4 bits
    out = np.empty((nb, spb, ch), np.int16)
    out[:, 0] = s2
    out[:, 1] = s1
    for t in range(spb - 2):
        code = signed[:, t]
        pred = np.clip(
            _trunc_div_256(s1 * c1 + s2 * c2) + code * delta,
            -32768, 32767,
        )
        out[:, t + 2] = pred
        s2, s1 = s1, pred
        delta = np.maximum(16, (_MS_ADAPT[nib[:, t]] * delta) >> 8)
    out = out.reshape(-1, ch)
    tail = len(raw) - (nb - 1) * ba
    if tail < 7 * ch:
        raise ValueError("MS-ADPCM final block truncates its header")
    last_n = min(spb, (tail - 7 * ch) * 2 // ch + 2)
    return out[: (nb - 1) * spb + last_n]


def _ms_adpcm_encode(
    samples: np.ndarray, block_align: int,
) -> tuple[bytes, int]:
    """Linear int16 (n, ch) → MS-ADPCM data chunk (fixtures/sinks).
    Fixed predictor 0 (coeffs 256, 0 — spec-legal for any block) with
    the standard delta adaptation; the final block zero-pads, callers
    trim via the fact chunk. Returns (data, samples_per_block)."""
    s = np.ascontiguousarray(np.atleast_2d(samples.T).T, dtype=np.int16)
    n, ch = s.shape
    ba = block_align
    spb = (ba - 7 * ch) * 2 // ch + 2
    nb = (n + spb - 1) // spb
    padded = np.zeros((nb * spb, ch), np.int16)
    padded[:n] = s
    blk = padded.reshape(nb, spb, ch).astype(np.int64)
    s2, s1 = blk[:, 0].copy(), blk[:, 1].copy()
    delta = np.maximum(
        16, np.abs(blk[:, 2] - blk[:, 1]) // 4 + 16,
    ).astype(np.int64)
    delta0 = delta.copy()
    codes = np.empty((nb, spb - 2, ch), np.uint8)
    for t in range(spb - 2):
        pred = _trunc_div_256(s1 * 256 + s2 * 0)
        code = np.clip(
            np.round((blk[:, t + 2] - pred) / delta).astype(np.int64),
            -8, 7,
        )
        codes[:, t] = (code & 0x0F).astype(np.uint8)
        rec = np.clip(pred + code * delta, -32768, 32767)
        s2, s1 = s1, rec
        delta = np.maximum(16, (_MS_ADAPT[code & 0x0F] * delta) >> 8)
    hdr = np.zeros((nb, 7 * ch), np.uint8)
    hdr[:, :ch] = 0  # predictor 0 for every channel
    for k, vals in ((1, delta0), (3, blk[:, 1]), (5, blk[:, 0])):
        u = (vals & 0xFFFF).astype(np.int64)
        hdr[:, k * ch : k * ch + 2 * ch : 2] = (u & 0xFF).astype(np.uint8)
        hdr[:, k * ch + 1 : k * ch + 2 * ch : 2] = (u >> 8).astype(np.uint8)
    flat = codes.reshape(nb, -1)
    pad = -(flat.shape[1]) % 2
    if pad:
        flat = np.concatenate(
            [flat, np.zeros((nb, pad), np.uint8)], axis=1,
        )
    byts = ((flat[:, 0::2] << 4) | flat[:, 1::2]).astype(np.uint8)
    data = np.concatenate([hdr, byts], axis=1)
    return data.tobytes(), spb


def _g711_compress(samples: np.ndarray, law: int) -> np.ndarray:
    """Linear int16 → nearest G.711 code (the encode half, fixtures and
    sinks): searchsorted over the sorted expansion table picks the code
    whose decoded value is closest (exact round-trip for values in the
    decode image), sidestepping the 13/14/16-bit input-scaling ambiguity
    between published compressors."""
    tab = _g711_table(law)
    order = np.argsort(tab, kind="stable")
    sorted_vals = tab[order].astype(np.int32)
    idx = np.searchsorted(sorted_vals, samples.astype(np.int32))
    idx = np.clip(idx, 1, sorted_vals.size - 1)
    left, right = sorted_vals[idx - 1], sorted_vals[idx]
    pick = np.where(
        np.abs(samples.astype(np.int32) - left)
        <= np.abs(right - samples.astype(np.int32)),
        idx - 1, idx,
    )
    return order[pick].astype(np.uint8)


def decode_audio_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload into ((n_samples, n_channels) int16
    array, sample_rate) — every value rescaled to the int16 range so the
    featurizer's normalization contract holds for all source formats:

    - PCM (format 1): 8-bit unsigned (offset-binary), 16-bit, 24-bit,
      and 32-bit signed integers (wider widths keep their high 16 bits);
    - IEEE float (format 3): 32- and 64-bit, clipped to [-1, 1] then
      scaled by 32767;
    - ITU-T G.711 (formats 6 = A-law, 7 = μ-law): 8-bit companded
      telephony codes expanded through the canonical 256-entry tables
      (±32256 / ±32124 — already int16-scale);
    - IMA/DVI ADPCM (format 0x11) and Microsoft ADPCM (format 2):
      4-bit block-coded speech, decoded block-parallel; the fmt
      extension's wSamplesPerBlock and the fact chunk's dwSampleLength
      are honored;
    - WAVE_FORMAT_EXTENSIBLE (format 0xFFFE): the real format comes from
      the SubFormat GUID's leading code, dispatched to the above.

    Walks the chunk list properly (fmt/data can be preceded by LIST
    etc.; chunk sizes pad to even); anything else refuses loudly and
    degrades to byte stats through decode_payload."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, ext, raw, fact = 12, None, b"", None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            ext = bytes(body[16:])
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and size >= 4:
            fact = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if n_channels < 1:
        raise ValueError("WAV fmt chunk declares zero channels")
    if audio_format == 0xFFFE:  # extensible: real format in the GUID
        if len(ext) < 24 or ext[10:24] != _WAV_GUID_TAIL:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE with unknown SubFormat")
        audio_format = struct.unpack_from("<H", ext, 8)[0]
    if audio_format == 1:  # integer PCM
        if bits == 16:
            samples = np.frombuffer(raw, dtype="<i2")
        elif bits == 8:
            samples = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128)
                       << 8)
        elif bits == 24:
            b3 = np.frombuffer(raw, np.uint8)
            b3 = b3[: b3.size // 3 * 3].reshape(-1, 3).astype(np.int32)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
            samples = (v >> 8).astype(np.int16)
        elif bits == 32:
            samples = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            f = np.frombuffer(raw, dtype="<f4")
        elif bits == 64:
            f = np.frombuffer(raw, dtype="<f8")
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
        f = np.nan_to_num(f.astype(np.float64), nan=0.0,
                          posinf=1.0, neginf=-1.0)
        samples = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif audio_format in (6, 7):  # ITU-T G.711 A-law / μ-law
        if bits != 8:
            raise ValueError(
                f"G.711 WAV with {bits}-bit samples (codes are 8-bit)",
            )
        samples = _g711_table(audio_format)[np.frombuffer(raw, np.uint8)]
    elif audio_format in (0x02, 0x11):  # Microsoft / IMA-DVI ADPCM
        if bits != 4:
            raise ValueError(
                f"ADPCM WAV with {bits}-bit samples (codes are 4-bit)",
            )
        # the fmt extension's wSamplesPerBlock (ext = cbSize + fields;
        # the WORD at ext[2:4] is wSamplesPerBlock in both the plain
        # and the EXTENSIBLE layout); absent → the block's capacity
        spb = struct.unpack_from("<H", ext, 2)[0] if len(ext) >= 4 else None
        if audio_format == 0x11:
            if spb is None:
                spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
            out = _ima_adpcm_decode(raw, n_channels, block_align, spb)
        else:
            if spb is None:
                spb = (block_align - 7 * n_channels) * 2 // n_channels + 2
            out = _ms_adpcm_decode(raw, n_channels, block_align, spb)
        if fact is not None:  # dwSampleLength trims the final-block pad
            out = out[:fact]
        return out, sample_rate
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    n = samples.size // n_channels * n_channels
    return samples[:n].reshape(-1, n_channels), sample_rate


def _decode_audio_payload(b: bytes) -> tuple[np.ndarray, int] | None:
    """Dispatch an audio payload by magic: RIFF/WAVE through
    :func:`decode_audio_wav`, FLAC (``fLaC`` — the dominant public
    speech-corpus format) through
    :func:`~sed_binning_spark.pipeline.flac.decode_audio_flac`. Both
    land on the same ((n, ch) int16, rate) contract; None means 'not
    audio' (the caller's no-rows/NULL-degrade path)."""
    if b[:4] == b"RIFF":
        return decode_audio_wav(b)
    if b[:4] == b"fLaC":
        from sed_binning_spark.pipeline.flac import decode_audio_flac

        return decode_audio_flac(b)
    return None


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Decode budgets, checked against the header-declared raster BEFORE any
# allocation or inflate. MAX_PIXELS (64 MP, imported so the PNG and JPEG
# ceilings cannot drift apart) is the direct-caller ceiling;
# FEATURIZER_MAX_PIXELS is the much tighter budget decode_payload passes
# inside the mapInPandas featurizer — the pure-Python entropy/filter
# loops are serial, so an adversarial valid-looking 64 MP image would
# stall a task for minutes while feature extraction never needs
# full-resolution rasters. Oversized-but-valid payloads degrade to byte
# statistics, same as malformed ones.
from sed_binning_spark.pipeline.jpeg import MAX_PIXELS  # noqa: E402

FEATURIZER_MAX_PIXELS = 4 * 1024 * 1024
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unpack_bits(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(nrows, stride_bytes) packed scanlines -> (nrows, w) sample values,
    MSB-first within each byte (PNG packing for bit depths 1/2/4)."""
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    groups = bits.reshape(bits.shape[0], w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (groups * weights).sum(axis=2).astype(np.uint8)


def _png_pack_bits(vals: np.ndarray, depth: int) -> np.ndarray:
    """(nrows, w) sample values -> (nrows, ceil(w*depth/8)) packed bytes
    (the encoder dual of :func:`_png_unpack_bits`)."""
    nrows, w = vals.shape
    weights = np.arange(depth - 1, -1, -1)
    bits = ((vals[..., None] >> weights) & 1).astype(np.uint8)
    bits = bits.reshape(nrows, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def decode_image_png(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode a PNG (every legal bit depth 1/2/4/8/16 of color types
    0/2/3/4/6, sequential
    or Adam7-interlaced, all five scanline filters) into an
    (h, w, channels) uint8 array — critical chunks only
    (IHDR/PLTE/IDAT/IEND), stdlib zlib for the IDAT inflate, NumPy for the
    per-row unfiltering. Palette images (type 3) resolve through PLTE to
    RGB. 16-bit samples reduce to their high byte (the featurizer
    contract is uint8 rasters; RFC 2083's sample depth scaling); 1/2/4-bit
    grayscale rescales exactly (255/(2^d - 1) is integral). Adam7 decodes
    each of the seven passes as an independent filtered image (PNG
    filters never cross pass boundaries) scattered into the output grid
    by strided assignment; passes emptied by small rasters carry no
    scanlines. Sub-byte scanlines pack samples MSB-first with the filter
    unit pinned at one byte, per the spec.

    ``max_pixels`` (default :data:`MAX_PIXELS`) bounds w*h BEFORE any
    allocation or inflate: IHDR precedes IDAT, so a crafted 65535x65535
    header (or a deflate bomb whose stream inflates past the geometry the
    header promised) is refused without ever materializing the payload —
    the decompress runs incrementally via ``zlib.decompressobj`` capped at
    the expected scanline total, never trusting the compressed stream."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = len(PNG_SIG), None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR must be 13 bytes, got {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16) or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if depth < 8 and color not in (0, 3):
        raise ValueError(
            f"PNG bit depth {depth} is only legal for grayscale/palette, "
            f"not color type {color}",
        )
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    if w * h > budget:
        raise ValueError(
            f"declared raster {w}x{h} exceeds the {budget}-pixel "
            "decode budget",
        )
    nch = _PNG_CHANNELS[color]
    # filter unit (bytes per pixel, min 1) and per-row byte stride: the
    # PNG filters operate on BYTES, so sub-byte depths filter at bpp=1
    bpp = max(nch * depth // 8, 1)

    def _stride(pw: int) -> int:
        return -(-pw * nch * depth // 8)

    if interlace:
        passes = [
            (x0, y0, xs, ys, -(-(w - x0) // xs), -(-(h - y0) // ys))
            for x0, y0, xs, ys in _ADAM7
            if x0 < w and y0 < h
        ]
        expected = sum(ph * (1 + _stride(pw)) for _, _, _, _, pw, ph in passes)
    else:
        expected = h * (1 + _stride(w))
    # Incremental bounded inflate: decompressobj(max_length=...) caps the
    # output at the geometry IHDR promised, so a deflate bomb stops at
    # `expected` bytes instead of allocating its full expansion.
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected)
    if dec.unconsumed_tail or (not dec.eof and dec.decompress(b"", 1)):
        raise ValueError("IDAT stream inflates past the declared raster")
    if len(raw) != expected:
        raise ValueError("PNG scanline data length mismatch")
    def _subimage(seg: bytes, ph: int, pw: int) -> np.ndarray:
        rows = _png_unfilter(seg, ph, _stride(pw), bpp)
        if depth < 8:
            return _png_unpack_bits(rows, pw, depth)[..., None]
        return rows.reshape(ph, pw, nch * (depth // 8))

    nbytes_px = 1 if depth < 8 else nch * (depth // 8)
    if interlace:
        img = np.zeros((h, w, nbytes_px), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys, pw, ph in passes:
            if pw == 0 or ph == 0:
                continue
            seg = ph * (1 + _stride(pw))
            img[y0::ys, x0::xs] = _subimage(raw[off : off + seg], ph, pw)
            off += seg
    else:
        img = _subimage(raw, h, w)
    if depth == 16:
        # big-endian sample pairs -> high byte (RFC 2083 sample depth
        # rescaling truncation; exact for values of the form v*257)
        img = img.reshape(h, w, nch, 2)[..., 0]
    elif depth < 8 and color == 0:
        # exact sample-depth rescale: 255/(2^d - 1) is an integer
        img = img * np.uint8(255 // ((1 << depth) - 1))
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        img = plte[idx]
    return img


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters. Rows are sequential (each
    needs the prior reconstructed row); within a row, None/Up are whole-
    row vector ops, Sub is a lane-wise modular cumsum, and Average/Paeth
    — genuinely sequential in x — fall back to a per-byte loop (correct
    first; a real-corpus deployment swaps in a C codec behind the same
    decode_payload dispatch)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int64)
        pos += 1 + stride
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub
            rec = row.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(row[lane::bpp]) % 256
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft in (3, 4):  # Average / Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 3:
                    rec[x] = (row[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _png_filter_rows(byts: np.ndarray, bpp: int, filters: list[int]) -> bytes:
    """Forward-filter a (rows, stride) byte matrix into PNG scanlines
    (filter byte + filtered row each) — the per-pass unit: PNG filters
    never cross Adam7 pass boundaries, so each pass filters as an
    independent image."""
    nrows, stride = byts.shape
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(nrows):
        ft = filters[r % len(filters)]
        flat = byts[r].astype(np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), flat[:-bpp]]) \
            if stride > bpp else np.zeros(stride, np.int64)
        pleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]]) \
            if stride > bpp else np.zeros(stride, np.int64)
        if ft == 0:
            filt = flat
        elif ft == 1:
            filt = (flat - left) % 256
        elif ft == 2:
            filt = (flat - prev) % 256
        elif ft == 3:
            filt = (flat - (left + prev) // 2) % 256
        elif ft == 4:
            p = left + prev - pleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - pleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, pleft),
            )
            filt = (flat - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = flat
    return b"".join(lines)


def encode_image_png(
    img: np.ndarray,
    filters: list[int] | None = None,
    level: int = 6,
    interlace: bool = False,
    bit_depth: int | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """Inverse of :func:`decode_image_png` for (h, w, {1,2,3,4}-channel)
    arrays (color type from the channel count; uint8 writes bit depth 8,
    uint16 writes big-endian bit depth 16). ``filters`` picks the per-row
    filter type (cycled; default all-0) — the knob the decode-parity
    tests use to exercise every unfilter path. ``interlace=True`` emits
    Adam7 passes, each filtered independently. ``level=0`` emits STORED
    deflate blocks, whose byte count is a closed-form function of the
    raster size (what the expression-level fixture synthesizer mirrors).

    ``palette`` (an (n, 3) uint8 array) writes color type 3: ``img`` is
    then an (h, w) index raster packed at ``bit_depth`` (1/2/4/8,
    default the smallest that fits the palette). ``bit_depth`` without a
    palette writes sub-byte GRAYSCALE (type 0): samples must be in
    [0, 2^depth)."""
    img = np.asarray(img)
    if palette is not None or (bit_depth is not None and bit_depth < 8):
        if img.ndim == 3 and img.shape[2] == 1:
            img = img[..., 0]
        if img.ndim != 2:
            raise ValueError("palette/sub-byte PNG takes an (h, w) raster")
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape
        if palette is not None:
            palette = np.ascontiguousarray(palette, dtype=np.uint8)
            if palette.ndim != 2 or palette.shape[1] != 3 \
                    or not 1 <= palette.shape[0] <= 256:
                raise ValueError("palette must be (1..256, 3) uint8")
            color = 3
            if bit_depth is None:
                need = max(int(img.max(initial=0)).bit_length(), 1)
                bit_depth = next(d for d in (1, 2, 4, 8) if d >= need)
        else:
            color = 0
        depth = int(bit_depth)
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bit_depth must be 1/2/4/8, got {depth}")
        if int(img.max(initial=0)) >= (1 << depth):
            raise ValueError(f"sample out of range for bit depth {depth}")

        def _rows(sub: np.ndarray) -> np.ndarray:
            if depth == 8:
                return sub
            return _png_pack_bits(sub, depth)

        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                           1 if interlace else 0)
        filters = filters or [0]
        if interlace:
            parts = [
                _png_filter_rows(
                    _rows(np.ascontiguousarray(img[y0::ys, x0::xs])), 1,
                    filters,
                )
                for x0, y0, xs, ys in _ADAM7
                if img[y0::ys, x0::xs].size
            ]
            payload = b"".join(parts)
        else:
            payload = _png_filter_rows(_rows(img), 1, filters)
        plte = (_png_chunk(b"PLTE", palette.tobytes())
                if palette is not None else b"")
        return (PNG_SIG + _png_chunk(b"IHDR", ihdr) + plte
                + _png_chunk(b"IDAT", zlib.compress(payload, level))
                + _png_chunk(b"IEND", b""))

    depth = 16 if img.dtype == np.uint16 else 8
    img = np.ascontiguousarray(
        img, dtype=np.uint16 if depth == 16 else np.uint8,
    )
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    if ch not in (1, 2, 3, 4):
        raise ValueError(
            f"unsupported channel count {ch} (PNG color types cover 1-4)",
        )
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * (depth // 8)
    # (h, w*bpp) byte matrix; 16-bit samples expand big-endian
    byts = img.astype(">u2").view(np.uint8).reshape(h, w * bpp) \
        if depth == 16 else img.reshape(h, w * bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    filters = filters or [0]
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            sb = sub.astype(">u2").view(np.uint8).reshape(ph, pw * bpp) \
                if depth == 16 else sub.reshape(ph, pw * bpp)
            parts.append(_png_filter_rows(np.ascontiguousarray(sb), bpp,
                                          filters))
        payload = b"".join(parts)
    else:
        payload = _png_filter_rows(byts, bpp, filters)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(payload, level))
            + _png_chunk(b"IEND", b""))


def encode_image_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_image_ppm` (test fixtures / sink side)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_audio_wav(
    samples: np.ndarray,
    sample_rate: int,
    fmt: str = "pcm16",
) -> bytes:
    """Inverse of :func:`decode_audio_wav` for fixtures: ``fmt`` picks the
    container variant — "pcm16" (default), "pcm8", "pcm24", "pcm32",
    "float32", "float64", "ulaw"/"alaw" (ITU-T G.711 companding via
    nearest-code search, exact round-trip for values in the decode
    image), "ima4"/"ms2" (IMA-/MS-ADPCM, 256·ch-byte blocks + fact
    chunk), or
    "ext-pcm16" (WAVE_FORMAT_EXTENSIBLE wrapping 16-bit
    PCM). Integer inputs are int16 values scaled up to the target
    width; float formats take the int16 values / 32767."""
    s = np.ascontiguousarray(np.atleast_2d(samples.T).T, dtype="<i2")
    n_channels = s.shape[1] if s.ndim == 2 else 1
    if fmt == "pcm16" or fmt == "ext-pcm16":
        raw, code, bits = s.tobytes(), 1, 16
    elif fmt == "pcm8":
        raw = ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        code, bits = 1, 8
    elif fmt == "pcm24":
        v = (s.astype(np.int32) << 8).reshape(-1)
        b = np.zeros((v.size, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw, code, bits = b.tobytes(), 1, 24
    elif fmt == "pcm32":
        raw = (s.astype(np.int32) << 16).astype("<i4").tobytes()
        code, bits = 1, 32
    elif fmt in ("float32", "float64"):
        f = s.astype(np.float64) / 32767.0
        raw = f.astype("<f4" if fmt == "float32" else "<f8").tobytes()
        code, bits = 3, 32 if fmt == "float32" else 64
    elif fmt in ("ulaw", "alaw"):
        code = 7 if fmt == "ulaw" else 6
        raw, bits = _g711_compress(s, code).tobytes(), 8
    elif fmt == "ima4":
        block_align = 256 * n_channels
        raw, spb = _ima_adpcm_encode(s, block_align)
        code, bits = 0x11, 4
    elif fmt == "ms2":
        block_align = 256 * n_channels
        raw, spb = _ms_adpcm_encode(s, block_align)
        code, bits = 0x02, 4
    else:
        raise ValueError(f"unknown WAV fixture format {fmt!r}")
    width = bits // 8
    byte_rate = sample_rate * n_channels * width
    extra = b""
    if fmt == "ext-pcm16":
        fmt_body = struct.pack("<HHIIHH", 0xFFFE, n_channels, sample_rate,
                               byte_rate, n_channels * width, bits)
        fmt_body += struct.pack("<HHI", 22, bits, 0)
        fmt_body += struct.pack("<H", 1) + _WAV_GUID_TAIL
    elif fmt in ("ima4", "ms2"):
        byte_rate = (sample_rate * block_align + spb - 1) // spb
        fmt_body = struct.pack("<HHIIHH", code, n_channels, sample_rate,
                               byte_rate, block_align, bits)
        if fmt == "ima4":
            fmt_body += struct.pack("<HH", 2, spb)  # cbSize, wSamplesPerBlock
        else:  # MS-ADPCM: cbSize=32 — spb, wNumCoef, the 7 coef pairs
            fmt_body += struct.pack("<HHH", 32, spb, len(_MS_COEFS))
            for a, b in _MS_COEFS:
                fmt_body += struct.pack("<hh", int(a), int(b))
        # fact: true per-channel length so decode trims final-block pad
        extra = b"fact" + struct.pack("<II", 4, s.shape[0])
    else:
        fmt_body = struct.pack("<HHIIHH", code, n_channels, sample_rate,
                               byte_rate, n_channels * width, bits)
    hdr = (b"RIFF"
           + struct.pack("<I", 20 + len(fmt_body) + len(extra) + len(raw))
           + b"WAVE")
    hdr += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    hdr += extra
    hdr += b"data" + struct.pack("<I", len(raw))
    return hdr + raw


# ------------------------------------------------------------- GIF codec
# GIF87a/89a (CompuServe spec + W3C GIF89a specification): LZW-compressed
# indexed color, optional Adam-free 4-pass row interlacing, global/local
# palettes, GCE transparency. Third of the big three web image formats
# after JPEG/PNG.

GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # row interlace (start, step)


def _gif_lzw_decode(data: bytes, min_code: int, expected: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at ``min_code + 1``,
    LSB-first bit packing, CLEAR/EOI codes, dictionary capped at 4096
    (deferred-clear streams keep emitting at 12 bits). Stops at EOI or
    once ``expected`` pixels are out (some encoders omit EOI)."""
    clear = 1 << min_code
    eoi = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    acc = bits = pos = 0
    prev: bytes | None = None
    out = bytearray()
    while len(out) < expected:
        while bits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            del table[clear + 2:]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream (first code not "
                                 "a literal)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case: code defined by itself
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond table)")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return bytes(out[:expected])


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Greedy LZW encoder mirroring :func:`_gif_lzw_decode`'s table/width
    state transition exactly (the decoder appends one entry per code
    AFTER the first post-clear code; width bumps track that count)."""
    clear = 1 << min_code
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code + 1
    acc = bits = 0
    out = bytearray()
    dec_len = clear + 2      # decoder's table length
    emitted_since_clear = 0

    def emit(code: int) -> None:
        nonlocal acc, bits, width, dec_len, emitted_since_clear
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if code == clear:
            width = min_code + 1
            dec_len = clear + 2
            emitted_since_clear = 0
            return
        emitted_since_clear += 1
        if emitted_since_clear > 1 and dec_len < 4096:
            dec_len += 1
            if dec_len >= (1 << width) and width < 12:
                width += 1

    emit(clear)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code <= 4095:
            table[nxt] = next_code
            next_code += 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_read_header(
    data: bytes, budget: int,
) -> tuple[int, int, int, np.ndarray | None, int]:
    """Validate a GIF signature + logical-screen descriptor against the
    pixel budget BEFORE any allocation, and read the optional global
    color table. Returns (screen_w, screen_h, bg_index, gct, pos) —
    shared prologue of decode_image_gif and decode_gif_frames."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF87a/GIF89a stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("GIF declares a zero-size logical screen")
    if sw * sh > budget:
        raise ValueError(
            f"GIF logical screen {sw}x{sh} exceeds the {budget}-pixel "
            "decode budget",
        )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    return sw, sh, bg_idx, gct, pos


def _gif_read_ext(data: bytes, pos: int) -> tuple[int, list[bytes], int]:
    """Read one GIF extension (label + sub-blocks) at ``pos`` (past the
    0x21 introducer); returns (label, sub_blocks, new_pos)."""
    if pos >= len(data):
        raise ValueError("truncated GIF extension")
    label = data[pos]
    pos += 1
    subs = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF extension sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        subs.append(data[pos : pos + n])
        pos += n
    return label, subs, pos


def _gif_read_frame(
    data: bytes, pos: int, sw: int, sh: int, gct,
) -> tuple[int, int, np.ndarray, np.ndarray, int]:
    """Read one GIF image block at ``pos`` (past the 0x2C introducer):
    descriptor, optional local color table, LZW sub-blocks; decode and
    de-interlace. Returns (left, top, index_rows, palette, new_pos)."""
    if pos + 9 > len(data):
        raise ValueError("truncated GIF image descriptor")
    left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
    pos += 9
    if fw == 0 or fh == 0:
        raise ValueError("GIF frame has zero size")
    if left + fw > sw or top + fh > sh:
        raise ValueError("GIF frame rectangle overruns the logical screen")
    palette = gct
    if fpacked & 0x80:  # local color table overrides
        n = 2 << (fpacked & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if palette.size != 3 * n:
            raise ValueError("truncated GIF local color table")
        palette = palette.reshape(n, 3)
        pos += 3 * n
    if palette is None:
        raise ValueError("GIF frame has neither global nor local palette")
    if pos >= len(data):
        raise ValueError("truncated GIF image data")
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"GIF LZW minimum code size {min_code} out of range")
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF image sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        pos += n
    idx = np.frombuffer(
        _gif_lzw_decode(b"".join(chunks), min_code, fw * fh), np.uint8,
    )
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("GIF pixel index beyond its color table")
    rows = idx.reshape(fh, fw)
    if fpacked & 0x40:  # interlaced: rows arrive in the 4-pass order
        ordered = np.empty_like(rows)
        src = 0
        for start, step in _GIF_PASSES:
            n = len(range(start, fh, step))
            ordered[start::step] = rows[src : src + n]
            src += n
        rows = ordered
    return left, top, rows, palette, pos


def decode_image_gif(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/GIF89a into an (h, w, 3) uint8
    array — (h, w, 4) when the frame's graphic-control extension declares
    a transparent index (alpha 0 at those pixels). The frame composes onto
    the logical screen: regions outside a smaller frame rectangle fill
    with the global background color. Interlaced frames reorder through
    the four-pass row schedule. Later animation frames are ignored by
    design — feature extraction wants one raster, not a timeline.

    ``max_pixels`` (default :data:`MAX_PIXELS`) bounds the logical screen
    BEFORE any allocation or LZW walk, same posture as the PNG/JPEG
    decoders: the LZW loop is serial Python, so the featurizer passes the
    tighter :data:`FEATURIZER_MAX_PIXELS`."""
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    sw, sh, bg_idx, gct, pos = _gif_read_header(data, budget)
    transparent = None
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended before any image data")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image data")
        if block == 0x21:  # extension: label + sub-blocks
            label, subs, pos = _gif_read_ext(data, pos)
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                flags = subs[0][0]
                if flags & 0x01:
                    transparent = subs[0][3]
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02X}")
        break
    left, top, rows, palette, pos = _gif_read_frame(data, pos, sw, sh, gct)
    fh, fw = rows.shape
    channels = 3 if transparent is None else 4
    out = np.zeros((sh, sw, channels), np.uint8)
    if gct is not None and bg_idx < len(gct):
        out[..., :3] = gct[bg_idx]
    if channels == 4:
        out[..., 3] = 255
        out[top : top + fh, left : left + fw, 3] = np.where(
            rows == transparent, 0, 255,
        )
    out[top : top + fh, left : left + fw, :3] = palette[rows]
    return out


def decode_gif_frames(
    data: bytes,
    max_pixels: int | None = None,
    max_frames: int | None = None,
) -> list[tuple[int, int, np.ndarray]]:
    """Decode EVERY frame of a GIF87a/GIF89a with real animation
    compositing — the video-timeline twin of :func:`decode_image_gif`
    (which composes the first frame only). Returns a list of
    ``(start_ms, delay_ms, canvas)`` where ``canvas`` is the full
    (screen_h, screen_w, 3) uint8 logical screen AS DISPLAYED after the
    frame renders:

    - the canvas starts as the global background color (zeros without a
      global table), matching decode_image_gif's fill;
    - a graphic-control extension scopes ONE following frame: its delay
      (centiseconds → ms) drives the cumulative ``start_ms`` timeline,
      its transparency index leaves underlying canvas pixels showing
      through, and its disposal method is applied AFTER the frame is
      captured — 2 restores the frame rectangle to the background, 3
      restores the pre-frame canvas, 0/1 leave the canvas (GIF89a §23);
    - frames smaller than the screen compose at their (left, top) offset
      over whatever the previous frames left behind.

    ``max_pixels`` bounds the logical screen BEFORE any allocation or
    LZW walk (the same serial-codec posture as decode_image_gif);
    ``max_frames`` stops the walk early — a frame-SAMPLING caller does
    not need the tail of a 10k-frame banner GIF. Malformed framing
    raises ValueError naming the defect, like every codec here."""
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    sw, sh, bg_idx, gct, pos = _gif_read_header(data, budget)
    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    background = canvas.copy()
    frames: list[tuple[int, int, np.ndarray]] = []
    start_ms = 0
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended without a trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:
            label, subs, pos = _gif_read_ext(data, pos)
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                flags = subs[0][0]
                delay_ms = struct.unpack_from("<H", subs[0], 1)[0] * 10
                transparent = subs[0][3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02X}")
        left, top, rows, palette, pos = _gif_read_frame(data, pos, sw, sh, gct)
        fh, fw = rows.shape
        pre_frame = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        px = palette[rows]
        if transparent is None:
            region[:] = px
        else:
            mask = rows != transparent
            region[mask] = px[mask]
        frames.append((start_ms, delay_ms, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            break
        start_ms += delay_ms
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = (
                background[top : top + fh, left : left + fw]
            )
        elif disposal == 3 and pre_frame is not None:
            canvas = pre_frame
        transparent = None
        disposal = 0
        delay_ms = 0
    if not frames:
        raise ValueError("GIF trailer before any image data")
    return frames


def encode_image_gif(
    img: np.ndarray,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    frame_offset: tuple[int, int] = (0, 0),
    screen_size: tuple[int, int] | None = None,
    local_palette: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 array as GIF89a (fixture synthesizer for
    the decoder, like the PNG/JPEG pairs — real LZW, so streams are
    representative). The palette is built from the image's distinct
    colors (> 256 raises: quantization is a corpus-prep concern, not a
    container one). ``transparent_color`` marks that palette entry
    transparent via a GCE; ``frame_offset``/``screen_size`` place the
    frame on a larger logical screen; ``local_palette`` stores the table
    on the frame instead of the screen."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_image_gif wants (h, w, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; GIF caps at 256")
    depth = max(2, int(len(colors) - 1).bit_length())  # table size 2^depth
    table = np.zeros((1 << depth, 3), np.uint8)
    table[: len(colors)] = colors
    rows = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = np.concatenate([rows[s::p] for s, p in _GIF_PASSES], axis=0)
    left, top = frame_offset
    sw, sh = screen_size if screen_size else (left + w, top + h)
    if left + w > sw or top + h > sh:
        raise ValueError("frame does not fit the requested logical screen")
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palette else 0x80 | (depth - 1)
    out += struct.pack("<HHBBB", sw, sh, gct_flag, 0, 0)
    if not local_palette:
        out += table.tobytes()
    if transparent_color is not None:
        match = np.where((colors == np.array(transparent_color)).all(axis=1))[0]
        if match.size == 0:
            raise ValueError("transparent_color is not in the image")
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, int(match[0]), 0])
    fpacked = (0x80 | (depth - 1)) if local_palette else 0
    if interlace:
        fpacked |= 0x40
    out += b"\x2C" + struct.pack("<HHHHB", left, top, w, h, fpacked)
    if local_palette:
        out += table.tobytes()
    min_code = depth
    out += bytes([min_code])
    lzw = _gif_lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def encode_gif_animation(
    frames: list[dict],
    screen_size: tuple[int, int],
    background: tuple[int, int, int] = (0, 0, 0),
) -> bytes:
    """Encode a multi-frame GIF89a animation (fixture writer for
    :func:`decode_gif_frames`, like the still-image encoder pairs). Each
    frame dict: ``{"img": (h, w, 3) uint8, "left": int, "top": int,
    "delay_ms": int, "disposal": 0..3, "transparent_color": rgb | None}``.
    Every frame gets a graphic-control extension and its own LOCAL color
    table (built from the frame's distinct colors, > 256 raises); the
    global table holds only the background color."""
    sw, sh = screen_size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80, 0, 0)  # 2-entry global table
    out += bytes(background) + b"\x00\x00\x00"
    for fr in frames:
        img = np.ascontiguousarray(fr["img"], dtype=np.uint8)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("animation frames want (h, w, 3) uint8")
        h, w = img.shape[:2]
        left, top = int(fr.get("left", 0)), int(fr.get("top", 0))
        if left + w > sw or top + h > sh:
            raise ValueError("frame does not fit the logical screen")
        colors, inverse = np.unique(
            img.reshape(-1, 3), axis=0, return_inverse=True,
        )
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} distinct colors; GIF caps at 256")
        depth = max(2, int(len(colors) - 1).bit_length())
        table = np.zeros((1 << depth, 3), np.uint8)
        table[: len(colors)] = colors
        tcolor = fr.get("transparent_color")
        tflag, tidx = 0, 0
        if tcolor is not None:
            match = np.where((colors == np.array(tcolor)).all(axis=1))[0]
            if match.size == 0:
                raise ValueError("transparent_color is not in the frame")
            tflag, tidx = 1, int(match[0])
        delay_ms = int(fr.get("delay_ms", 0))
        if delay_ms % 10:
            # GIF stores delays in CENTISECONDS; silently flooring 25 ms
            # to 20 ms would make the decode round-trip disagree with the
            # caller's input — fixture writers refuse loudly instead
            raise ValueError(
                f"GIF frame delays are centisecond-grained; {delay_ms} ms "
                "is not a multiple of 10",
            )
        delay_cs = delay_ms // 10
        flags = ((int(fr.get("disposal", 0)) & 0x07) << 2) | tflag
        out += bytes([0x21, 0xF9, 4, flags])
        out += struct.pack("<H", delay_cs) + bytes([tidx, 0])
        out += b"\x2C" + struct.pack(
            "<HHHHB", left, top, w, h, 0x80 | (depth - 1),
        )
        out += table.tobytes()
        out += bytes([depth])
        lzw = _gif_lzw_encode(inverse.astype(np.uint8).tobytes(), depth)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# feature-vector kind codes (element 0 of the real feature vector)
KIND_OTHER, KIND_IMAGE, KIND_AUDIO = 0.0, 1.0, 2.0
# an image whose CONTAINER was parsed (mime + true dimensions) but
# whose pixels this module does not decode — WebP today (VP8 entropy
# decode is out of scope, the H.264 posture); the stats slots carry
# honest BYTE statistics, never fabricated pixels
KIND_IMAGE_META = 3.0


def parse_webp_header(data: bytes) -> tuple[str, int, int]:
    """WebP container sniff — (variant, width, height) from the
    RIFF/VP8/VP8L/VP8X headers alone, no pixel decode (a web crawl's
    images are heavily WebP; mime + dimensions is what corpus filters
    need and costs ~zero):

    - ``VP8 `` (lossy): 3-byte frame tag (must be a keyframe), the
      9D 01 2A start code, then 14-bit width/height;
    - ``VP8L`` (lossless): the 0x2F signature, then width-1/height-1
      as 14-bit fields of a little-endian 32-bit word (version 0);
    - ``VP8X`` (extended): 24-bit canvas width-1/height-1.

    Malformed headers raise ValueError naming the defect."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    cc = data[12:16]
    (csize,) = struct.unpack_from("<I", data, 16)
    if 20 + csize > len(data):
        raise ValueError("WebP chunk extends past the payload end")
    if cc == b"VP8 ":
        if csize < 10:
            raise ValueError("WebP VP8 chunk shorter than its header")
        tag = data[20] | (data[21] << 8) | (data[22] << 16)
        if tag & 1:
            raise ValueError(
                "WebP VP8 chunk starts with an interframe (a still "
                "image must start with a keyframe)",
            )
        if data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 keyframe start code missing")
        w = struct.unpack_from("<H", data, 26)[0] & 0x3FFF
        h = struct.unpack_from("<H", data, 28)[0] & 0x3FFF
        return "vp8", w, h
    if cc == b"VP8L":
        if csize < 5:
            raise ValueError("WebP VP8L chunk shorter than its header")
        if data[20] != 0x2F:
            raise ValueError("WebP VP8L signature byte missing")
        (bits,) = struct.unpack_from("<I", data, 21)
        if (bits >> 29) & 0x07:
            raise ValueError("WebP VP8L version is not zero")
        return "vp8l", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if cc == b"VP8X":
        if csize < 10:
            raise ValueError("WebP VP8X chunk shorter than its header")
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return "vp8x", w, h
    raise ValueError(f"WebP with unknown first chunk {cc!r}")


def encode_webp_header(
    width: int, height: int, variant: str = "vp8",
    n_payload: int = 24, fill: int = 0x5A,
) -> bytes:
    """Spec-built WebP fixture: a valid RIFF/WEBP container whose first
    chunk carries real dimensions; pixel payload bytes are ``fill``
    (no VP8 encoder exists here — the parser never reads them)."""
    if variant == "vp8":
        if not (0 < width < 1 << 14 and 0 < height < 1 << 14):
            raise ValueError("VP8 dimensions are 14-bit")
        tag = (0 | (1 << 4) | (n_payload << 5)) & 0xFFFFFF
        body = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
                + struct.pack("<HH", width, height)
                + bytes([fill]) * n_payload)
        cc = b"VP8 "
    elif variant == "vp8l":
        if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
            raise ValueError("VP8L dimensions are 14-bit")
        bits = (width - 1) | ((height - 1) << 14)
        body = (b"\x2f" + struct.pack("<I", bits)
                + bytes([fill]) * n_payload)
        cc = b"VP8L"
    elif variant == "vp8x":
        if not (0 < width <= 1 << 24 and 0 < height <= 1 << 24):
            raise ValueError("VP8X canvas dimensions are 24-bit")
        body = (b"\x00" + b"\x00" * 3
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little"))
        cc = b"VP8X"
    else:
        raise ValueError(f"unknown WebP variant {variant!r}")
    size = len(body)  # RIFF sizes are unpadded; the pad byte follows
    if size & 1:
        body += b"\x00"
    chunk = cc + struct.pack("<I", size) + body
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
            + chunk)

# every exception a malformed container can surface through the decoders:
# shared by decode_payload and resize_images so a new decoder's failure
# mode cannot reach one call site and abort the other's batch
_DECODE_ERRORS = (ValueError, ZeroDivisionError, struct.error, zlib.error,
                  IndexError, MemoryError, OverflowError)


def _sniff_image_magic(head: bytes) -> bool:
    return (head[:2] in (b"P6", b"BM") or head[:6] in GIF_SIGS
            or head[:8] == PNG_SIG or head[:3] == b"\xff\xd8\xff")


def _decode_image_payload(
    b: bytes, serial_budget: int, vector_budget: int | None,
):
    """One container dispatch for every image decoder (shared by the
    featurizer and resize_images so the magic table cannot drift).
    ``serial_budget`` caps the codecs whose entropy stage is a serial
    Python loop (JPEG Huffman walk, GIF LZW); ``vector_budget`` caps the
    vectorized ones (BMP, PNG's zlib+NumPy unfilter) — None takes each
    codec's own MAX_PIXELS default. Returns None for non-image magic."""
    if b[:2] == b"P6":
        return decode_image_ppm(b)
    if b[:2] == b"BM":
        return decode_image_bmp(b, max_pixels=vector_budget)
    if b[:6] in GIF_SIGS:
        return decode_image_gif(b, max_pixels=serial_budget)
    if b[:8] == PNG_SIG:
        return decode_image_png(b, max_pixels=vector_budget)
    if b[:3] == b"\xff\xd8\xff":
        from sed_binning_spark.pipeline.jpeg import decode_image_jpeg

        return decode_image_jpeg(b, max_pixels=serial_budget)
    return None


def decode_payload(payload: bytes, dim: int) -> list[float]:
    """Real featurizer: sniff the container by magic bytes, decode, emit
    ``[kind, d1, d2, d3, mean, std, min, max]`` (normalized stats) padded/
    truncated to ``dim``.

    - image (JPEG/PNG/PPM/BMP): kind=1, dims=(w, h, channels), stats / 255
    - audio (WAV/FLAC): kind=2, dims=(n_samples, rate, channels),
      stats / 32768 (FLAC decodes through the real RFC 9639 decoder,
      rescaled to the shared int16 contract)
    - WebP (RIFF..WEBP): kind=3, dims=(w, h, 0) from the VP8/VP8L/VP8X
      headers — a header-only sniff (no VP8 pixel decoder ships here,
      the H.264 posture), so the stats slots carry honest BYTE
      statistics like kind 0, never fabricated pixels
    - anything else:   kind=0, dims=(n_bytes, 0, 0), byte stats / 255
    """
    payload = payload or b""
    vec = None
    try:
        img = _decode_image_payload(
            payload, FEATURIZER_MAX_PIXELS, FEATURIZER_MAX_PIXELS,
        )
        if img is not None:
            h, w, ch = img.shape
            vec = [KIND_IMAGE, float(w), float(h), float(ch), *_norm_stats(img, 255.0)]
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            # must sit ABOVE the audio branch: WebP is RIFF too
            _, w, h = parse_webp_header(payload)
            arr = np.frombuffer(payload, dtype=np.uint8)
            vec = [KIND_IMAGE_META, float(w), float(h), 0.0,
                   *_norm_stats(arr, 255.0)]
        else:
            # one magic table: _decode_audio_payload owns the audio
            # dispatch (None = not audio), so a new container added
            # there reaches this featurizer without a second edit
            audio = _decode_audio_payload(payload)
            if audio is not None:
                samples, rate = audio
                vec = [KIND_AUDIO, float(samples.shape[0]), float(rate),
                       float(samples.shape[1]),
                       *_norm_stats(samples, 32768.0)]
    except _DECODE_ERRORS:
        # magic matched but the container is truncated/unsupported (16-bit
        # PPM, RLE/1/4-bpp BMP, corrupt IDAT stream,
        # arithmetic/bit-flipped JPEG, RIFF-but-AVI, zero
        # channels...): ONE bad payload must not kill a corpus-wide
        # mapInPandas job — fall through to honest byte statistics, as
        # documented. IndexError/MemoryError belong here too: corrupt
        # variable-length structures index past their buffers, and a
        # corrupt header can demand an absurd allocation.
        vec = None
    if vec is None:
        arr = np.frombuffer(payload, dtype=np.uint8)
        vec = [KIND_OTHER, float(arr.size), 0.0, 0.0, *_norm_stats(arr, 255.0)]
    vec = vec[:dim]
    return vec + [0.0] * (dim - len(vec))


def _norm_stats(x: np.ndarray, scale: float) -> list[float]:
    if x.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x = x.astype(np.float64)
    return [float(x.mean() / scale), float(x.std() / scale),
            float(x.min() / scale), float(x.max() / scale)]


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a codec+featurizer: md5-seeded floats.
    NOT a real decoder — replace with e.g. Pillow + a vision model."""
    h = hashlib.md5(payload or b"").digest()
    vals = []
    for i in range(dim):
        b = h[(2 * i) % 16], h[(2 * i + 1) % 16]
        vals.append(((b[0] << 8 | b[1]) / 65535.0) * 2.0 - 1.0)
    return vals


def extract_features(
    df: DataFrame,
    feature_dim: int = 8,
    payload_column: str = "payload",
    id_column: str = "media_id",
    decode_stub: bool = False,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize media payloads with ``mapInPandas``.

    The Arrow batches stream binary payloads into Python partition-locally
    (no shuffle, no driver collect); the returned frame follows
    FEATURE_SCHEMA. ``batch_hint`` documents the intended
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sizing for large
    payloads (binary columns dominate batch memory).

    ``decode_stub=False`` (the default) runs the real pure-NumPy codecs
    (:func:`decode_payload`: PPM/BMP images, WAV audio (the PCM/float/extensible matrix, one int16 contract), byte stats
    otherwise); ``decode_stub=True`` opts into the deterministic md5 fake
    featurizer, kept only for plumbing fixtures that need an
    engine-agnostic reproducible vector.
    """
    import pandas as pd

    featurize = _fake_decode if decode_stub else decode_payload

    def _decode_batches(batches):
        for pdf in batches:
            # featurize each DISTINCT payload once per batch (the same
            # dedup-before-decode rule as _frame_batches: features are a
            # pure function of the bytes, and real corpora are full of
            # byte-identical re-uploads; the memo dies with the batch)
            memo: dict = {}
            feats = []
            nbytes = []
            for p in pdf[payload_column]:
                b = b"" if p is None else bytes(p)
                f = memo.get(b)
                if f is None:
                    f = featurize(b, feature_dim)
                    memo[b] = f
                feats.append(f)
                nbytes.append(len(b))
            yield pd.DataFrame({
                "media_id": pdf[id_column],
                "n_bytes": nbytes,
                "feat": feats,
            })

    return df.select(id_column, payload_column).mapInPandas(
        _decode_batches, schema=FEATURE_SCHEMA,
    )


def resize_image(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy, any channel count)."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(height) * (h / height)).astype(np.int64), h - 1)
    ci = np.minimum((np.arange(width) * (w / width)).astype(np.int64), w - 1)
    return img[ri][:, ci]


TRANSCODED_AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_samples", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
])


def transcode_audio(
    df: DataFrame,
    target_rate: int | None = None,
    mono: bool = False,
    fmt: str = "pcm16",
    payload_column: str = "payload",
    id_column: str = "media_id",
) -> DataFrame:
    """Normalize audio payloads — the standard pre-ASR/pre-training
    corpus step (everything to one rate, one channel, one codec):
    decode any supported WAV (PCM widths, float, G.711, ADPCM) or
    FLAC payload (lossless, via the RFC 9639 decoder),
    optionally downmix to mono (channel mean, rounded), optionally
    resample by linear interpolation (``np.interp`` per channel; at an
    integral rate ratio with aligned phase this picks exact source
    samples), and re-encode as ``fmt`` (any :func:`encode_audio_wav`
    format). Output rows follow TRANSCODED_AUDIO_SCHEMA with the new
    payload; non-audio, NULL, and undecodable payloads yield a NULL
    payload row (the id survives, so a join can audit what was
    dropped) — same degradation contract as resize_images.

    Distribution: one ``mapInPandas`` stage, Arrow-batched, no shuffle,
    no driver collect; peak per-task memory is one payload's decoded
    int16 plus one float64 channel during interpolation."""
    import pandas as pd

    if target_rate is not None and target_rate <= 0:
        raise ValueError(f"target_rate must be positive, got {target_rate}")
    # validate fmt EAGERLY — an unknown format must fail plan
    # construction loudly, not be swallowed per-row as a decode error
    encode_audio_wav(np.zeros(1, np.int16), 8000, fmt=fmt)

    def _one(b: bytes) -> tuple[bytes, int, int, int] | None:
        got = _decode_audio_payload(b)
        if got is None:
            return None
        samples, rate = got
        if samples.size == 0 or rate <= 0:
            return None
        if mono and samples.shape[1] > 1:
            samples = np.round(
                samples.astype(np.float64).mean(axis=1),
            ).astype(np.int16)[:, None]
        out_rate = rate
        if target_rate is not None and target_rate != rate:
            n = samples.shape[0]
            n_out = max(1, int(np.ceil(n * target_rate / rate)))
            pos = np.arange(n_out) * (rate / target_rate)
            samples = np.stack([
                np.round(np.interp(pos, np.arange(n),
                                   samples[:, c].astype(np.float64)))
                for c in range(samples.shape[1])
            ], axis=1).astype(np.int16)
            out_rate = target_rate
        return (encode_audio_wav(samples, out_rate, fmt=fmt),
                out_rate, samples.shape[0], samples.shape[1])

    def _batches(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                got = None
                if payload is not None:
                    try:
                        got = _one(bytes(payload))
                    except _DECODE_ERRORS:
                        got = None
                rows.append(
                    (mid, None, None, None, None) if got is None
                    else (mid, got[0], got[1], got[2], got[3]),
                )
            yield pd.DataFrame(
                rows, columns=TRANSCODED_AUDIO_SCHEMA.fieldNames(),
            )

    return df.select(id_column, payload_column).mapInPandas(
        _batches, schema=TRANSCODED_AUDIO_SCHEMA,
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    payload_column: str = "payload",
    id_column: str = "media_id",
) -> DataFrame:
    """Resize image payloads to (height, width) with ``mapInPandas``.

    Same partition-local Arrow-batch shape as :func:`extract_features`:
    payloads never shuffle and never reach the driver. Every image
    container this module decodes (PPM, 8/24/32-bit BMP, PNG, baseline +
    progressive JPEG, GIF) resizes nearest-neighbor and re-encodes as
    RGB PPM (the canonical interop output of this module) — grayscale
    replicates across channels, alpha drops; non-image or undecodable
    payloads pass through as NULL with NULL dimensions — one corrupt
    file must not abort a 100 TB batch.
    """
    import pandas as pd

    def _to_rgb(img: np.ndarray) -> np.ndarray:
        if img.ndim == 2:
            img = img[:, :, None]
        ch = img.shape[2]
        if ch >= 3:
            return img[:, :, :3]
        return np.repeat(img[:, :, :1], 3, axis=2)  # gray(+alpha) -> RGB

    def _resize_batches(batches):
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p in pdf[payload_column]:
                img = None
                # sniff 8 bytes before materializing the payload: a mixed
                # media table's multi-MB WAV/video blobs must not pay an
                # O(payload) copy just to fail the signature checks
                if p is not None and _sniff_image_magic(bytes(p[:8])):
                    try:
                        # serial-loop codecs keep the tight budget; the
                        # vectorized ones (BMP/PNG) take their 64 MP
                        # default — resize is a re-encoder, not the
                        # featurizer the 4 MP rationale is scoped to
                        img = _decode_image_payload(
                            bytes(p), FEATURIZER_MAX_PIXELS, None,
                        )
                        if img is not None:
                            img = _to_rgb(img)
                    except _DECODE_ERRORS:
                        # a truncated header raises struct.error, a deflate
                        # bomb MemoryError — ONE corrupt payload must not
                        # abort the batch
                        img = None
                if img is not None and img.size == 0:
                    # a syntactically valid 0x0 image has nothing to
                    # resample (the nearest-neighbor index math would
                    # index an empty axis) — treat as undecodable
                    img = None
                if img is None:
                    out_payload.append(None)
                    out_w.append(None)
                    out_h.append(None)
                else:
                    out_payload.append(encode_image_ppm(
                        resize_image(img, height, width),
                    ))
                    out_w.append(width)
                    out_h.append(height)
            yield pd.DataFrame({
                "media_id": pdf[id_column],
                "payload": out_payload,
                "mime": ["image/x-portable-pixmap" if p is not None else None
                         for p in out_payload],
                "width": pd.array(out_w, dtype="Int32"),
                "height": pd.array(out_h, dtype="Int32"),
            })

    return df.select(id_column, payload_column).mapInPandas(
        _resize_batches, schema=RESIZED_SCHEMA,
    )


def split_mjpeg_frames(data: bytes, max_frames: int | None = None) -> list[bytes]:
    """Split a raw Motion-JPEG stream (back-to-back SOI..EOI images — the
    .mjpeg / multipart-HTTP form) into its frame byte runs by WALKING the
    marker structure, not by searching for FFD9: APPn/COM payloads may
    embed whole JPEGs (EXIF thumbnails), so only a structural walk finds
    the true frame ends. Inside entropy-coded data a 0xFF byte is always
    stuffed (FF 00) or a restart marker, so the post-SOS scan for the
    next true marker is sound per T.81 §B.1.1.5. A truncated trailing
    frame is dropped, and a frame whose corrupted innards derail the
    walk (a bogus marker inside entropy data reads as a huge segment
    length) is skipped by RESYNCING to the next SOI after its start —
    best-effort recovery, the crawl posture: the decodable frames are
    the data."""
    frames: list[bytes] = []
    pos, n = 0, len(data)
    while pos + 1 < n and (max_frames is None or len(frames) < max_frames):
        # resync to the next SOI (streams may pad between frames)
        while pos + 1 < n and not (data[pos] == 0xFF and data[pos + 1] == 0xD8):
            pos += 1
        if pos + 1 >= n:
            break
        start = pos
        pos += 2
        complete = False
        resync_at = None
        while pos + 1 < n:
            if data[pos] != 0xFF:
                pos += 1  # tolerate inter-segment garbage: resync on FF
                continue
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI: frame complete
                pos += 2
                frames.append(data[start:pos])
                complete = True
                break
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker == 0xD8:
                # SOI can never legitimately occur inside a frame: the
                # current frame lost its EOI (truncated) — drop it and
                # restart the outer resync AT this SOI so the following
                # frame is not swallowed into a merged undecodable blob
                resync_at = pos
                break
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                pos += 2  # TEM/RSTn: standalone markers
                continue
            if pos + 3 >= n:
                pos = n
                break
            seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
            pos += 2 + seg_len
            if marker == 0xDA:  # SOS: entropy data until a true marker
                while pos + 1 < n and not (
                    data[pos] == 0xFF
                    and data[pos + 1] != 0x00
                    and not 0xD0 <= data[pos + 1] <= 0xD7
                ):
                    pos += 1
        if not complete:
            # the walk derailed (corrupt innards or truncated tail):
            # resync at the mid-frame SOI if one ended the walk, else to
            # the next SOI after THIS frame's start — either way the scan
            # start strictly increases per outer iteration, terminating
            pos = resync_at if resync_at is not None else start + 2
    return frames


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame_ms", LongType(), False),
    # nullable: Matroska does not require per-frame durations — a
    # WebM block without BlockDuration or a track DefaultDuration
    # reports NULL rather than a fabricated delay
    StructField("delay_ms", LongType(), True),
    # nullable: a metadata-only timeline row (a real-codec MP4 track —
    # no pixel decoder ships here) carries timing/extent but no pixels;
    # width/height stay NULL when the sample entry omits them
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("mean", DoubleType(), True),
    StructField("std", DoubleType(), True),
    StructField("min", DoubleType(), True),
    StructField("max", DoubleType(), True),
    # byte extent of the container sample (NULL where frames are not
    # byte-delimited, e.g. composited GIF canvases) and the container's
    # sync/keyframe flag (stss for MP4; raw MJPEG frames are all intra)
    StructField("n_bytes", LongType(), True),
    StructField("keyframe", BooleanType(), True),
])


def sample_frames(
    df: DataFrame,
    payload_column: str = "payload",
    id_column: str = "media_id",
    max_frames: int | None = 256,
    mjpeg_frame_ms: int = 0,
    keyframes_only: bool = False,
    media: str = "video",
    tolerate_truncated_mp3_tail: bool = False,
) -> DataFrame:
    """Decode the frame TIMELINE of animated media payloads — the decode
    half of video frame sampling, pairing :func:`frame_sample_plan`'s
    pure-expression timestamp grid. One output row per decoded frame
    (FRAME_SCHEMA): the frame's start timestamp and display delay from
    the container's own timing metadata, the composed canvas dimensions,
    and its normalized pixel statistics (/255, the same contract as
    :func:`decode_payload`'s image stats).

    Containers: animated GIF via :func:`decode_gif_frames` (full
    compositing: disposal, transparency, per-frame delays from the
    container) and raw Motion-JPEG via :func:`split_mjpeg_frames` + the
    JPEG codec (MJPEG carries NO timing — ``mjpeg_frame_ms`` is the
    caller-declared frame interval, 0 when unknown; a corrupt frame
    mid-stream is skipped, the rest of the stream survives). MP4 goes
    through :func:`~sed_binning_spark.pipeline.mp4.parse_mp4_timeline`:
    Motion-JPEG tracks decode to full pixel statistics; any OTHER video
    codec (avc1/hev1 — real corpora are mostly H.264, and no pixel
    decoder ships here) still yields its complete container timeline —
    start/delay/byte extent/stss keyframe flag and the sample-entry
    dimensions — with NULL pixel statistics, so frame-rate/duration/
    keyframe analyses run on real video without pretending to decode
    it. WebM/Matroska (EBML) payloads get the same metadata-only
    treatment via :func:`~sed_binning_spark.pipeline.webm.
    parse_webm_timeline` — block timing, byte extents, keyframe flags,
    NULL stats (and NULL delay where the container carries no
    duration). Payloads that are not animated media or fail to decode
    contribute NO frame rows — a still image has no timeline; route it
    through :func:`extract_features` instead.

    Same distribution shape as extract_features: ``mapInPandas``, Arrow
    batches stream partition-locally, no shuffle, no driver collect; the
    serial LZW/Huffman walks run under FEATURIZER_MAX_PIXELS per frame,
    and ``max_frames`` (default 256 — a FINITE default on purpose:
    decode_gif_frames materializes one canvas copy per frame, so a
    10k-frame looping banner GIF at the pixel budget would otherwise
    build tens of GB inside one task) bounds the walk per payload;
    ``None`` opts into unbounded.

    ``keyframes_only=True`` keeps only sync samples — the cheap sampling
    mode for thumbnail/training-frame extraction at corpus scale, and
    the pruning happens BEFORE payload decode, not as a row filter: MP4
    samples outside stss are skipped undecoded, a GIF decodes only frame
    0 (its single independently-decodable frame — ``max_frames`` drops
    to 1 for it), and raw MJPEG keeps everything because every frame is
    intra-coded.

    ``media="audio"`` walks the AUDIO track of MP4/WebM/Ogg/MP3/ADTS
    containers
    instead (metadata-only always — AAC/Opus/MPEG audio do not decode
    here, though Ogg Opus packet durations come exactly from the RFC
    6716 TOC byte, MP3 frame lengths from the header tables, and ADTS
    frame lengths from the header's explicit 13-bit field):
    per-sample container timing, byte extents, and sync flags, which is
    how a speech-corpus pipeline locates and measures audio segments
    inside A/V files without touching a codec. Non-container payloads
    (GIF/MJPEG stills, WAV — route WAV through sample_audio_windows)
    contribute no rows in audio mode.
    ``tolerate_truncated_mp3_tail=True`` opts the MP3 AND ADTS
    branches into keeping the complete frames of a download-truncated
    file instead of degrading the whole payload to zero rows — the
    most common defect in crawled MP3/AAC files (see
    parse_mp3_timeline; every emitted row is still a complete,
    header-verified frame)."""
    import pandas as pd

    if media not in ("video", "audio"):
        raise ValueError(f"media must be 'video' or 'audio', got {media!r}")

    def _stat_row(canvas, n_bytes, keyframe):
        h, w = canvas.shape[:2]
        return (w, h, *_norm_stats(canvas, 255.0), n_bytes, keyframe)

    def _meta_rows(samples, tw=None, th=None):
        """Metadata-only timeline rows (NULL stats) from parsed
        (start, delay, pos, size, keyframe) samples — shared by the
        WebM/Ogg/MP3 branches; the container index survives
        keyframes_only pruning."""
        return [
            (i, start_ms, delay_ms, tw, th,
             None, None, None, None, size, kf)
            for i, (start_ms, delay_ms, _pos, size, kf)
            in enumerate(samples)
            if not keyframes_only or kf
        ]

    def _decode_timeline(b: bytes):
        """Rows of (frame_index, start_ms, delay_ms, width, height,
        mean, std, min, max, n_bytes, keyframe) — frame_index stays the
        CONTAINER's sample index even when keyframes_only skips rows."""
        if media == "audio":
            if b[:4] == b"OggS":
                # Ogg Opus: per-packet timing from the RFC 6716 TOC
                # byte — a full timeline with no decoder
                from sed_binning_spark.pipeline.ogg import (
                    parse_ogg_opus_timeline,
                )

                return _meta_rows(parse_ogg_opus_timeline(
                    b, max_frames)["samples"])
            from sed_binning_spark.pipeline.aac import looks_like_adts

            if looks_like_adts(b):
                # ADTS AAC: per-frame timing from the 13-bit length
                # field walk. This check sits ABOVE the MPEG audio
                # branch and they cannot collide: ADTS layer bits are
                # 00 where every valid MP3 layer code is non-zero
                from sed_binning_spark.pipeline.aac import (
                    parse_adts_timeline,
                )

                return _meta_rows(parse_adts_timeline(
                    b, max_frames,
                    tolerate_truncated_tail=tolerate_truncated_mp3_tail,
                )["samples"])
            if b[:3] == b"ID3" or (
                len(b) >= 4 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0
            ):
                # MPEG audio: per-frame timing from the header walk
                # (no magic beyond the sync bits; JPEG's FF D8 fails
                # the 0xE0 mask so the branches cannot collide)
                from sed_binning_spark.pipeline.mp3 import (
                    parse_mp3_timeline,
                )

                return _meta_rows(parse_mp3_timeline(
                    b, max_frames,
                    tolerate_truncated_tail=tolerate_truncated_mp3_tail,
                )["samples"])
            if not (b[:4] == b"\x1aE\xdf\xa3"
                    or (len(b) >= 12 and b[4:8] == b"ftyp")):
                # the gate must sit ABOVE the GIF/MJPEG branches: those
                # carry no container audio track and must yield no rows
                # in audio mode, not video frame rows
                return []
        if b[:6] in GIF_SIGS:
            # composited canvases are not byte-delimited → NULL extent;
            # GIF has no sync-sample concept → NULL keyframe. Keyframe
            # mode decodes ONLY frame 0 (the one independently-decodable
            # frame) — the cap is the saving, not a post-filter
            gif_cap = 1 if keyframes_only else max_frames
            return [
                (i, start_ms, delay_ms, *_stat_row(canvas, None, None))
                for i, (start_ms, delay_ms, canvas) in enumerate(
                    decode_gif_frames(
                        b, max_pixels=FEATURIZER_MAX_PIXELS,
                        max_frames=gif_cap,
                    ),
                )
            ]
        if b[:3] == b"\xff\xd8\xff":
            from sed_binning_spark.pipeline.jpeg import decode_image_jpeg

            out = []
            for i, fb in enumerate(split_mjpeg_frames(b, max_frames)):
                try:
                    img = decode_image_jpeg(fb, max_pixels=FEATURIZER_MAX_PIXELS)
                except _DECODE_ERRORS:
                    continue  # skip the corrupt frame, keep the stream
                # every raw-MJPEG frame is intra-coded → keyframe
                out.append((
                    i, i * mjpeg_frame_ms, mjpeg_frame_ms,
                    *_stat_row(img, len(fb), True),
                ))
            return out
        if b[:4] == b"\x1aE\xdf\xa3":
            # WebM/Matroska: metadata-only timeline (VP8/VP9/AV1/Opus —
            # no decoder ships here, same posture as avc1-in-MP4)
            from sed_binning_spark.pipeline.webm import parse_webm_timeline

            info = parse_webm_timeline(b, max_frames, media=media)
            return _meta_rows(info["samples"],
                              tw=info["width"] or None,
                              th=info["height"] or None)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            # MP4 container: samples + CONTAINER timing from the moov
            # sample tables (pipeline.mp4). Motion-JPEG tracks decode to
            # pixel stats; real codecs (avc1/...) keep their timeline
            # with NULL stats — metadata-only, never fake statistics
            from sed_binning_spark.pipeline.jpeg import decode_image_jpeg
            from sed_binning_spark.pipeline.mp4 import parse_mp4_timeline

            info = parse_mp4_timeline(b, max_frames, media=media)
            # the byte-level flag, not a codec-string round-trip: 4CCs
            # are arbitrary bytes and may not re-encode as ascii
            decode = info["decodable"]
            tw = info["width"] or None
            th = info["height"] or None
            out = []
            for i, (start_ms, delay_ms, pos, size, kf) in enumerate(
                info["samples"],
            ):
                if keyframes_only and not kf:
                    continue  # pruned BEFORE payload decode
                if decode:
                    try:
                        img = decode_image_jpeg(
                            b[pos : pos + size],
                            max_pixels=FEATURIZER_MAX_PIXELS,
                        )
                    except _DECODE_ERRORS:
                        continue  # skip the corrupt sample, keep the track
                    out.append((
                        i, start_ms, delay_ms, *_stat_row(img, size, kf),
                    ))
                else:
                    out.append((
                        i, start_ms, delay_ms, tw, th,
                        None, None, None, None, size, kf,
                    ))
            return out
        return []

    def _frame_batches(batches):
        for pdf in batches:
            rows = []
            # decode each DISTINCT payload once per batch: the timeline is a
            # pure function of the bytes, and real corpora are full of
            # byte-identical re-uploads — the memo dies with the batch, so
            # memory stays bounded and every run still computes from input
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    continue
                b = bytes(payload)
                decoded = memo.get(b)
                if decoded is None:
                    try:
                        decoded = _decode_timeline(b)
                    except _DECODE_ERRORS:
                        decoded = []  # one corrupt payload keeps the batch alive
                    memo[b] = decoded
                for tail in decoded:
                    rows.append((mid, *tail))
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return df.select(id_column, payload_column).mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA,
    )


AUDIO_WINDOW_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("window_index", IntegerType(), False),
    StructField("start_ms", LongType(), False),
    StructField("duration_ms", LongType(), False),
    StructField("n_samples", IntegerType(), False),
    StructField("mean", DoubleType(), False),
    StructField("std", DoubleType(), False),
    StructField("rms", DoubleType(), False),
    StructField("min", DoubleType(), False),
    StructField("max", DoubleType(), False),
])


def sample_audio_windows(
    df: DataFrame,
    payload_column: str = "payload",
    id_column: str = "media_id",
    window_ms: int = 1000,
    hop_ms: int | None = None,
    max_windows: int | None = 4096,
) -> DataFrame:
    """Audio twin of :func:`sample_frames`: slice each RIFF/WAVE or
    FLAC payload (the latter through the real RFC 9639 decoder —
    LibriSpeech/MLS-style speech corpora ship FLAC)
    into fixed-length windows on the container's OWN clock (the fmt
    chunk's sample rate) and emit one row per window with its start
    time, true duration (both round-to-nearest ms — a floored duration
    would understate every window at rates that don't divide 1000),
    sample count, and normalized statistics
    (samples/32768 — the int16 contract :func:`decode_audio_wav`
    rescales every source format to; channels pool into one window).
    The windowed-feature step of an audio curation pipeline: silence
    trimming, clipping detection, level filtering all run on these rows
    without a second decode.

    ``hop_ms`` (default = ``window_ms``, i.e. non-overlapping) strides
    the window start; a trailing partial window IS emitted with its
    actual ``n_samples``/``duration_ms`` — at corpus scale silently
    dropping tails would bias duration statistics. ``max_windows``
    bounds rows per payload (the ``max_frames`` posture; ``None`` opts
    into unbounded). Non-audio payloads, NULL payloads, and payloads
    that fail to decode contribute NO rows — same contract as
    sample_frames. Same distribution shape too: one ``mapInPandas``
    stage, Arrow-batched, no shuffle, no driver collect."""
    import pandas as pd

    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    hop = window_ms if hop_ms is None else hop_ms
    if hop <= 0:
        raise ValueError(f"hop_ms must be positive, got {hop_ms}")

    def _window_tails(b: bytes):
        """Window rows sans media_id — a pure function of the payload."""
        try:
            got = _decode_audio_payload(b)
        except _DECODE_ERRORS:
            return []  # one corrupt payload keeps the batch alive
        if got is None:
            return []  # not audio: no windows, like a still image
        samples, rate = got
        if rate <= 0 or samples.size == 0:
            return []
        spw = max(1, window_ms * rate // 1000)
        sph = max(1, hop * rate // 1000)
        tails = []
        w = 0
        for start in range(0, samples.shape[0], sph):
            if max_windows is not None and w >= max_windows:
                break
            # normalize per WINDOW, not the whole payload: an
            # hour-long 44.1 kHz file must not allocate a
            # file-sized float64 copy inside one task (the /2^15
            # scale is exact either way)
            win = samples[start : start + spw] / 32768.0
            n = win.shape[0]  # >= 1: range() bounds start
            tails.append((
                w,
                # round-to-nearest ms, not floor: at rates that
                # don't divide 1000 a floored duration would
                # systematically understate every window (~4% at
                # 44.1 kHz) — the bias this operator documents
                # avoiding
                (start * 1000 + rate // 2) // rate,
                (n * 1000 + rate // 2) // rate,
                n,  # time frames; channels pool into the stats
                float(win.mean()), float(win.std()),
                float(np.sqrt((win * win).mean())),
                float(win.min()), float(win.max()),
            ))
            w += 1
        return tails

    def _window_batches(batches):
        for pdf in batches:
            rows = []
            # decode each DISTINCT payload once per batch (the
            # sample_frames memo rationale: timelines are pure in the
            # bytes, corpora repeat payloads, the memo dies with the batch)
            memo: dict = {}
            for mid, payload in zip(pdf[id_column], pdf[payload_column]):
                if payload is None:
                    continue
                b = bytes(payload)
                tails = memo.get(b)
                if tails is None:
                    tails = memo[b] = _window_tails(b)
                for tail in tails:
                    rows.append((mid, *tail))
            yield pd.DataFrame(rows, columns=AUDIO_WINDOW_SCHEMA.fieldNames())

    return df.select(id_column, payload_column).mapInPandas(
        _window_batches, schema=AUDIO_WINDOW_SCHEMA,
    )


def wav_fixture_n_bytes(n_samples: int = 16) -> int:
    """Closed-form payload size of :func:`synthesize_wav_media_from_text`:
    RIFF header (12) + fmt chunk (8+16) + data chunk header (8) +
    samples. The fixture always writes one 16-byte md5 digest, so the
    even-padding rule for odd RIFF chunk sizes never applies here."""
    return 12 + 24 + 8 + n_samples


def synthesize_wav_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    sample_rate: int = 1000,
    codec: str = "pcm8",
) -> DataFrame:
    """Expression-built RIFF/WAVE fixture: 8-bit mono audio whose 16
    data samples are exactly ``unhex(md5(text))``. ``codec`` picks the
    fmt-chunk format tag the same bytes sit behind — "pcm8" (tag 1,
    unsigned offset-binary: decoded int16 = (byte − 128) · 256),
    "ulaw" (tag 7) or "alaw" (tag 6, ITU-T G.711: the byte IS the
    companded code, decoded through the exact-integer expansion
    tables) — so every windowed statistic is an exact closed form any
    md5-capable engine can regenerate (dyadic rationals over exact
    integers: sums, means, and variances round NOWHERE in a double).
    NULL text maps to a NULL payload, like the image fixtures."""
    try:
        tag = {"pcm8": 1, "ulaw": 7, "alaw": 6}[codec]
    except KeyError:
        raise ValueError(f"unknown fixture codec {codec!r}") from None
    n = 16  # one md5 digest of samples
    header = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + n) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, tag, 1, sample_rate, sample_rate, 1, 8,
        )
        + b"data" + struct.pack("<I", n)
    )
    payload = F.when(
        F.col(text_column).isNotNull(),
        F.concat(F.lit(header), F.unhex(F.md5(F.col(text_column)))),
    )
    dur = n * 1000 // sample_rate
    return df.select(
        F.col(id_column).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(text_column).isNotNull(),
               F.lit("audio/wav")).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col(text_column).isNotNull(), F.lit(dur))
        .cast("int").alias("duration_ms"),
    )


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_column: str = "duration_ms",
    id_column: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame timestamp)
    via sequence+explode — the pure-expression half of frame extraction
    (the decode of each frame goes through :func:`extract_features`).

    Media with NULL duration are dropped (``greatest`` skips NULLs, so
    without the explicit filter an unknown-duration row would fabricate a
    single frame at t=0) — and so are zero/negative durations: a 0 ms
    video contains no frames, and a corrupt negative duration must not
    sample a frame that does not exist."""
    return df.filter(F.col(duration_column) > 0).select(
        F.col(id_column),
        F.explode(
            F.sequence(F.lit(0), F.col(duration_column) - 1, F.lit(every_ms)),
        ).alias("frame_ms"),
    )


def synthesize_ppm_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    width: int = 4,
    height: int = 2,
) -> DataFrame:
    """Fixture builder with REAL image payloads: wrap a text table into the
    MEDIA_SCHEMA contract where each payload is a valid binary PPM (P6)
    whose pixel bytes are the md5 digest of the text, cycled to fill
    ``width * height * 3`` samples.

    Entirely expression-level (md5 → unhex → concat), so the payloads are
    reproducible in any engine that has md5 — which is what lets the
    cross-engine oracle regenerate the exact pixel statistics the real
    :func:`decode_payload` codec emits. NULL text maps to a NULL payload.
    """
    n = width * height * 3
    header = b"P6\n%d %d\n255\n" % (width, height)
    hexd = F.md5(F.col(text_column))
    parts = [F.lit(header)] + [F.unhex(hexd)] * (n // 16)
    if n % 16:
        parts.append(F.unhex(F.substring(hexd, 1, 2 * (n % 16))))
    payload = F.when(F.col(text_column).isNotNull(), F.concat(*parts))
    return df.select(
        F.col(id_column).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(text_column).isNotNull(),
               F.lit("image/x-portable-pixmap")).alias("mime"),
        F.when(F.col(text_column).isNotNull(), F.lit(width)).cast("int").alias("width"),
        F.when(F.col(text_column).isNotNull(), F.lit(height)).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _png_fixture_rows(width: int, height: int, interlace: bool):
    """Scanline layout of the expression-built PNG fixture: a list of
    rows, each a list of pixel indices (y*width + x). Sequential = the
    natural raster; interlaced = the Adam7 pass permutation, computed at
    plan time (the fixture dimensions are plan constants, so the
    container's byte layout is a fixed permutation of the same samples)."""
    if not interlace:
        return [[r * width + x for x in range(width)] for r in range(height)]
    rows = []
    for x0, y0, xs, ys in _ADAM7:
        if x0 >= width or y0 >= height:
            continue
        for y in range(y0, height, ys):
            rows.append([y * width + x for x in range(x0, width, xs)])
    return rows


def png_fixture_n_bytes(width: int, height: int, interlace: bool = False) -> int:
    """Closed-form payload size of :func:`synthesize_png_media_from_text`:
    signature + IHDR chunk + one IDAT chunk wrapping a single STORED
    deflate block + IEND — deterministic because stored blocks do not
    compress (a zlib-level choice would tie the byte count to the zlib
    implementation and break the cross-engine oracle). Rasters too large
    for one stored block RAISE, exactly like the synthesizer: zlib's own
    multi-block chunking is irregular AND implementation-dependent
    (verified: 1.2.13 caps the first block at 65531 bytes, not 65535), so
    there is no honest closed form beyond this domain. NB this sizes the
    SYNTHESIZER's hand-framed stream; ``encode_image_png(level=0)`` goes
    through ``zlib.compress`` and agrees only up to zlib's own block cap
    (raw_len <= 65531 on 1.2.13). ``interlace`` sizes the Adam7 layout —
    same samples, one filter byte per PASS row."""
    raw_len = sum(
        1 + 3 * len(row) for row in _png_fixture_rows(width, height, interlace)
    )
    if raw_len >= 65535:
        raise ValueError(
            f"raster of {raw_len} scanline bytes exceeds one stored "
            "deflate block — no closed-form size exists",
        )
    data_len = 2 + 5 + raw_len + 4  # zlib hdr + block hdr + raw + adler
    return 8 + 25 + (12 + data_len) + 12


def synthesize_png_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    width: int = 4,
    height: int = 2,
    interlace: bool = False,
) -> DataFrame:
    """Fixture builder with REAL PNG payloads, entirely expression-level:
    each payload is a valid 8-bit RGB PNG whose pixels are the md5 digest
    of the text cycled to ``width*height*3`` samples — the same raster
    :func:`synthesize_ppm_media_from_text` wraps, so the decoded features
    are identical and only the container differs. The IDAT stream is one
    STORED deflate block (zlib header ``78 01``, final-stored block
    header, raw scanlines, adler32), so the payload length is the closed
    form :func:`png_fixture_n_bytes` and every byte is a deterministic
    function of md5(text): the scanlines slice a cycled hex string, the
    adler32 sums are plan-time weighted sums of per-sample ``conv()``
    byte values (no aggregation), and the chunk CRC is ``F.crc32``. That
    determinism is what lets the DuckDB oracle predict both the features
    AND ``n_bytes`` without parsing a container. ``interlace=True`` emits
    the Adam7 layout — the SAME samples as the sequential container under
    a plan-time pixel permutation (the fixture dimensions are constants),
    so the decoded features stay identical and only the byte layout and
    closed-form length change; this puts the interlaced decode path on
    the oracle gate without the oracle ever parsing a container."""
    n = width * height * 3
    layout = _png_fixture_rows(width, height, interlace)
    raw_len = sum(1 + 3 * len(row) for row in layout)
    if raw_len >= 65535:
        raise ValueError("fixture raster too large for one stored block")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0,
                       1 if interlace else 0)
    # the whole payload expression is ONE generated SQL string parsed
    # JVM-side in a single call (see synthesize_gif_media_from_text):
    # the adler32 weighted sums alone were ~150 Py4J round-trips of
    # query-construction time per PNG leg when assembled as Column ops
    tcol, icol = _q(text_column), _q(id_column)
    md5s = f"md5({tcol})"
    reps = -(-n // 16)  # ceil: md5 is 16 bytes / 32 hex chars
    full_hex = f"substring(concat({', '.join([md5s] * reps)}), 1, {2 * n})"

    def sample(j: int) -> str:  # byte value of pixel sample j
        return _md5_sample_sql(tcol, j)

    # raw scanlines: filter byte 0 + the row's pixel bytes, as BINARY.
    # Consecutive pixels slice full_hex in one substring; the interlaced
    # permutation slices per pixel (plan-time constant positions).
    rows = []
    for row in layout:
        rows.append("X'00'")
        runs = [[row[0]]]
        for p in row[1:]:
            (runs[-1].append(p) if p == runs[-1][-1] + 1 else runs.append([p]))
        for run in runs:
            rows.append(
                f"unhex(substring({full_hex}, {run[0] * 6 + 1}, {6 * len(run)}))",
            )
    raw = f"concat({', '.join(rows)})"
    # adler32 over the raw bytes: s1 = 1 + sum(b); s2 = n + sum of s1
    # prefixes = raw_len + sum((raw_len - i) * b_i) over 0-based i; filter
    # bytes contribute 0 — all plan-time weighted sums, no aggregate
    vals = []  # (0-based position in raw, sample index)
    pos = 0
    for row in layout:
        pos += 1  # filter byte, value 0
        for p in row:
            for k in range(3):
                vals.append((pos, p * 3 + k))
                pos += 1
    s1 = ("((1L + " + " + ".join(sample(j) for _, j in vals)
          + ") % 65521)")
    s2 = (f"(({raw_len}L + "
          + " + ".join(f"{sample(j)} * {raw_len - p}" for p, j in vals)
          + ") % 65521)")
    adler = f"unhex(lpad(hex({s2} * 65536 + {s1}), 8, '0'))"
    stored = b"\x01" + struct.pack("<HH", raw_len, raw_len ^ 0xFFFF)
    data = (f"concat(X'7801', X'{stored.hex()}', {raw}, {adler})")
    data_len = 2 + 5 + raw_len + 4
    idat_head = struct.pack(">I", data_len) + b"IDAT"
    idat = (f"concat(X'{idat_head.hex()}', {data}, "
            f"unhex(lpad(hex(crc32(concat(X'{b'IDAT'.hex()}', {data}))), "
            f"8, '0')))")
    png_head = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    payload = (f"CASE WHEN {tcol} IS NOT NULL THEN concat("
               f"X'{png_head.hex()}', {idat}, "
               f"X'{_png_chunk(b'IEND', b'').hex()}') END")
    return df.selectExpr(
        f"cast({icol} as bigint) as media_id",
        f"{payload} as payload",
        f"CASE WHEN {tcol} IS NOT NULL THEN 'image/png' END as mime",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN {width} END as int) as width",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN {height} END as int)"
        " as height",
        "cast(null as int) as duration_ms",
    )


def _gif_fixture_codes(n: int) -> list:
    """LZW code sequence of the expression-built GIF fixture: a CLEAR
    before every run of ≤7 literals keeps each (CLEAR + 7 literal) group
    at exactly 8 nine-bit codes = 9 BYTES, so the variable-width bit
    packing becomes a plan-time byte layout (the dictionary never reaches
    512 entries between clears, so the code width is pinned at 9)."""
    codes: list = []
    for g in range(0, n, 7):
        codes.append(256)  # CLEAR
        codes.extend(("s", j) for j in range(g, min(g + 7, n)))
    codes.append(257)  # EOI
    return codes


def _q(name: str) -> str:
    """Backtick-quote an identifier for generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def _md5_sample_sql(tcol: str, j: int) -> str:
    """SQL for md5-cycled sample byte j (the expression twin of the
    Column-level sample() the fixture builders used to assemble)."""
    return (f"cast(conv(substring(md5({tcol}), {(j % 16) * 2 + 1}, 2), "
            f"16, 10) as bigint)")


def _gif_lzw_sql(tcol: str, codes: list, lzw_len: int, rot: int) -> str:
    """SQL for the fixed-layout 9-bit LZW stream bytes (LSB-first,
    two-code shift/mask per byte), with the sample indices rotated by
    ``rot`` (frame index of the animated fixture)."""
    def code_sql(k: int) -> str:
        if k >= len(codes):
            return "0L"  # zero pad bits after EOI
        c = codes[k]
        if isinstance(c, int):
            return f"{c}L"
        return _md5_sample_sql(tcol, (c[1] + rot) % 16)

    parts = []
    for i in range(lzw_len):
        k1, s = divmod(8 * i, 9)  # LSB-first: byte i holds bits [8i, 8i+8)
        b = (f"((shiftright({code_sql(k1)}, {s}) + "
             f"shiftleft({code_sql(k1 + 1)}, {9 - s})) & 255)")
        parts.append(f"lpad(hex({b}), 2, '0')")
    return f"unhex(concat({', '.join(parts)}))"


def gif_fixture_n_bytes(width: int, height: int) -> int:
    """Closed-form payload size of :func:`synthesize_gif_media_from_text`:
    header + logical screen descriptor + 256-entry grayscale table +
    image descriptor + min-code byte + one sub-block of the fixed-layout
    LZW stream + terminator + trailer."""
    n = width * height * 3
    lzw_len = (9 * len(_gif_fixture_codes(n)) + 7) // 8
    return 6 + 7 + 768 + 10 + 1 + 1 + lzw_len + 1 + 1


def synthesize_gif_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    width: int = 4,
    height: int = 2,
) -> DataFrame:
    """Fixture builder with REAL GIF payloads, entirely expression-level:
    each payload is a valid GIF89a whose raster is an ``n = width*height*3``
    × 1 GRAYSCALE strip over a constant 256-gray palette, one pixel per
    md5-cycled sample byte — so the decoded RGB raster is each sample
    triplicated, and every normalized statistic (mean/std/min/max over
    the value distribution) equals the PPM/PNG legs' exactly; only the
    dims and the closed-form :func:`gif_fixture_n_bytes` differ. The LZW
    stream needs no encoder in the plan: a CLEAR before every 7 literals
    pins the code width at 9 bits and byte-aligns each group, so every
    stream byte is a two-code shift/mask expression over md5 nibbles
    (constant-folded where both codes are CLEAR/EOI). This puts the GIF
    decode path — a real LZW walk — on the cross-engine oracle gate
    without the oracle ever parsing a container."""
    n = width * height * 3
    codes = _gif_fixture_codes(n)
    lzw_len = (9 * len(codes) + 7) // 8
    if lzw_len > 255:
        raise ValueError("fixture LZW stream exceeds one GIF sub-block")
    # the whole payload expression is generated as ONE SQL string and
    # parsed JVM-side in a single call: assembling it from pyspark
    # Column ops costs ~8 Py4J round-trips per LZW byte, which dominates
    # query CONSTRUCTION time (driver, not cluster) for plan-built media
    tcol, icol = _q(text_column), _q(id_column)
    lzw = _gif_lzw_sql(tcol, codes, lzw_len, rot=0)
    gct = bytes(b for v in range(256) for b in (v, v, v))
    head = (b"GIF89a" + struct.pack("<HHBBB", n, 1, 0xF7, 0, 0) + gct
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, n, 1, 0)
            + bytes([8, lzw_len]))
    payload = (f"CASE WHEN {tcol} IS NOT NULL THEN "
               f"concat(X'{head.hex()}', {lzw}, X'003b') END")
    return df.selectExpr(
        f"cast({icol} as bigint) as media_id",
        f"{payload} as payload",
        f"CASE WHEN {tcol} IS NOT NULL THEN 'image/gif' END as mime",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN {n} END as int) as width",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN 1 END as int) as height",
        "cast(null as int) as duration_ms",
    )


def animated_gif_fixture_n_bytes(
    width: int, height: int, frames: int,
) -> int:
    """Closed-form payload size of
    :func:`synthesize_animated_gif_media_from_text`: header + screen
    descriptor + 256-entry grayscale table + per frame (GCE + image
    descriptor + min-code + sub-block) + trailer."""
    n = width * height * 3
    lzw_len = (9 * len(_gif_fixture_codes(n)) + 7) // 8
    return 6 + 7 + 768 + frames * (8 + 10 + 1 + 1 + lzw_len + 1) + 1


def synthesize_animated_gif_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    width: int = 4,
    height: int = 2,
    frames: int = 3,
) -> DataFrame:
    """Multi-frame twin of :func:`synthesize_gif_media_from_text`: a
    valid ANIMATED GIF89a built entirely in plan expressions. Each of
    ``frames`` full-screen grayscale strips carries the md5-cycled
    samples rotated by its frame index (frame f pixel j = digest byte
    (j + f) mod 16) behind a graphic-control extension declaring a
    (2 + f)-centisecond delay with disposal 0 and no transparency — so
    the decoded timeline has closed-form start times (start_f =
    Σ_{g<f} (2+g)·10 ms) and per-frame pixel statistics any md5-capable
    engine can regenerate, which is what puts decode_gif_frames'
    compositing walk on the cross-engine oracle gate. NULL text maps to
    a NULL payload."""
    n = width * height * 3
    codes = _gif_fixture_codes(n)
    lzw_len = (9 * len(codes) + 7) // 8
    if lzw_len > 255:
        raise ValueError("fixture LZW stream exceeds one GIF sub-block")
    # one generated SQL string per payload (see
    # synthesize_gif_media_from_text): Column-op assembly of the
    # per-frame LZW bytes was the single largest Py4J cost of the
    # frame_sample query's construction
    tcol, icol = _q(text_column), _q(id_column)
    gct = bytes(b for v in range(256) for b in (v, v, v))
    parts = [
        "X'" + (b"GIF89a" + struct.pack("<HHBBB", n, 1, 0xF7, 0, 0)
                + gct).hex() + "'",
    ]
    for f in range(frames):
        head = (
            bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", 2 + f)
            + bytes([0, 0])
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, n, 1, 0)
            + bytes([8, lzw_len])
        )
        parts += [f"X'{head.hex()}'",
                  _gif_lzw_sql(tcol, codes, lzw_len, rot=f), "X'00'"]
    parts.append("X'3b'")
    payload = (f"CASE WHEN {tcol} IS NOT NULL THEN "
               f"concat({', '.join(parts)}) END")
    dur = sum((2 + f) * 10 for f in range(frames))
    return df.selectExpr(
        f"cast({icol} as bigint) as media_id",
        f"{payload} as payload",
        f"CASE WHEN {tcol} IS NOT NULL THEN 'image/gif' END as mime",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN {n} END as int) as width",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN 1 END as int) as height",
        f"cast(CASE WHEN {tcol} IS NOT NULL THEN {dur} END as int)"
        " as duration_ms",
    )


def synthesize_media_from_text(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Test fixture builder: wrap a text table into the MEDIA_SCHEMA
    contract (payload = utf-8 bytes). Lets the multimodal plumbing be
    exercised without real media files."""
    return df.select(
        F.col(id_column).cast("long").alias("media_id"),
        F.encode(F.col(text_column), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length(text_column) * 10).cast("int").alias("duration_ms"),
    )
