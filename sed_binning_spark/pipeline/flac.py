"""FLAC decoding for the audio pipeline — the dominant public
speech-corpus format (LibriSpeech, MLS, Common Voice exports ship
FLAC). Unlike the MP4/WebM/Ogg/MP3 walks this is a REAL sample
decoder: FLAC is lossless and pure-integer (RFC 9639), so decoded
samples equal the encoder's input exactly, which makes every decoded
statistic closed-form oracle-able — the same property PCM WAV has,
with none of ADPCM's frozen-literal compromises.

Implemented from the public spec (RFC 9639):

- ``fLaC`` magic, STREAMINFO (blocksize/rate/channels/bits/total/md5),
  other metadata blocks skipped by their declared length;
- frame headers: 14-bit sync, blocking strategy, the full blocksize /
  sample-rate / sample-size code tables, UTF-8-style coded frame or
  sample numbers, CRC-8 verified; frame footers CRC-16 verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (reconstructed as
  order-fold prefix sums — the fixed predictors are exactly the
  binomial difference operators), LPC any order (quantized
  coefficients, signed shift), wasted bits;
- residuals: partitioned Rice, both 4-bit (method 0) and 5-bit
  (method 1) parameters, including the escape code (raw fixed-width
  partitions); Rice decoding is numpy-assisted — terminator positions
  come from one ``flatnonzero`` over the frame's bit array and the
  low bits gather in one vectorized step, so the per-sample Python
  work is a pointer walk, not a bit-reader call chain;
- stereo decorrelation: left/side, right/side, mid/side (side channels
  carry their +1 bit per the spec);
- integrity: the STREAMINFO md5 of the unencoded little-endian
  samples is VERIFIED when present (non-zero), as is the declared
  total-sample count — a truncated or corrupt file refuses loudly
  rather than returning silently wrong audio.

The decoder materializes one ``np.unpackbits`` bit array plus a
uint32 index of its one-bit positions over the payload — 8 bytes per
payload byte for the bits and ~4·density more for the index, i.e.
~24 bytes per payload byte worst case on ~50%-ones compressed audio —
the same one-decoded-payload-per-task posture as the image codecs; a
minute-grain speech segment (~1 MB) costs ~24 MB of working set, and
storing audio pre-segmented (SCALE.md's standing guidance) keeps it
there. Payloads past 512 MB refuse loudly (the index is uint32).
Like the pure-Python JPEG codec, this module is the documented
swappable seam: the Spark-side plumbing (schema, mapInPandas batch
shape, degradation contract) is the product; a faster codec drops in
behind :func:`decode_audio_flac` without touching any operator.

No counterpart exists in the reference repo (photoemission binning,
no media code); the format knowledge is RFC 9639 only.
"""
import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_CRC8_TABLE = None   # poly 0x07, init 0
_CRC16_TABLE = None  # poly 0x8005, init 0


def _crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        t = []
        for i in range(256):
            r = i
            for _ in range(8):
                r = ((r << 1) ^ 0x07 if r & 0x80 else r << 1) & 0xFF
            t.append(r)
        _CRC8_TABLE = t
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        t = []
        for i in range(256):
            r = i << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005 if r & 0x8000 else r << 1) & 0xFFFF
            t.append(r)
        _CRC16_TABLE = t
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _Bits:
    """MSB-first bit reader over the payload, with a one-time
    ``unpackbits`` view and precomputed one-bit positions so Rice
    partitions decode by pointer walks over ``ones`` instead of a
    per-bit Python loop."""

    __slots__ = ("data", "pos", "nbits", "bits", "ones")

    def __init__(self, data: bytes):
        if len(data) * 8 >= 1 << 32:
            # the ones index is uint32 to halve its footprint; a
            # single >512 MB audio cell is outside every documented
            # posture anyway (store media pre-segmented)
            raise ValueError("FLAC payload beyond the 512 MB bound")
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8
        arr = np.frombuffer(data, dtype=np.uint8)
        self.bits = np.unpackbits(arr)
        self.ones = np.flatnonzero(self.bits).astype(np.uint32)

    def read(self, n: int) -> int:
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise ValueError("FLAC stream truncates inside a frame")
        val = int.from_bytes(
            self.data[pos >> 3 : (end + 7) >> 3], "big",
        )
        val >>= (8 - (end & 7)) & 7
        self.pos = end
        return val & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        ones = self.ones
        j = int(np.searchsorted(ones, self.pos))
        if j >= ones.size:
            raise ValueError("FLAC stream truncates inside a unary code")
        t = int(ones[j])
        q = t - self.pos
        self.pos = t + 1
        return q

    def align(self):
        """Advance to the next byte boundary; RFC 9639 requires the
        padding bits to be zero."""
        rem = (-self.pos) % 8
        if rem and self.read(rem) != 0:
            raise ValueError("FLAC frame padding bits are not zero")

    def rice_partition(self, n: int, param: int) -> np.ndarray:
        """Decode ``n`` Rice(param) residuals: unary quotient +
        ``param`` low bits, zigzag-mapped. Terminator one-bits come
        from the precomputed ``ones`` index (skipping ones that fall
        inside low-bit fields); the low bits gather vectorized."""
        if n == 0:
            return np.empty(0, np.int64)
        ones = self.ones
        m = ones.size
        j = int(np.searchsorted(ones, self.pos))
        ts = np.empty(n, np.int64)
        qs = np.empty(n, np.int64)
        pos = self.pos
        for k in range(n):
            if j >= m:
                raise ValueError(
                    "FLAC stream truncates inside a Rice partition",
                )
            t = int(ones[j])
            ts[k] = t
            qs[k] = t - pos
            pos = t + 1 + param
            j += 1
            while j < m and ones[j] < pos:
                j += 1
        if pos > self.nbits:
            raise ValueError("FLAC stream truncates inside a Rice partition")
        self.pos = int(pos)
        if int(qs.max()) > (1 << 32):
            # a quotient is bounded by the payload's bit count, so
            # (q << param) could overflow int64 SILENTLY (numpy wraps);
            # no real encoder emits gigabit unary runs — refuse
            raise ValueError(
                "FLAC Rice quotient beyond any real encoding "
                "(corrupt or crafted stream)",
            )
        if param:
            idx = ts[:, None] + 1 + np.arange(param, dtype=np.int64)
            weights = 1 << np.arange(param - 1, -1, -1, dtype=np.int64)
            vals = (qs << param) | (self.bits[idx].astype(np.int64)
                                    @ weights)
        else:
            vals = qs
        return (vals >> 1) ^ -(vals & 1)  # zigzag -> signed


def _read_coded_number(br: _Bits) -> int:
    """The frame header's UTF-8-style coded number (frame or sample
    index, up to 36 bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("FLAC frame number has an invalid lead byte")
    val = b0 & (mask - 1)
    for _ in range(n_cont):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError(
                "FLAC frame number has an invalid continuation byte",
            )
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    """Partitioned Rice residual: method 0 (4-bit params) or 1 (5-bit);
    the all-ones parameter escapes to raw fixed-width values."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError(
            f"FLAC partition order {porder} does not divide "
            f"blocksize {blocksize}",
        )
    part = blocksize >> porder
    if part < order:
        # the first partition holds part - order samples, which must
        # not go negative
        raise ValueError(
            "FLAC partition size smaller than the predictor order",
        )
    out = []
    for p in range(n_part):
        n = part - order if p == 0 else part
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            if width == 0:
                out.append(np.zeros(n, np.int64))
            else:
                vals = np.array(
                    [br.read_signed(width) for _ in range(n)], np.int64,
                )
                out.append(vals)
        else:
            out.append(br.rice_partition(n, param))
    resid = np.concatenate(out) if out else np.empty(0, np.int64)
    if resid.size and int(np.abs(resid).max()) > (1 << 40):
        # legal residuals fit in ~bps+order+1 bits (< 2^37 even at
        # 32-bit depth, order 4); anything larger is a corrupt or
        # crafted stream whose prefix-sum reconstruction could WRAP
        # int64 silently — refuse before arithmetic, not after
        raise ValueError(
            "FLAC residual beyond any legal sample depth "
            "(corrupt or crafted stream)",
        )
    return resid


def _fixed_reconstruct(order: int, warmup: np.ndarray,
                       resid: np.ndarray) -> np.ndarray:
    """FIXED predictors 0-4 are the binomial difference operators, so
    reconstruction is ``order`` prefix-sum folds seeded from the
    warmup's difference pyramid — fully vectorized."""
    if order == 0:
        return resid
    w = warmup.astype(np.int64)
    cur = resid.astype(np.int64)
    for k in range(order - 1, -1, -1):
        base = int(np.diff(w, n=k)[-1]) if k else int(w[-1])
        cur = base + np.cumsum(cur)
    return np.concatenate([w, cur])


# a reconstructed sample bound far beyond any legal depth (32-bit
# samples + side-channel bit + wasted-bit shifts stay under 2^34): a
# crafted/corrupt LPC frame whose recursion diverges must raise a
# ValueError HERE — unbounded Python ints would otherwise grow past
# int64 and surface an OverflowError at the array conversion, and
# stopping early is also O(1) instead of O(n·bigint)
_SAMPLE_LIMIT = 1 << 35


def _lpc_reconstruct(coefs: list[int], shift: int, warmup: np.ndarray,
                     resid: np.ndarray) -> np.ndarray:
    """Quantized-LPC reconstruction — the spec's exact integer
    arithmetic: s[i] = r[i] + (Σ c_j · s[i-1-j]) >> shift. The
    recursion is inherently sequential; plain-int Python is the
    honest portable form (the documented codec seam)."""
    out = warmup.tolist()
    for r in resid.tolist():
        acc = 0
        for jj, c in enumerate(coefs):
            acc += c * out[-1 - jj]
        v = r + (acc >> shift)
        if not -_SAMPLE_LIMIT <= v <= _SAMPLE_LIMIT:
            raise ValueError(
                "FLAC LPC reconstruction diverges beyond any legal "
                "sample range (corrupt or crafted stream)",
            )
        out.append(v)
    return np.array(out, dtype=np.int64)


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError(
            f"FLAC wasted bits {wasted} consume the whole {bps}-bit "
            f"sample",
        )
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(eff), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [br.read_signed(eff) for _ in range(blocksize)], np.int64,
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds the blocksize")
        warm = np.array(
            [br.read_signed(eff) for _ in range(order)], np.int64,
        )
        resid = _read_residual(br, blocksize, order)
        out = _fixed_reconstruct(order, warm, resid)
        if out.size and int(np.abs(out).max()) > _SAMPLE_LIMIT:
            # the prefix-sum folds are int64; a crafted stream whose
            # integration diverges must refuse like the LPC guard
            raise ValueError(
                "FLAC fixed-predictor reconstruction diverges beyond "
                "any legal sample range (corrupt or crafted stream)",
            )
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds the blocksize")
        warm = np.array(
            [br.read_signed(eff) for _ in range(order)], np.int64,
        )
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code 15 is invalid")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        out = _lpc_reconstruct(coefs, shift, warm, resid)
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(data: bytes) -> dict:
    """Decode a FLAC stream to its raw samples —
    ``{"samples": (n, channels) int64 at the stream's bit depth,
    "sample_rate": int, "channels": int, "bits_per_sample": int}``.
    The STREAMINFO md5 (when present) and total-sample count are
    verified; any malformed structure raises ValueError naming the
    defect, per the module posture."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata block header truncated")
        last = bool(data[pos] & 0x80)
        btype = data[pos] & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + length > len(data):
            raise ValueError("FLAC metadata block extends past the file")
        if btype == 0:
            if streaminfo is not None:
                raise ValueError("FLAC stream with two STREAMINFO blocks")
            if length != 34:
                raise ValueError(
                    f"FLAC STREAMINFO of {length} bytes (spec: 34)",
                )
            streaminfo = data[pos : pos + 34]
        elif btype == 127:
            raise ValueError("FLAC forbidden metadata block type 127")
        pos += length
    if streaminfo is None:
        raise ValueError("FLAC stream without a STREAMINFO block")
    raw = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = raw >> 44
    channels = ((raw >> 41) & 0x07) + 1
    bps = ((raw >> 36) & 0x1F) + 1
    total = raw & ((1 << 36) - 1)
    md5_ref = streaminfo[18:34]
    if sample_rate == 0:
        raise ValueError("FLAC STREAMINFO declares a zero sample rate")

    br = _Bits(data)
    br.pos = pos * 8
    chunks = []
    n_decoded = 0
    frame_index = 0
    while br.pos < br.nbits:
        frame_start = br.pos >> 3
        if br.read(14) != 0x3FFE:
            raise ValueError("FLAC frame without its sync code")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        variable = br.read(1)
        bs_code = br.read(4)
        if bs_code == 0:
            raise ValueError("FLAC reserved blocksize code 0")
        sr_code = br.read(4)
        if sr_code == 15:
            raise ValueError("FLAC invalid sample-rate code 15")
        ch_code = br.read(4)
        ss_code = br.read(3)
        if ss_code == 3:
            raise ValueError("FLAC reserved sample-size code 3")
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        coded = _read_coded_number(br)
        expect = n_decoded if variable else frame_index
        if coded != expect:
            raise ValueError(
                f"FLAC frame numbers out of order: coded {coded}, "
                f"expected {expect}",
            )
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            rate = sample_rate
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            rate = _RATE_TABLE[sr_code]
        if rate != sample_rate:
            raise ValueError(
                "FLAC frame sample rate differs from STREAMINFO",
            )
        fbps = bps if ss_code == 0 else _SAMPLE_SIZE_TABLE[ss_code]
        if fbps != bps:
            raise ValueError(
                "FLAC frame bit depth differs from STREAMINFO",
            )
        crc_at = br.pos >> 3
        if br.read(8) != _crc8(data[frame_start:crc_at]):
            raise ValueError("FLAC frame header fails its CRC-8")

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError(
                    "FLAC frame channel count differs from STREAMINFO",
                )
            subs = [_read_subframe(br, blocksize, bps)
                    for _ in range(n_ch)]
            frame = np.stack(subs, axis=1)
        elif ch_code <= 10:
            if channels != 2:
                raise ValueError(
                    "FLAC stereo decorrelation in a non-stereo stream",
                )
            # the SIDE subframe carries one extra bit (RFC 9639)
            if ch_code == 8:  # left/side
                left = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                frame = np.stack([left, left - side], axis=1)
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, blocksize, bps + 1)
                right = _read_subframe(br, blocksize, bps)
                frame = np.stack([right + side, right], axis=1)
            else:  # mid/side
                mid = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                mid = (mid << 1) | (side & 1)
                frame = np.stack(
                    [(mid + side) >> 1, (mid - side) >> 1], axis=1,
                )
        else:
            raise ValueError(
                f"FLAC reserved channel assignment {ch_code}",
            )
        br.align()
        crc16_at = br.pos >> 3
        if br.read(16) != _crc16(data[frame_start:crc16_at]):
            raise ValueError("FLAC frame fails its CRC-16")
        chunks.append(frame)
        n_decoded += blocksize
        frame_index += 1
        if total and n_decoded >= total:
            break

    if total and br.pos < br.nbits:
        # the total-unknown path refuses trailing garbage via the sync
        # check; the declared-total path must not be QUIETER — bytes
        # after the last counted frame are a concatenated stream or
        # corruption, not audio this decode accounted for
        raise ValueError(
            f"FLAC stream carries {(br.nbits - br.pos) // 8} trailing "
            f"bytes after its declared {total} samples",
        )
    if not chunks:
        raise ValueError("FLAC stream has no frames")
    samples = np.concatenate(chunks, axis=0)
    if total and samples.shape[0] != total:
        raise ValueError(
            f"FLAC STREAMINFO declares {total} samples, frames carry "
            f"{samples.shape[0]}",
        )
    lim = 1 << (bps - 1)
    if samples.max(initial=0) >= lim or samples.min(initial=0) < -lim:
        raise ValueError(
            f"FLAC decoded samples exceed the {bps}-bit range",
        )
    if md5_ref != b"\x00" * 16:
        width = (bps + 7) // 8
        got = hashlib.md5(_pack_samples(samples, width)).digest()
        if got != md5_ref:
            raise ValueError(
                "FLAC decoded audio fails the STREAMINFO md5 check",
            )
    return {
        "samples": samples,
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "bits_per_sample": int(bps),
    }


def _pack_samples(samples: np.ndarray, width: int) -> bytes:
    """Interleaved little-endian signed samples at ``width`` bytes —
    the byte stream the STREAMINFO md5 covers (RFC 9639 §8.2)."""
    flat = samples.reshape(-1).astype(np.int64)
    if width == 1:
        return flat.astype(np.int8).tobytes()
    if width == 2:
        return flat.astype("<i2").tobytes()
    out = flat.astype("<i8").view(np.uint8).reshape(-1, 8)
    return out[:, :width].tobytes()


def decode_audio_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload into the (samples (n, ch) int16, rate)
    contract every audio operator shares (decode_audio_wav's): wider
    depths keep their high 16 bits, narrower shift up."""
    info = decode_flac(data)
    s = info["samples"]
    bps = info["bits_per_sample"]
    if bps >= 16:
        s = s >> (bps - 16)
    else:
        s = s << (16 - bps)
    return s.astype(np.int16), info["sample_rate"]


# ---------------------------------------------------------- fixture writer
class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int):
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned bit writer")
        return bytes(self.buf)


def _coded_number_bytes(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # payload bits available: 6 per continuation + (6 - n_cont) lead
    for n_cont in range(1, 7):
        if n.bit_length() <= 6 * n_cont + (6 - n_cont):
            lead = (0xFF << (7 - n_cont)) & 0xFF
            out = [lead | (n >> (6 * n_cont)) & ((1 << (6 - n_cont)) - 1)]
            for k in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * k)) & 0x3F))
            return bytes(out)
    raise ValueError(f"coded number {n} exceeds 36 bits")


def _rice_cost(zig: np.ndarray, p: int) -> int:
    return int((zig >> p).sum()) + zig.size * (p + 1)


def _write_residual(bw: _BitWriter, resid: np.ndarray, order: int,
                    blocksize: int, partition_order: int,
                    escape: bool = False):
    bw.write(0, 2)  # method 0: 4-bit Rice parameters
    bw.write(partition_order, 4)
    n_part = 1 << partition_order
    if blocksize % n_part:
        raise ValueError("partition order must divide the blocksize")
    part = blocksize >> partition_order
    if part - order < 0:
        raise ValueError("first partition smaller than the order")
    at = 0
    for p in range(n_part):
        n = part - order if p == 0 else part
        vals = resid[at : at + n]
        at += n
        zig = ((vals << 1) ^ (vals >> 63)).astype(np.uint64)
        if escape:
            hi = int(vals.max(initial=0))
            lo = int(vals.min(initial=0))
            width = max(
                1,
                hi.bit_length() + 1 if hi > 0 else 1,
                (-lo - 1).bit_length() + 1 if lo < 0 else 1,
            )
            if width > 31:
                raise ValueError("escape width exceeds its 5-bit field")
            bw.write(15, 4)      # the escape parameter
            bw.write(width, 5)
            for v in vals.tolist():
                bw.write(int(v) & ((1 << width) - 1), width)
            continue
        best_p, best_c = 0, _rice_cost(zig, 0)
        for cand in range(1, 15):
            c = _rice_cost(zig, cand)
            if c < best_c:
                best_p, best_c = cand, c
        bw.write(best_p, 4)
        for z in zig.tolist():
            bw.unary(int(z) >> best_p)
            if best_p:
                bw.write(int(z) & ((1 << best_p) - 1), best_p)


def _write_subframe(bw: _BitWriter, sig: np.ndarray, bps: int,
                    subframe: str, order: int,
                    lpc_coefs: list[int] | None, lpc_shift: int,
                    lpc_precision: int, partition_order: int,
                    wasted_bits: int, escape: bool):
    eff = bps - wasted_bits
    if wasted_bits:
        if np.any(sig & ((1 << wasted_bits) - 1)):
            raise ValueError(
                "wasted_bits set but samples are not multiples of "
                f"2^{wasted_bits}",
            )
        sig = sig >> wasted_bits
    kind = subframe
    if kind == "constant" and np.unique(sig).size != 1:
        raise ValueError("constant subframe over a non-constant signal")
    bw.write(0, 1)
    if kind == "constant":
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed":
        if not 0 <= order <= 4:
            raise ValueError("fixed order must be 0-4")
        bw.write(8 | order, 6)
    elif kind == "lpc":
        if lpc_coefs is None or not 1 <= len(lpc_coefs) <= 32:
            raise ValueError("lpc needs 1-32 coefficients")
        bw.write(32 | (len(lpc_coefs) - 1), 6)
    else:
        raise ValueError(f"unknown subframe kind {kind!r}")
    if wasted_bits:
        bw.write(1, 1)
        bw.unary(wasted_bits - 1)
    else:
        bw.write(0, 1)
    if kind == "constant":
        bw.write(int(sig[0]), eff)
        return
    if kind == "verbatim":
        for v in sig.tolist():
            bw.write(int(v), eff)
        return
    if kind == "fixed":
        for v in sig[:order].tolist():
            bw.write(int(v), eff)
        resid = np.diff(sig, n=order) if order else sig.copy()
        _write_residual(bw, resid.astype(np.int64), order, sig.size,
                        partition_order, escape)
        return
    # lpc
    o = len(lpc_coefs)
    for v in sig[:o].tolist():
        bw.write(int(v), eff)
    bw.write(lpc_precision - 1, 4)
    bw.write(lpc_shift, 5)
    for c in lpc_coefs:
        if not -(1 << (lpc_precision - 1)) <= c < (1 << (lpc_precision - 1)):
            raise ValueError("lpc coefficient exceeds its precision")
        bw.write(c & ((1 << lpc_precision) - 1), lpc_precision)
    s64 = sig.astype(np.int64)
    pred = np.zeros(sig.size - o, np.int64)
    for jj, c in enumerate(lpc_coefs):
        pred += c * s64[o - 1 - jj : sig.size - 1 - jj]
    resid = s64[o:] - (pred >> lpc_shift)
    _write_residual(bw, resid, o, sig.size, partition_order, escape)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    channel_mode: str = "independent",
    subframe: str = "fixed",
    order: int = 2,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
    lpc_precision: int = 12,
    partition_order: int = 0,
    wasted_bits: int = 0,
    rice_escape: bool = False,
    write_md5: bool = True,
) -> bytes:
    """Spec-built FLAC fixture encoder — a real (if search-free)
    lossless encoder: the decoder must reproduce ``samples`` exactly.
    ``channel_mode`` picks independent / left_side / right_side /
    mid_side decorrelation for stereo input; ``subframe`` picks
    constant / verbatim / fixed(order) / lpc(coefs, shift, precision)
    coding for every subframe; ``partition_order`` splits residuals
    into 2^k Rice partitions (parameter auto-chosen per partition);
    ``rice_escape`` forces the escape (raw fixed-width) encoding;
    ``wasted_bits`` shifts samples down by k (they must be multiples
    of 2^k). The STREAMINFO md5 and total-sample count are written so
    the decoder's integrity checks are exercised for real."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if not 1 <= channels <= 8:
        raise ValueError(f"{channels} channels (FLAC allows 1-8)")
    if channel_mode != "independent" and channels != 2:
        raise ValueError(f"{channel_mode} needs exactly 2 channels")
    lim = 1 << (bits_per_sample - 1)
    if s.max(initial=0) >= lim or s.min(initial=0) < -lim:
        raise ValueError("samples exceed the declared bit depth")
    if n == 0:
        raise ValueError("no samples to encode")

    head = _BitWriter()
    head.write(block_size, 16)  # min blocksize
    head.write(block_size, 16)  # max blocksize
    head.write(0, 24)           # min framesize unknown
    head.write(0, 24)           # max framesize unknown
    head.write(sample_rate, 20)
    head.write(channels - 1, 3)
    head.write(bits_per_sample - 1, 5)
    head.write(n, 36)
    md5 = (hashlib.md5(_pack_samples(s, (bits_per_sample + 7) // 8))
           .digest() if write_md5 else b"\x00" * 16)
    streaminfo = head.bytes() + md5
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, at in enumerate(range(0, n, block_size)):
        frame = s[at : at + block_size]
        bs = frame.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # blocksize: 16-bit value - 1 at header end
        bw.write(0, 4)  # sample rate from STREAMINFO
        if channel_mode == "independent":
            bw.write(channels - 1, 4)
        else:
            bw.write({"left_side": 8, "right_side": 9,
                      "mid_side": 10}[channel_mode], 4)
        ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits_per_sample)
        if ss is None:
            raise ValueError(
                f"bit depth {bits_per_sample} has no frame code",
            )
        bw.write(ss, 3)
        bw.write(0, 1)
        for b in _coded_number_bytes(fi):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.buf  # byte-aligned here by construction
        bw.write(_crc8(bytes(hdr)), 8)

        if channel_mode == "independent":
            subs = [(frame[:, c], bits_per_sample)
                    for c in range(channels)]
        else:
            left = frame[:, 0]
            right = frame[:, 1]
            side = left - right
            if channel_mode == "left_side":
                subs = [(left, bits_per_sample),
                        (side, bits_per_sample + 1)]
            elif channel_mode == "right_side":
                subs = [(side, bits_per_sample + 1),
                        (right, bits_per_sample)]
            else:
                subs = [((left + right) >> 1, bits_per_sample),
                        (side, bits_per_sample + 1)]
        for sig, bps in subs:
            _write_subframe(bw, sig, bps, subframe, order, lpc_coefs,
                            lpc_shift, lpc_precision, partition_order,
                            wasted_bits, rice_escape)
        bw.align()
        body = bytes(bw.buf)
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
