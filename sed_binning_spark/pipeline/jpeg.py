"""Baseline JPEG (ITU-T T.81) codec in pure NumPy + stdlib — the decode
half of the multimodal image surface for real crawl corpora (JPEG + PNG
dominate), written from the public specification like the PNG codec
(no image library exists in this environment; a Pillow codec drops into
``multimodal.decode_payload`` without touching the distributed plan).

Scope — the baseline profile that covers the overwhelming majority of web
JPEGs:

- decode: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
  spectral selection + successive approximation per T.81 Annex G, the
  other large web-JPEG population), Huffman entropy coding, 1 or 3
  components, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers,
  JFIF/EXIF APPn segments skipped. 8-bit everywhere, plus 12-bit
  precision on the extended-sequential form (SOF1: 16-bit DQT entries,
  level shift 2048, output rescaled to the uint8 contract). Arithmetic
  coding, 12-bit progressive (spec-legal, refused until a real fixture
  exercises it), hierarchical, and lossless profiles raise ValueError —
  loud refusal, the multimodal dispatch degrades them to byte
  statistics.
- encode: the fixture/round-trip half — baseline (4:4:4/4:2:0/gray,
  Annex K tables; ``precision=12`` emits the SOF1 extended form with
  16-bit DQT and full-range flat Huffman tables) plus a progressive
  encoder emitting a
  libjpeg-style scan script (interleaved DC first + refinement,
  per-component spectral AC bands with two successive-approximation
  refinement levels, cross-block EOB runs, optional restarts) so the
  progressive decode paths are exercised by spec-built fixtures. JPEG is
  lossy; round-trip tests assert reconstruction within the quantization
  error bound, while progressive-vs-baseline parity is EXACT (both forms
  carry identical quantized coefficients).

The hot path stays NumPy-vectorized where the format allows: the IDCT is
one ``D.T @ block @ D`` matmul over all blocks at once, dequantization and
color conversion are whole-image array ops; only the Huffman bit-walk is
a Python loop (inherent — variable-length codes have a serial data
dependency), which is fine for the mapInPandas featurizer whose per-batch
cost is bounded by Arrow batch sizing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: forward block DCT = D @ B @ D.T
_DCT = np.array([
    [(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
    for k in range(8)
])


# ---------------------------------------------------------------- bitstream

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; RSTn markers are surfaced to the caller for predictor
    resets."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # discard consumed high bits first: an unbounded accumulator turns
        # every shift into a whole-stream bigint op — measured O(N^2)
        # (25.3 s -> 0.49 s for one 256 px decode)
        self.acc &= (1 << self.nbits) - 1
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits past the end (T.81 F.2.2.5 allows the
                # final code to be completed with padding)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via sync_restart()
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment — pad
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and clear bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker, hit end of scan")


def _build_huffman(bits, values) -> dict:
    """(length, code) -> symbol decode table per T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------------- decode

def decode_image_jpeg(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode a baseline JPEG into an (h, w, 3) RGB or (h, w, 1) gray
    uint8 array. Raises ValueError for non-baseline profiles (arithmetic,
    12-bit, hierarchical) and malformed streams.

    ``max_pixels`` (default :data:`MAX_PIXELS`, 64 MP) bounds the declared
    raster before any block allocation. The Huffman bit-walk is a serial
    pure-Python loop, so the budget bounds CPU as well as memory — callers
    in a latency-sensitive context (the mapInPandas featurizer) pass a
    much smaller budget and degrade oversized-but-valid images to byte
    statistics rather than stalling a task for minutes."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    qt16: set[int] = set()  # table ids stored with 16-bit (Pq=1) entries
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise ValueError(f"DQT precision field {pq} is invalid")
                tbl = np.zeros(64, dtype=np.int32)
                if pq:  # 16-bit entries (the extended/12-bit form)
                    tbl[ZIGZAG] = np.frombuffer(body[p : p + 128], ">u2")
                    p += 128
                    qt16.add(tq)
                else:
                    tbl[ZIGZAG] = np.frombuffer(body[p : p + 64], np.uint8)
                    p += 64
                    qt16.discard(tq)  # redefinition narrows back to 8-bit
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                if len(values) != n:
                    raise ValueError("DHT declares more codes than present")
                huff[(tc, th)] = _build_huffman(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if frame is not None:
                # T.81 allows ONE frame per image. Accepting a second SOF
                # would also reset the progressive scan-count cap
                # (n_scans lives on the frame), reopening the scan-flood
                # CPU hole the cap closes.
                raise ValueError("multiple SOF markers in one image")
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            # T.81: SOF0 (true baseline) is 8-bit only; 12-bit decodes on
            # the extended-sequential form (SOF1). 12-bit PROGRESSIVE is
            # spec-legal but refused until a real fixture exercises it —
            # the refuse-untested posture.
            if prec != 8 and not (prec == 12 and marker == 0xC1):
                raise ValueError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                # T.81 B.2.2: sampling factors are 1-4. A zero factor
                # would otherwise surface as ZeroDivisionError deep in
                # the MCU geometry instead of a typed refusal.
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"invalid SOF sampling factors {ch}x{cv} "
                        f"for component {cid} (spec range 1-4)",
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG profile (SOF marker 0x{marker:02X}: "
                "lossless/arithmetic/hierarchical)",
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame["progressive"]:
                if "coef" not in frame:
                    _alloc_progressive(frame, max_pixels)
                frame["n_scans"] = frame.get("n_scans", 0) + 1
                if frame["n_scans"] > MAX_PROGRESSIVE_SCANS:
                    # each scan is a full Python walk of a block grid, and
                    # a ~20-byte EOBn-only scan is valid — without a cap,
                    # a crafted payload packs thousands of scans and the
                    # pixel budget no longer bounds CPU
                    raise ValueError(
                        f"more than {MAX_PROGRESSIVE_SCANS} progressive "
                        "scans — crafted or pathological stream",
                    )
                pos = _progressive_sos(
                    data, pos, seglen, frame, huff, restart_interval,
                )
                continue
            ns = body[0]
            if ns != len(frame["comps"]):
                # multi-scan (non-interleaved) baseline is legal but rare;
                # decoding the first scan alone would silently emit
                # Y-only features for a color image — refuse loudly
                raise ValueError(
                    f"non-interleaved scan ({ns} of {len(frame['comps'])} "
                    "components) not supported",
                )
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated SOS header")
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                matches = [c for c in frame["comps"] if c["id"] == cs]
                if not matches:
                    raise ValueError(f"scan selects unknown component {cs}")
                scan.append({**matches[0], "dc": tdta >> 4, "ac": tdta & 0x0F})
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan, qt, huff,
                restart_interval, max_pixels, frozenset(qt16),
            )
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and "coef" in frame:
        return _reconstruct_progressive(frame, qt, frozenset(qt16))
    raise ValueError("no SOS scan found")


# Generous ceiling on progressive scan count: a real encoder's script is
# ~10 scans (libjpeg's default); the theoretical spec maximum for a sane
# successive-approximation ladder over 3 components stays well under this.
MAX_PROGRESSIVE_SCANS = 120

# Featurizer-context decode budget: a corrupt few-hundred-byte header can
# otherwise declare 65500x65500 and trigger a ~100 GB block allocation
# before a single entropy bit is read. 64 MP covers every sane crawl image.
MAX_PIXELS = 64 * 1024 * 1024


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval,
                 max_pixels=None, qt16=frozenset()):
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    if h * w > budget:
        raise ValueError(
            f"declared raster {w}x{h} exceeds the {budget}-pixel "
            "decode budget",
        )
    prec = frame.get("prec", 8)
    max_dc, max_ac = (15, 14) if prec == 12 else (11, 10)
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in scan:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        _check_qt_precision(prec, c["tq"], qt16)
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise ValueError("missing Huffman table")
        c["blocks"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.float64,
        )
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                dc_tab, ac_tab = huff[(0, c["dc"])], huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(reader, dc_tab, ac_tab,
                                            max_dc, max_ac)
                        pred[c["id"]] += blk[0]
                        blk[0] = pred[c["id"]]
                        c["blocks"][my * c["v"] + by, mx * c["h"] + bx] = (
                            blk.reshape(8, 8)[...]
                        )
            mcu_count += 1
    return _reconstruct(scan, qt, hmax, vmax, h, w, prec)


def _check_qt_precision(prec: int, tq: int, qt16) -> None:
    """T.81 B.2.4.1: 16-bit (Pq=1) quantization tables shall not be used
    with 8-bit sample precision — an 8-bit frame referencing one is a
    corrupt/mislabeled stream and must refuse loudly, not dequantize
    with 65535-scale entries into a plausible-looking raster."""
    if prec == 8 and tq in qt16:
        raise ValueError(
            "16-bit quantization table on an 8-bit frame (T.81 forbids "
            "Pq=1 at 8-bit precision)",
        )


def _reconstruct(comps, qt, hmax, vmax, h, w, prec: int = 8) -> np.ndarray:
    """Dequantize + IDCT + upsample + color-convert per-component natural
    (nby, nbx, 8, 8) coefficient blocks — the tail shared by the baseline
    single-scan path and the progressive multi-scan accumulator. 12-bit
    samples reconstruct at their native range (level shift 2048, clip to
    4095) and the OUTPUT rescales to the uint8 contract every consumer
    of this codec holds (feature extraction never needs >8-bit rasters)."""
    mid = float(1 << (prec - 1))
    maxv = float((1 << prec) - 1)
    planes = []
    for c in comps:
        blocks = c["blocks"] * qt[c["tq"]]  # dequantize (broadcast 8x8)
        # one vectorized IDCT over every block: D.T @ B @ D
        spatial = np.einsum("ij,mnjk,kl->mnil", _DCT.T, blocks, _DCT)
        nby, nbx = spatial.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.clip(np.round(plane + mid), 0, maxv)
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    def _to_u8(x: np.ndarray) -> np.ndarray:
        if prec > 8:
            x = np.round(x * (255.0 / maxv))
        return x.astype(np.uint8)

    if len(planes) == 1:
        return _to_u8(planes[0])[..., None]
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes[0], planes[1] - mid, planes[2] - mid
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return _to_u8(np.clip(np.round(rgb), 0, maxv))


# -------------------------------------------------------- progressive decode
#
# T.81 Annex G: the frame's quantized coefficients arrive over MULTIPLE
# scans — spectral selection (each scan carries one zigzag band [Ss, Se])
# crossed with successive approximation (the first scan of a band carries
# the coefficients' high bits, value >> Al; each refinement scan appends
# one bit at position Al = Ah - 1). DC bands may be interleaved across
# components; AC bands are always single-component and walk that
# component's OWN ceil(dim/8) block grid, not the MCU-padded one.
# Coefficients accumulate zigzag-ordered in int32 until EOI, then one
# shared _reconstruct pass dequantizes and inverts.

def _alloc_progressive(frame, max_pixels) -> None:
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")
    budget = MAX_PIXELS if max_pixels is None else max_pixels
    if h * w > budget:
        raise ValueError(
            f"declared raster {w}x{h} exceeds the {budget}-pixel "
            "decode budget",
        )
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = -(-w // (8 * hmax))
    frame["mcuy"] = -(-h // (8 * vmax))
    frame["coef"] = {}
    for c in frame["comps"]:
        # MCU-padded grid (interleaved DC scans cover padding blocks);
        # non-interleaved scans address only the top-left bh x bw region
        c["coef"] = np.zeros(
            (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
            dtype=np.int32,
        )
        comp_w = -(-(w * c["h"]) // hmax)
        comp_h = -(-(h * c["v"]) // vmax)
        c["bw"] = -(-comp_w // 8)
        c["bh"] = -(-comp_h // 8)
        frame["coef"][c["id"]] = c


def _progressive_sos(data, pos, seglen, frame, huff, restart_interval) -> int:
    """Decode one progressive scan; returns the offset of the next marker
    after the entropy-coded data."""
    body = data[pos + 4 : pos + 2 + seglen]
    ns = body[0]
    if len(body) < 4 + 2 * ns:
        raise ValueError("truncated SOS header")
    scomps = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        if cs not in frame["coef"]:
            raise ValueError(f"scan selects unknown component {cs}")
        scomps.append((frame["coef"][cs], tdta >> 4, tdta & 0x0F))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if al > 13 or (ah and ah != al + 1):
        raise ValueError(f"invalid successive approximation Ah={ah} Al={al}")
    reader = _BitReader(data, pos + 2 + seglen)
    if ss == 0:
        if se != 0:
            raise ValueError(
                "progressive scan mixes DC and AC coefficients (Ss=0 "
                f"with Se={se})",
            )
        _prog_dc_scan(reader, scomps, frame, ah, al, restart_interval, huff)
    else:
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError(f"invalid spectral band [{ss}, {se}]")
        comp, _, ac_id = scomps[0]
        if (1, ac_id) not in huff:
            raise ValueError("missing Huffman table")
        _prog_ac_scan(reader, comp, huff[(1, ac_id)], ss, se, ah, al,
                      restart_interval)
    # advance to the next marker (skipping any stray RSTn)
    p = reader.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def _prog_dc_scan(reader, scomps, frame, ah, al, ri, huff) -> None:
    if ah == 0:
        for _, dc_id, _unused in scomps:
            if (0, dc_id) not in huff:
                raise ValueError("missing Huffman table")
    pred = {c["id"]: 0 for c, _, _ in scomps}
    mcu_count = 0

    def _one(c, dc_id, by, bx):
        blk = c["coef"][by, bx]
        if ah == 0:
            t = _dc_category(reader, huff[(0, dc_id)])
            pred[c["id"]] += _extend(reader.receive(t), t)
            blk[0] = pred[c["id"]] << al
        elif reader.read_bit():
            blk[0] = int(blk[0]) | (1 << al)

    if len(scomps) > 1:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if ri and mcu_count and mcu_count % ri == 0:
                    reader.sync_restart()
                    pred = {c["id"]: 0 for c, _, _ in scomps}
                for c, dc_id, _unused in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _one(c, dc_id, my * c["v"] + by, mx * c["h"] + bx)
                mcu_count += 1
    else:
        # single-component DC scan: the MCU is one data unit over the
        # component's own block grid
        c, dc_id, _unused = scomps[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                if ri and mcu_count and mcu_count % ri == 0:
                    reader.sync_restart()
                    pred = {c["id"]: 0}
                _one(c, dc_id, by, bx)
                mcu_count += 1


def _prog_ac_scan(reader, c, ac_tab, ss, se, ah, al, ri) -> None:
    eobrun = 0
    mcu_count = 0
    decode_one = _prog_ac_refine if ah else _prog_ac_first
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            if ri and mcu_count and mcu_count % ri == 0:
                reader.sync_restart()
                eobrun = 0
            eobrun = decode_one(
                reader, c["coef"][by, bx], ac_tab, ss, se, al, eobrun,
            )
            mcu_count += 1


def _prog_ac_first(reader, blk, ac_tab, ss, se, al, eobrun) -> int:
    """First scan of an AC band (T.81 G.2.2): baseline run/size coding of
    value >> Al, plus EOBn codes carrying a run of all-zero-band blocks."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) + reader.receive(r) - 1  # EOBn
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of range")
        if s > _MAX_AC_CATEGORY:
            raise ValueError(f"AC magnitude category {s} out of range")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, blk, ac_tab, ss, se, al, eobrun) -> int:
    """Refinement scan of an AC band (T.81 G.1.2.3 decode): newly
    significant coefficients arrive as run/1 codes whose zero-run counts
    only ZERO-HISTORY positions; every already-significant coefficient
    passed over reads one correction bit appending magnitude bit Al."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + reader.receive(r)
                    break
                val = 0  # ZRL: sixteen zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "refinement scan carries a multi-bit coefficient",
                    )
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and not (v & p1):
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bit() and not (v & p1):
                blk[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, qt, qt16=frozenset()) -> np.ndarray:
    comps = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        _check_qt_precision(frame.get("prec", 8), c["tq"], qt16)
        zz = c["coef"]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        comps.append({**c, "blocks": nat.reshape(*zz.shape[:2], 8, 8)
                      .astype(np.float64)})
    return _reconstruct(comps, qt, frame["hmax"], frame["vmax"],
                        frame["h"], frame["w"], frame.get("prec", 8))



# T.81 tables F.1/F.2: the DC difference category is at most 11 for
# 8-bit precision (15 for 12-bit); AC at most 10 (14). The caps exist
# because a corrupt Huffman table can map a code to any byte, and
# receive(200) would build a ~2^200 Python int whose int32 store raises
# OverflowError — an exception class the featurizer's degrade tuple
# rightly does not catch. They are PRECISION-KEYED: the progressive
# paths (8-bit only — 12-bit progressive is refused) keep the tight
# 8-bit constants, because the accumulate-then-shift DC store
# (pred << Al into int32 coefficients) overflows within a few blocks at
# category 15; only the sequential path widens to the 12-bit maxima,
# and only for an actual 12-bit frame.
_MAX_DC_CATEGORY = 11
_MAX_AC_CATEGORY = 10


def _dc_category(reader, dc_tab, max_dc: int = _MAX_DC_CATEGORY) -> int:
    t = _decode_symbol(reader, dc_tab)
    if t > max_dc:
        raise ValueError(f"DC difference category {t} out of range")
    return t


def _decode_block(reader, dc_tab, ac_tab,
                  max_dc: int = _MAX_DC_CATEGORY,
                  max_ac: int = _MAX_AC_CATEGORY) -> np.ndarray:
    blk = np.zeros(64, dtype=np.float64)
    t = _dc_category(reader, dc_tab, max_dc)
    blk[0] = _extend(reader.receive(t), t)
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        if s > max_ac:
            raise ValueError(f"AC magnitude category {s} out of range")
        blk[ZIGZAG[k]] = _extend(reader.receive(s), s)
        k += 1
    return blk


# ------------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # drop drained bytes — see _BitReader._fill's O(N^2) note
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_tables(bits, values) -> dict:
    """symbol -> (code, length) per Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a coefficient value."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _quantized_zigzag_block(blk, qtab, mid: float = 128.0) -> np.ndarray:
    """Forward DCT + quantize + zigzag for ONE block — the single
    quantization path shared by the baseline and progressive encoders.
    It must be shared: a whole-plane einsum sums in a different order
    than per-block matmuls, and coefficients landing on exact .5
    quantization ties (common for integer inputs) then round apart,
    breaking the byte-exact progressive/baseline parity the tests pin.
    ``mid`` is the level shift (2^(P-1): 128 for 8-bit, 2048 for
    12-bit)."""
    coef = _DCT @ (blk - mid) @ _DCT.T
    q = np.round(coef / qtab).astype(np.int64)
    return q.reshape(64)[ZIGZAG]  # natural order -> zigzag scan


def _encode_block(writer, blk, qtab, dc_tab, ac_tab, pred: int,
                  mid: float = 128.0) -> int:
    zz = _quantized_zigzag_block(blk, qtab, mid)
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    writer.write(*dc_tab[t])
    if t:
        writer.write(code, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_tab[0xF0])  # ZRL
            run -= 16
        t, code = _magnitude(v)
        writer.write(*ac_tab[(run << 4) | t])
        writer.write(code, t)
        run = 0
    if last_nz < 63:
        writer.write(*ac_tab[0x00])  # EOB
    return int(zz[0])


def _prep_encode(img, quality, subsampling, precision: int = 8):
    """Shared encoder front half: color-convert, subsample, MCU-pad, pick
    quantization tables. Returns (h, w, nc, comps, qts, hmax, vmax,
    mcux, mcuy) with per-component padded planes and table assignments.
    ``precision=12`` takes uint16 samples in [0, 4095] (chroma centers
    at 2048)."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12:
        # range-check BEFORE the cast: uint16 wraps 65536→0 and negative
        # multiples silently into range, defeating the guard. Phrased as
        # all-in-range so NaN (which fails BOTH < 0 and > 4095) refuses
        # instead of falling through to an undefined NaN→uint16 cast.
        arr = np.asarray(img)
        if arr.size and not bool(((arr >= 0) & (arr <= 4095)).all()):
            raise ValueError("12-bit samples must lie in [0, 4095]")
        img = arr.astype(np.uint16)
    else:
        img = np.asarray(img, dtype=np.uint8)
    mid = float(1 << (precision - 1))
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError(f"unsupported channel count {nc}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + mid,
            0.5 * r - 0.418688 * g - 0.081312 * b + mid,
        ]
    else:
        planes = [f[..., 0]]
    qts = [_scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)]

    sub = subsampling == "420" and nc == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    hmax = max(s[0] for s in samp[:nc])
    vmax = max(s[1] for s in samp[:nc])
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comps = []
    for ci in range(nc):
        plane = planes[ci]
        if sub and ci > 0:
            # average 2x2 (pad odd dims by edge replication first)
            pe = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
            plane = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean((1, 3))
        ch, cv = samp[ci]
        want_h, want_w = mcuy * cv * 8, mcux * ch * 8
        plane = np.pad(
            plane,
            ((0, want_h - plane.shape[0]), (0, want_w - plane.shape[1])),
            mode="edge",
        )
        comps.append({
            "plane": plane, "h": ch, "v": cv, "tq": min(ci, 1),
            "dc": 0x00 if ci == 0 else 0x01, "ac": 0x10 if ci == 0 else 0x11,
            "pred": 0,
        })
    return h, w, nc, comps, qts, hmax, vmax, mcux, mcuy


# Full-range flat Huffman tables for 12-bit encoding: Annex K's typical
# tables stop at DC category 11 / AC category 10, but 12-bit coefficients
# reach 15 / 14. All DC categories at 5 bits (Kraft 16/32), every AC
# run/size plus EOB and ZRL at 8 bits (Kraft 226/256).
HT_DC_EXT = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_EXT_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]
HT_AC_EXT = ([0] * 7 + [len(_EXT_AC_SYMS)] + [0] * 8, _EXT_AC_SYMS)


def encode_image_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) / (h, w, 1) gray uint8 array as
    a baseline JPEG with Annex K Huffman tables — the fixture/round-trip
    half of :func:`decode_image_jpeg`. ``subsampling``: "444" (one block
    per component per MCU) or "420" (2x2 luma blocks per MCU, chroma
    averaged 2x2 — the dominant web-JPEG layout, and the decoder path
    worth exercising). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (predictor resets, the other real-corpus
    decoder path). ``precision=12`` takes uint16 samples ≤ 4095 and
    emits the EXTENDED sequential form (SOF1, 16-bit DQT entries,
    full-range flat Huffman tables) — the spec-built fixture for the
    decoder's 12-bit path."""
    h, w, nc, comps, qts, hmax, vmax, mcux, mcuy = _prep_encode(
        img, quality, subsampling, precision,
    )
    mid = float(1 << (precision - 1))

    out = bytearray(b"\xff\xd8")  # SOI
    for tq in range(min(nc, 2)):
        zz = qts[tq].reshape(64)[ZIGZAG]
        if precision == 12:  # Pq=1: 16-bit table entries
            out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10 | tq])
            out += zz.astype(">u2").tobytes()
        else:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
            out += zz.astype(np.uint8).tobytes()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = 0xC1 if precision == 12 else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc,
    )
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    if precision == 12:
        hts = [(0x00, HT_DC_EXT), (0x10, HT_AC_EXT)]
        if nc == 3:
            hts += [(0x01, HT_DC_EXT), (0x11, HT_AC_EXT)]
    else:
        hts = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
        if nc == 3:
            hts += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    enc_tabs = {}
    for tcth, (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tcth]) + bytes(bits) + bytes(values)
        enc_tabs[tcth] = _encode_tables(bits, values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["dc"] << 4) | (c["ac"] & 0x0F)])
    out += bytes([0, 63, 0])

    writer = _BitWriter()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                writer = _BitWriter()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        c["pred"] = _encode_block(
                            writer, c["plane"][r0:r0 + 8, c0:c0 + 8],
                            qts[c["tq"]], enc_tabs[c["dc"]],
                            enc_tabs[c["ac"]], c["pred"], mid,
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

# -------------------------------------------------------- progressive encode
#
# Fixture-grade progressive encoder: a libjpeg-style scan script
# (interleaved DC first scan at Al=1 + DC refinement; per-component AC
# spectral bands [1,5] and [6,63] first-coded at Al=2, then two full-band
# refinement passes at Al=1 and Al=0) with genuine cross-block EOB runs
# and buffered correction bits, so every decoder path in Annex G gets
# exercised. Compression is not the point: the AC scans use a flat custom
# Huffman table covering EVERY symbol progressive coding can emit (Annex
# K's AC tables lack the EOBn>0 codes), all at 8 bits.

_PROG_DC_HT = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_PROG_AC_SYMS = (
    [n << 4 for n in range(15)]            # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_HT = (
    [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0],
    list(_PROG_AC_SYMS),
)


class _ProgACState:
    """Cross-block EOB-run + buffered-correction-bit accumulator (the
    encoder dual of the decoder's persistent ``eobrun``)."""

    def __init__(self, writer, ac_tab):
        self.writer = writer
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.writer.write(*self.ac_tab[n << 4])
            if n:
                self.writer.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.bits:
            self.writer.write(b, 1)
        self.bits = []

    def bump_eob(self, correction_bits) -> None:
        self.eobrun += 1
        self.bits.extend(correction_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _enc_ac_first_block(state, zz, ss, se, al) -> None:
    band = [int(v) for v in zz[ss : se + 1]]
    mags = [(abs(v) >> al) for v in band]
    if not any(mags):
        state.bump_eob(())
        return
    state.flush_eobrun()
    last = max(i for i, m in enumerate(mags) if m)
    r = 0
    for i in range(last + 1):
        m = mags[i]
        if m == 0:
            r += 1
            continue
        while r > 15:
            state.writer.write(*state.ac_tab[0xF0])
            r -= 16
        s = m.bit_length()
        state.writer.write(*state.ac_tab[(r << 4) | s])
        code = m if band[i] > 0 else (1 << s) - 1 - m
        state.writer.write(code, s)
        r = 0
    if last < se - ss:
        state.bump_eob(())


def _enc_ac_refine_block(state, zz, ss, se, al) -> None:
    band = [int(v) for v in zz[ss : se + 1]]
    mags = [(abs(v) >> al) for v in band]
    newly = [i for i, m in enumerate(mags) if m == 1]
    eob = (max(newly) + 1) if newly else 0  # first index past the last new bit
    r = 0
    pending: list[int] = []  # correction bits awaiting the next symbol
    for i in range(len(band)):
        m = mags[i]
        if m == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            state.flush_eobrun()
            state.writer.write(*state.ac_tab[0xF0])
            r -= 16
            for b in pending:
                state.writer.write(b, 1)
            pending = []
        if m > 1:  # already significant: one correction bit
            pending.append(m & 1)
            continue
        state.flush_eobrun()
        state.writer.write(*state.ac_tab[(r << 4) | 1])
        state.writer.write(1 if band[i] > 0 else 0, 1)
        for b in pending:
            state.writer.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        state.bump_eob(pending)


def encode_image_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode as a progressive (SOF2) JPEG carrying the SAME quantized
    coefficients as :func:`encode_image_jpeg` at equal ``quality`` and
    ``subsampling`` — so ``decode(progressive) == decode(baseline)``
    EXACTLY, which is what the parity tests pin. ``restart_interval`` > 0
    emits DRI once and RSTn markers every that many MCUs inside every
    scan (data units for non-interleaved scans), resetting DC predictors
    and EOB runs."""
    h, w, nc, comps, qts, hmax, vmax, mcux, mcuy = _prep_encode(
        img, quality, subsampling,
    )
    # quantized zigzag coefficients — per block through the SAME
    # _quantized_zigzag_block path as the baseline encoder (see its
    # docstring: a whole-plane einsum rounds .5 quantization ties
    # differently and breaks the byte-exact parity contract)
    for c in comps:
        plane = c["plane"]
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                zz[by, bx] = _quantized_zigzag_block(
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    qts[c["tq"]],
                )
        c["zz"] = zz
        comp_w = -(-(w * c["h"]) // hmax)
        comp_h = -(-(h * c["v"]) // vmax)
        c["bw"], c["bh"] = -(-comp_w // 8), -(-comp_h // 8)

    out = bytearray(b"\xff\xd8")
    for tq in range(min(nc, 2)):
        zzq = qts[tq].reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zzq.tobytes()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    enc_tabs = {}
    for tcth, (bits, values) in [(0x00, _PROG_DC_HT), (0x10, _PROG_AC_HT)]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tcth]) + bytes(bits) + bytes(values)
        enc_tabs[tcth] = _encode_tables(bits, values)
    dc_tab, ac_tab = enc_tabs[0x00], enc_tabs[0x10]

    def sos_header(scomps, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomps), len(scomps))
        for ci in scomps:
            hdr += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        return hdr + bytes([ss, se, (ah << 4) | al])

    rst_holder = [0]

    def restart(writer, flushers=()):
        for f in flushers:
            f()
        writer.flush()
        nonlocal_out = bytes(writer.out)
        writer.out = bytearray()
        writer.nbits = 0
        writer.acc = 0
        return nonlocal_out + bytes([0xFF, 0xD0 + rst_holder[0] % 8])

    # ---- scan 1: interleaved DC first, Al=1
    for dc_al, dc_ah in ((1, 0), (0, 1)):
        out += sos_header(list(range(nc)), 0, 0, dc_ah, dc_al)
        writer = _BitWriter()
        preds = [0] * nc
        mcu_count = 0
        rst_holder[0] = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    out += restart(writer)
                    rst_holder[0] += 1
                    preds = [0] * nc
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            v = int(c["zz"][my * c["v"] + by,
                                            mx * c["h"] + bx, 0])
                            if dc_ah == 0:
                                d = (v >> dc_al) - preds[ci]
                                preds[ci] = v >> dc_al
                                t, code = _magnitude(d)
                                writer.write(*dc_tab[t])
                                if t:
                                    writer.write(code, t)
                            else:
                                writer.write((v >> dc_al) & 1, 1)
                mcu_count += 1
        writer.flush()
        out += writer.out
        # ---- AC scans between the two DC scans (DC refine goes last)
        if dc_ah == 0:
            ac_scans = []
            for ci in range(nc):
                ac_scans += [(ci, 1, 5, 0, 2), (ci, 6, 63, 0, 2)]
            for ci in range(nc):
                ac_scans += [(ci, 1, 63, 2, 1)]
            for ci in range(nc):
                ac_scans += [(ci, 1, 63, 1, 0)]
            for ci, ss, se, ah, al in ac_scans:
                c = comps[ci]
                out += sos_header([ci], ss, se, ah, al)
                writer = _BitWriter()
                state = _ProgACState(writer, ac_tab)
                enc = _enc_ac_refine_block if ah else _enc_ac_first_block
                mcu_count = 0
                rst_holder[0] = 0
                for by in range(c["bh"]):
                    for bx in range(c["bw"]):
                        if restart_interval and mcu_count \
                                and mcu_count % restart_interval == 0:
                            out += restart(writer, (state.flush_eobrun,))
                            rst_holder[0] += 1
                        enc(state, c["zz"][by, bx], ss, se, al)
                        mcu_count += 1
                state.flush_eobrun()
                writer.flush()
                out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
