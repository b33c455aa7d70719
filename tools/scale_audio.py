"""Heavy-payload audio-window measurement (SCALE.md's audio row).

The sf0.1 bench extra windows 16-sample md5 fixtures — a correctness
workload, not a media-sized one. This script measures
sample_audio_windows against payloads shaped like real audio corpora:

- hour-long 44.1 kHz mono 16-bit PCM WAV (~317 MB each), 1 s windows —
  the workload the PER-WINDOW normalization exists for: the int16
  samples stay a zero-copy view on the payload bytes and the float64
  copy is one window (~44k samples), never the 158M-sample file;
- hour-long 8 kHz G.711 mu-law WAV (~28.8 MB each, the telephony
  shape), 25 ms windows — the table-expansion decode path at scale;
- minute-long 44.1 kHz PCM segments (~5.3 MB each), same total audio
  as the hour-long workload — the CHUNKED shape: the hour-long run
  shows the 317 MB single binary cell is transport-bound (the Python
  kernel is ~1.3 s/payload; the rest is the JVM→Arrow copy of one
  giant cell), so a 100 TB corpus should store segmented payloads.

Payloads are written as real .wav files and read back through Spark's
binaryFile source (the corpus-ingest path), one distinct file per row
so nothing is amortized by caching. The PCM sample block tiles a
1-second random buffer; tiling changes nothing the decoder sees per
window and keeps file generation fast.

Usage: python tools/scale_audio.py [pcm_rows] [g711_rows]
Prints one line per workload: rows, windows, seconds, windows/s, and
audio-hours/s. Results print at the END (Spark's console progress bar
overwrites interleaved prints).
"""
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sed_binning_spark import get_spark  # noqa: E402
from sed_binning_spark.pipeline.multimodal import (  # noqa: E402
    _g711_compress,
    sample_audio_windows,
)


def _wav_header(tag: int, rate: int, bits: int, n_bytes: int) -> bytes:
    width = bits // 8
    fmt_body = struct.pack("<HHIIHH", tag, 1, rate, rate * width, width, bits)
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt_body) + n_bytes) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", n_bytes)
    )


def write_corpus(root: str, name: str, rows: int, tag: int, rate: int,
                 bits: int, raw: bytes) -> str:
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    hdr = _wav_header(tag, rate, bits, len(raw))
    for i in range(rows):
        with open(os.path.join(d, f"{i:04d}.wav"), "wb") as f:
            f.write(hdr)
            f.write(raw[: len(raw) - 2])
            f.write(struct.pack("<H", i))  # distinct tail per row
    return d


def run(spark, name, path, window_ms, rows, hours_per_row):
    df = spark.read.format("binaryFile").load(path).select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    t0 = time.time()
    # max_windows=None: the default 4096 cap would silently truncate the
    # hour-long G.711 workload (144k windows/payload) to ~3% and make
    # every throughput number here a lie
    n = sample_audio_windows(
        df, window_ms=window_ms, max_windows=None,
    ).count()
    dt = time.time() - t0
    return (f"{name}: rows={rows} windows={n} time={dt:.1f}s "
            f"windows/s={n / dt:.0f} audio-hours/s={rows * hours_per_row / dt:.1f}")


def main():
    pcm_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    g711_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(13)
    root = tempfile.mkdtemp(prefix="scale_audio_")

    # hour of 44.1 kHz int16: tile one random second 3600x (~317 MB)
    second = rng.integers(-32768, 32768, 44100).astype("<i2")
    pcm_raw = np.tile(second, 3600).tobytes()
    pcm_dir = write_corpus(root, "pcm16", pcm_rows, 1, 44100, 16, pcm_raw)

    # hour of 8 kHz mu-law: compand one random second, tile (~28.8 MB)
    g_second = _g711_compress(
        rng.integers(-32768, 32768, 8000).astype(np.int16), 7)
    g711_raw = np.tile(g_second, 3600).tobytes()
    g711_dir = write_corpus(root, "g711", g711_rows, 7, 8000, 8, g711_raw)

    # the same total audio as the pcm16 workload, minute-long segments
    seg_rows = pcm_rows * 60
    seg_raw = np.tile(second, 60).tobytes()
    seg_dir = write_corpus(root, "pcm_seg", seg_rows, 1, 44100, 16, seg_raw)

    print(f"payload sizes: pcm16={len(pcm_raw)} g711={len(g711_raw)} "
          f"(headers +44)", flush=True)
    try:
        results = [
            run(spark, "pcm16_1h_44k1_win1000ms", pcm_dir, 1000,
                pcm_rows, 1.0),
            run(spark, "g711u_1h_8k_win25ms", g711_dir, 25, g711_rows, 1.0),
            run(spark, "pcm16_1min_seg_win1000ms", seg_dir, 1000,
                seg_rows, 1.0 / 60.0),
        ]
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    print("\n" + "\n".join(results), flush=True)


if __name__ == "__main__":
    main()
