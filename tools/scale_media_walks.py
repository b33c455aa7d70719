"""Media-scale measurement for the round-14 additions (SCALE.md's
media tables): the Ogg Opus and MP3 timeline WALKS over hour-long
payloads, and FLAC DECODE over minute-long speech-shaped segments.

- Ogg Opus: one hour of 20 ms packets = 180,000 packets (~7.5 MB at a
  16 kbps-ish packet size). The walk derives per-packet timing from
  the TOC byte; the page CRC now runs via numpy byte-reflection +
  zlib (round 14) instead of a per-byte Python loop, so this measures
  whether Ogg's timeline really joined the O(table-bytes) family.
- MP3: one hour of 96 kbps 32 kHz MPEG-1 Layer III = 100,000 frames
  (43.2 MB); the header walk skips payload bytes by frame-length
  arithmetic.
- FLAC: minute-long 16 kHz mono segments (the pre-segmented speech
  shape SCALE.md's guidance prescribes), decoded for REAL through
  sample_audio_windows — predictors, Rice, CRCs, md5.
- Tags: ID3v2 + trailing ID3v1 on the same hour-long MP3s through
  extract_media_tags — per-payload work must be O(tag bytes),
  independent of the ~43 MB media body between the tag blocks.
- Subtitle sidecars: the SAME tiny .srt payloads read two ways — as
  thousands of individual files through the binaryFile source (the
  naive crawl layout: listing-bound) and as one parquet binary
  column (the packed layout this repo's corpus uses) — quantifying
  why 100 TB of sidecar files must be packed before the cluster
  ever sees them.

Payloads are written as real files and read through Spark's
binaryFile source (the corpus-ingest path), one distinct file per
row. Results print at the END (Spark's progress bar overwrites
interleaved prints).

Usage: python tools/scale_media_walks.py [ogg_rows] [mp3_rows] [flac_rows]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sed_binning_spark import get_spark  # noqa: E402
from sed_binning_spark.pipeline.flac import encode_flac  # noqa: E402
from sed_binning_spark.pipeline.mp3 import encode_mp3_frames  # noqa: E402
from sed_binning_spark.pipeline.multimodal import (  # noqa: E402
    sample_audio_windows,
    sample_frames,
)
from sed_binning_spark.pipeline.ogg import encode_ogg_opus  # noqa: E402


def _write(root: str, name: str, blobs: list[bytes], ext: str) -> str:
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    for i, b in enumerate(blobs):
        with open(os.path.join(d, f"{i:04d}.{ext}"), "wb") as f:
            f.write(b)
    return d


def _load(spark, path):
    return spark.read.format("binaryFile").load(path).select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )


def main():
    ogg_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mp3_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    flac_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(14)
    root = tempfile.mkdtemp(prefix="scale_walks_")
    results = []
    try:
        # --- Ogg Opus: 1 h of 20 ms SILK-WB packets, ~40 B payloads
        pkt_body = rng.integers(0, 256, 39, dtype=np.uint8).tobytes()
        packets = [bytes([9 << 3]) + pkt_body] * 180_000
        oggs = [encode_ogg_opus(packets, sample_rate=16000,
                                packets_per_page=50, serial=i + 1)
                for i in range(ogg_rows)]
        d = _write(root, "ogg", oggs, "ogg")
        t0 = time.time()
        n = sample_frames(_load(spark, d), media="audio",
                          max_frames=None).count()
        dt = time.time() - t0
        results.append(
            f"ogg_opus_1h_walk: rows={ogg_rows} "
            f"payload={len(oggs[0])/1e6:.1f}MB timeline_rows={n} "
            f"time={dt:.1f}s rows/s={n/dt:.0f} "
            f"audio-hours/s={ogg_rows/dt:.1f}")

        # --- MP3: 1 h of 96 kbps 32 kHz frames (432 B, 36 ms each)
        mp3s = [encode_mp3_frames(100_000, bitrate_kbps=96,
                                  sample_rate=32000, fill=i)
                for i in range(mp3_rows)]
        d = _write(root, "mp3", mp3s, "mp3")
        t0 = time.time()
        n = sample_frames(_load(spark, d), media="audio",
                          max_frames=None).count()
        dt = time.time() - t0
        results.append(
            f"mp3_1h_walk: rows={mp3_rows} "
            f"payload={len(mp3s[0])/1e6:.1f}MB timeline_rows={n} "
            f"time={dt:.1f}s rows/s={n/dt:.0f} "
            f"audio-hours/s={mp3_rows/dt:.1f}")

        # --- FLAC: 1 min of 16 kHz mono speech-shaped audio per row
        t = np.arange(60 * 16000)
        gen0 = time.time()
        flacs = [encode_flac(
            np.round(6000 * np.sin((t + 997 * i) / 23)
                     + 1500 * np.sin((t + 31 * i) / 5)).astype(np.int64),
            16000, subframe="fixed", order=2, block_size=4096,
            partition_order=2,
        ) for i in range(flac_rows)]
        gen_dt = time.time() - gen0
        d = _write(root, "flac", flacs, "flac")
        t0 = time.time()
        n = sample_audio_windows(_load(spark, d), window_ms=1000,
                                 max_windows=None).count()
        dt = time.time() - t0
        mins = flac_rows
        results.append(
            f"flac_1min_decode: rows={flac_rows} "
            f"payload={len(flacs[0])/1e6:.1f}MB windows={n} "
            f"time={dt:.1f}s windows/s={n/dt:.0f} "
            f"audio-hours/s={mins/60/dt:.2f} "
            f"(fixture encode: {gen_dt:.1f}s total)")

        # --- tags: ID3v2 head + ID3v1 tail on the hour-long MP3s
        from sed_binning_spark.pipeline.tags import (
            encode_id3v1,
            encode_id3v2,
            extract_media_tags,
        )

        tagged = [
            encode_id3v2([
                ("TIT2", f"Title {i}"), ("TPE1", "An Artist"),
                ("TALB", "An Album"), ("COMM:c", "hour-long comment"),
            ], version=3) + m + encode_id3v1("Old Title", "Old Artist")
            for i, m in enumerate(mp3s)
        ]
        d = _write(root, "tagged", tagged, "mp3")
        t0 = time.time()
        n = extract_media_tags(_load(spark, d)).count()
        dt = time.time() - t0
        gb = sum(len(b) for b in tagged) / 1e9
        results.append(
            f"id3_tag_mine_1h_mp3: rows={mp3_rows} "
            f"payload={len(tagged[0])/1e6:.1f}MB tag_rows={n} "
            f"time={dt:.1f}s media-GB/s={gb/dt:.2f}")

        # --- subtitle sidecars: files-vs-packed at 20k tiny payloads
        from sed_binning_spark.pipeline.subtitles import (
            encode_srt,
            extract_subtitle_cues,
        )

        n_files = 20_000
        srts = [
            encode_srt([
                (0, 1500, f"cue one of file {i}"),
                (2000, 4000, f"cue two of file {i}"),
            ])
            for i in range(n_files)
        ]
        d = _write(root, "srt", srts, "srt")
        t0 = time.time()
        n = extract_subtitle_cues(_load(spark, d)).count()
        dt_files = time.time() - t0
        import pandas as pd

        packed = os.path.join(root, "srt_packed.parquet")
        pd.DataFrame({
            "media_id": list(range(n_files)),
            "payload": [bytes(b) for b in srts],
        }).to_parquet(packed)
        t0 = time.time()
        n2 = extract_subtitle_cues(spark.read.parquet(packed)).count()
        dt_packed = time.time() - t0
        results.append(
            f"srt_sidecars_20k: files={n_files} cue_rows={n}/{n2} "
            f"binaryFile={dt_files:.1f}s packed_parquet={dt_packed:.1f}s "
            f"ratio={dt_files/dt_packed:.1f}x")

        # --- triage: media_manifest over the mixed corpus above —
        # hour-long tagged MP3s + hour-long Ogg + minute FLACs + the
        # 20k packed subtitle sidecars, one scan
        from sed_binning_spark.pipeline.manifest import media_manifest

        mixed = (
            _load(spark, os.path.join(root, "tagged"))
            .unionByName(_load(spark, os.path.join(root, "ogg")))
            .unionByName(_load(spark, os.path.join(root, "flac")))
            .unionByName(spark.read.parquet(packed))
        )
        t0 = time.time()
        trows = media_manifest(mixed).where("error IS NULL").count()
        dt = time.time() - t0
        total_gb = (sum(len(b) for b in tagged)
                    + sum(len(b) for b in oggs)
                    + sum(len(b) for b in flacs)
                    + sum(len(b) for b in srts)) / 1e9
        results.append(
            f"media_manifest_mixed: payloads={mp3_rows + ogg_rows + flac_rows + n_files} "
            f"clean_rows={trows} time={dt:.1f}s "
            f"media-GB/s={total_gb/dt:.2f}")
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    print("\n" + "\n".join(results), flush=True)


if __name__ == "__main__":
    main()
