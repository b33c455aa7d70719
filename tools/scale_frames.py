"""Heavy-payload frame-sampling measurement (SCALE.md's media row).

The sf0.1 bench extra decodes text-synthesized 3-frame 24x1 GIFs — a
correctness workload, not a media-sized one. This script measures
sample_frames against payloads shaped like a real multimodal corpus:

- 100-frame 32x32 animated GIFs (per-frame compositing: disposal,
  transparency, LZW) — the per-payload canvas-copy cost max_frames
  exists to bound;
- 50-frame 64x64 Motion-JPEG streams (structural split + the
  pure-Python baseline JPEG decode per frame);
- one 50-frame avc1 MP4 per row through the metadata-only timeline
  (table walk only — the 100-TB shape for real video codecs).

Usage: python tools/scale_frames.py [gif_rows] [mjpeg_rows] [mp4_rows]
Prints one line per workload: rows, frames decoded, seconds, rows/s,
frames/s. Distinct payloads per row (a doc-id byte is spliced in) so
nothing is amortized by caching.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sed_binning_spark import get_spark  # noqa: E402
from sed_binning_spark.pipeline.jpeg import encode_image_jpeg  # noqa: E402
from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg  # noqa: E402
from sed_binning_spark.pipeline.multimodal import (  # noqa: E402
    encode_gif_animation,
    sample_frames,
)


def build_payloads():
    rng = np.random.default_rng(11)
    # 100-frame GIF: 16-color noise quantized per frame (keeps the local
    # color table legal while defeating trivial LZW runs)
    gif_frames = [
        dict(img=np.repeat(
            rng.integers(0, 16, (32, 32, 1)).astype(np.uint8) * 16, 3, axis=2,
        ), delay_ms=30, disposal=1 if f % 3 else 0)
        for f in range(100)
    ]
    gif = encode_gif_animation(gif_frames, screen_size=(32, 32))
    jpegs = [
        encode_image_jpeg(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
        for _ in range(50)
    ]
    mjpeg = b"".join(jpegs)
    mp4 = encode_mp4_mjpeg(
        [b"\x00" * 4000] * 50, [20] * 50, width=1920, height=1080,
        sample_type=b"avc1", sync_samples=list(range(1, 51, 10)),
    )
    from sed_binning_spark.pipeline.webm import encode_webm

    webm = encode_webm(
        [b"\x00" * 4000] * 50, [20 * f for f in range(50)],
        keyframes=[f % 10 == 0 for f in range(50)],
        width=1920, height=1080, default_duration_ms=20,
    )
    return gif, mjpeg, mp4, webm


def run(spark, name, blob, rows):
    # distinct payload per row: one trailing byte varies (all three
    # containers stop at their own terminator, so decode is unaffected
    # but no two rows carry identical bytes)
    df = spark.range(rows).select(
        F.col("id").alias("media_id"),
        F.concat(
            F.lit(blob),
            F.unhex(F.lpad(F.hex(F.col("id") % 256), 2, "0")),
        ).alias("payload"),
    )
    t0 = time.time()
    n = sample_frames(df).count()
    dt = time.time() - t0
    return (f"{name}: rows={rows} frames={n} time={dt:.1f}s "
            f"rows/s={rows / dt:.0f} frames/s={n / dt:.0f}")


def main():
    gif_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    mj_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    mp4_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    gif, mjpeg, mp4, webm = build_payloads()
    print(f"payload sizes: gif={len(gif)} mjpeg={len(mjpeg)} "
          f"mp4={len(mp4)} webm={len(webm)}",
          flush=True)
    results = [
        run(spark, "gif_100f_32x32", gif, gif_rows),
        run(spark, "mjpeg_50f_64x64", mjpeg, mj_rows),
        run(spark, "avc1_50f_meta", mp4, mp4_rows),
        run(spark, "webm_50f_meta", webm, mp4_rows),
    ]
    # all results at the END on their own lines: Spark's console progress
    # bar overwrites interleaved prints
    print("\n" + "\n".join(results), flush=True)


if __name__ == "__main__":
    main()
