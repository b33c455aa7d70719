"""Large-scale training-data pipeline operators (beyond reference parity).

These are first-class engine components for the 100 TB north star: every
operator is a Catalyst expression pipeline or an equi-join on a derived
bucket key — never an all-pairs product, never a driver-side loop over
event-scale data.

- :mod:`~sed_binning_spark.pipeline.dedup` — exact dedup (hash groupBy),
  MinHash + LSH banding, SimHash, n-gram Jaccard verification
- :mod:`~sed_binning_spark.pipeline.cluster` — candidate pairs ->
  connected components (hash-min label propagation) -> representative
  selection
- :mod:`~sed_binning_spark.pipeline.text` — token counting, text quality
  stats, stopword language-ID, document fingerprinting, PII audit +
  redaction (URL/email/IPv4/phone in the Java-regex/RE2 common dialect),
  duplicate-line repetition signal
- :mod:`~sed_binning_spark.pipeline.similarity` — brute-force cosine top-k
  (the correctness baseline), random-hyperplane LSH bucketing, IVF
  (trained coarse quantizer + probed lists), one-pass distributed
  PCA (moment reduction + driver eigh, optional whitening), product
  quantization (per-subspace codebooks, asymmetric-distance top-k) over
  `array<float>` embedding columns, and their production composition
  ``ivf_pq_topk`` (probe lists, score codes, one Python stage)
- :mod:`~sed_binning_spark.pipeline.multimodal` — binary media columns
  with pure-NumPy PPM/BMP/PNG/GIF/JPEG/WAV codecs behind ``mapInPandas``
  (plus a deterministic stub for formats without a bundled decoder),
  and video-style frame sampling: ``decode_gif_frames`` walks animated
  GIF timelines with real compositing and ``sample_frames`` emits one
  row per frame with container timing + canvas statistics (raw MJPEG
  and Motion-JPEG-in-MP4 via :mod:`~sed_binning_spark.pipeline.mp4`'s
  ISO BMFF demuxer ride the same seam)
- :mod:`~sed_binning_spark.pipeline.sample` — deterministic (hash-keyed)
  sampling, per-stratum corpus-mixing rates, leak-proof train/val/test
  split assignment — reproducible on any partition layout or engine
- :mod:`~sed_binning_spark.pipeline.lm` — corpus n-gram language-model
  scoring (CCNet-style quality proxy): gram counts + per-document mean
  log-probability from exact integer micro-nat sums, and CCNet's
  head/middle/tail perplexity bucketing (quantile thresholds fit
  driver-side, assignment as one stream-safe CASE expression)
- :mod:`~sed_binning_spark.pipeline.filters` — C4-style content gates:
  key blocklists (exact or domain-suffix, broadcast anti-join) and
  badword scoring/filtering (codegen literal list or explode+join)
- :mod:`~sed_binning_spark.pipeline.decontam` — GPT-3-style benchmark
  decontamination (distinct md5 word-n-gram overlap, broadcast bench)
- :mod:`~sed_binning_spark.pipeline.pack` — fixed-token-budget sequence
  packing: hash-sharded concat-and-chunk manifest, fill accounting, and
  slice-before-shuffle sequence assembly
- :mod:`~sed_binning_spark.pipeline.report` — one-pass corpus telemetry
  (counts/totals/percentiles per stratum; t-digest or exact)
- :mod:`~sed_binning_spark.pipeline.warc` — crawl ingestion: WARC/1.0
  archives (per-record gzip members, chunked/content-encoded HTTP) to
  the documents table, one streaming task per file
- :mod:`~sed_binning_spark.pipeline.url` — URL canonicalization
  (tracking-param strip, default-port/fragment drop, sorted query) and
  URL-keyed dedup, all ``try_parse_url`` expressions
- :mod:`~sed_binning_spark.pipeline.classifier` — trainable quality
  classifier (CCNet pattern): driver-fit logistic regression over the
  Gopher statistics, applied as one codegen expression
"""

from sed_binning_spark.pipeline.cluster import (
    connected_components,
    embedding_dedup,
    near_dedup_keep_rows,
)
from sed_binning_spark.pipeline.dedup import (
    apply_substring_winners,
    substring_winner_manifest,
    substring_winners,
    dedup_segments,
    dedup_substrings,
    exact_dedup,
    exact_dedup_keep_rows,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    segment_array,
    simhash,
)
from sed_binning_spark.pipeline.similarity import (
    cosine_similarity_expr,
    cosine_topk,
    lsh_bucket_pairs,
)
from sed_binning_spark.pipeline.bpe import bpe_encode, bpe_train, bpe_vocab
from sed_binning_spark.pipeline.mp4 import (
    encode_mp4_fragmented,
    encode_mp4_mjpeg,
    parse_mp4_samples,
    parse_mp4_timeline,
)
from sed_binning_spark.pipeline.webm import encode_webm, parse_webm_timeline
from sed_binning_spark.pipeline.ogg import (
    encode_ogg_opus,
    parse_ogg_opus_timeline,
)
from sed_binning_spark.pipeline.mp3 import (
    encode_mp3_frames,
    parse_mp3_timeline,
)
from sed_binning_spark.pipeline.aac import (
    encode_adts_frames,
    parse_adts_timeline,
)
from sed_binning_spark.pipeline.flac import (
    decode_audio_flac,
    decode_flac,
    encode_flac,
)
from sed_binning_spark.pipeline.tags import (
    extract_media_tags,
    parse_media_tags,
)
from sed_binning_spark.pipeline.subtitles import (
    extract_subtitle_cues,
    parse_subtitles,
)
from sed_binning_spark.pipeline.manifest import (
    manifest_one,
    media_manifest,
)
from sed_binning_spark.pipeline.imagehash import (
    dhash_pairs,
    image_dhash,
)
from sed_binning_spark.pipeline.multimodal import (
    decode_gif_frames,
    encode_gif_animation,
    extract_features,
    frame_sample_plan,
    resize_images,
    sample_audio_windows,
    transcode_audio,
    sample_frames,
    split_mjpeg_frames,
    synthesize_wav_media_from_text,
    synthesize_animated_gif_media_from_text,
    synthesize_ppm_media_from_text,
)
from sed_binning_spark.pipeline.sample import (
    assign_splits,
    deterministic_sample,
    stratified_sample,
    temperature_rates,
)
from sed_binning_spark.pipeline.pack import pack_chunks, pack_sequences, pack_stats
from sed_binning_spark.pipeline.report import corpus_report
from sed_binning_spark.pipeline.decontam import (
    contamination_pairs,
    contamination_stats,
    decontaminate,
)
from sed_binning_spark.pipeline.filters import (
    badword_stats,
    filter_badwords,
    filter_by_blocklist,
)
from sed_binning_spark.pipeline.lm import (
    assign_perplexity_buckets,
    perplexity_bucket_thresholds,
    unigram_logprob,
    unigram_logprob_rowwise,
    unigram_model,
)
from sed_binning_spark.pipeline.similarity import (
    ivf_assign,
    ivf_pq_topk,
    ivf_topk,
    ivf_train_centroids,
    pca_apply,
    pca_fit,
    pq_encode,
    pq_topk,
    pq_train,
)
from sed_binning_spark.pipeline.classifier import (
    quality_classifier_apply,
    quality_classifier_fit,
)
from sed_binning_spark.pipeline.url import (
    canonical_url_expr,
    canonicalize_urls,
    dedup_by_url,
)
from sed_binning_spark.pipeline.warc import (
    read_warc,
    warc_to_documents,
    write_warc,
)
from sed_binning_spark.pipeline.text import (
    c4_line_filter,
    document_fingerprint,
    dup_line_stats,
    dup_segment_stats,
    language_id,
    pii_stats,
    quality_score,
    repetition_stats,
    scrub_pii,
    strip_html,
    text_stats,
)

__all__ = [
    "exact_dedup",
    "exact_dedup_keep_rows",
    "dedup_segments",
    "dedup_substrings",
    "apply_substring_winners",
    "bpe_train",
    "bpe_encode",
    "bpe_vocab",
    "substring_winner_manifest",
    "substring_winners",
    "segment_array",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard",
    "connected_components",
    "embedding_dedup",
    "near_dedup_keep_rows",
    "cosine_topk",
    "cosine_similarity_expr",
    "lsh_bucket_pairs",
    "ivf_assign",
    "ivf_train_centroids",
    "ivf_topk",
    "ivf_pq_topk",
    "pca_fit",
    "pca_apply",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "text_stats",
    "quality_score",
    "c4_line_filter",
    "language_id",
    "document_fingerprint",
    "pii_stats",
    "scrub_pii",
    "strip_html",
    "dup_line_stats",
    "dup_segment_stats",
    "repetition_stats",
    "deterministic_sample",
    "stratified_sample",
    "temperature_rates",
    "assign_splits",
    "pack_chunks",
    "pack_sequences",
    "pack_stats",
    "contamination_pairs",
    "contamination_stats",
    "decontaminate",
    "unigram_model",
    "unigram_logprob",
    "unigram_logprob_rowwise",
    "perplexity_bucket_thresholds",
    "assign_perplexity_buckets",
    "badword_stats",
    "filter_badwords",
    "filter_by_blocklist",
    "read_warc",
    "warc_to_documents",
    "write_warc",
    "canonical_url_expr",
    "canonicalize_urls",
    "dedup_by_url",
    "quality_classifier_fit",
    "quality_classifier_apply",
    "corpus_report",
    "extract_features",
    "resize_images",
    "frame_sample_plan",
    "sample_frames",
    "sample_audio_windows",
    "transcode_audio",
    "split_mjpeg_frames",
    "synthesize_wav_media_from_text",
    "parse_mp4_samples",
    "parse_mp4_timeline",
    "encode_mp4_mjpeg",
    "encode_mp4_fragmented",
    "parse_webm_timeline",
    "encode_webm",
    "parse_ogg_opus_timeline",
    "encode_ogg_opus",
    "parse_mp3_timeline",
    "encode_mp3_frames",
    "parse_adts_timeline",
    "encode_adts_frames",
    "decode_audio_flac",
    "decode_flac",
    "encode_flac",
    "extract_media_tags",
    "parse_media_tags",
    "extract_subtitle_cues",
    "parse_subtitles",
    "manifest_one",
    "media_manifest",
    "dhash_pairs",
    "image_dhash",
    "decode_gif_frames",
    "encode_gif_animation",
    "synthesize_animated_gif_media_from_text",
    "synthesize_ppm_media_from_text",
]
