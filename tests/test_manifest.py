"""Media triage (pipeline.manifest): every container family through
manifest_one, the keep-the-row error posture of the Spark operator,
and the contract fuzz that guards the batch. No counterpart in the
reference repo (photoemission binning, no media code)."""

from __future__ import annotations

import numpy as np
import pytest

from sed_binning_spark.pipeline import subtitles as S
from sed_binning_spark.pipeline import tags as T
from sed_binning_spark.pipeline.aac import encode_adts_frames
from sed_binning_spark.pipeline.flac import encode_flac
from sed_binning_spark.pipeline.jpeg import encode_image_jpeg
from sed_binning_spark.pipeline.manifest import manifest_one, media_manifest
from sed_binning_spark.pipeline.mp3 import encode_mp3_frames
from sed_binning_spark.pipeline.mp4 import encode_mp4_mjpeg
from sed_binning_spark.pipeline.multimodal import (
    encode_audio_wav,
    encode_image_gif,
    encode_image_png,
    encode_webp_header,
)
from sed_binning_spark.pipeline.ogg import encode_ogg_opus
from sed_binning_spark.pipeline.webm import encode_webm


def test_audio_containers_triage():
    wav = T.add_riff_info(
        encode_audio_wav(np.zeros((160, 1), np.int16), 8000),
        [(b"INAM", "N")],
    )
    got = manifest_one(bytes(wav))
    assert (got["container"], got["mime"]) == ("wav", "audio/wav")
    assert (got["sample_rate"], got["channels"]) == (8000, 1)
    assert got["duration_ms"] == 20  # 160 samples at 8 kHz
    assert got["n_tags"] == 1

    flac = encode_flac(np.zeros((4096, 1), np.int16), 8000)
    got = manifest_one(flac)
    assert got["container"] == "flac"
    assert got["duration_ms"] == 512  # 4096 / 8000 — STREAMINFO only

    mp3 = encode_mp3_frames(3)
    got = manifest_one(mp3)
    assert (got["container"], got["duration_ms"]) == ("mp3", 108)

    got = manifest_one(encode_adts_frames([64, 64]))
    assert (got["container"], got["duration_ms"]) == ("aac", 128)

    got = manifest_one(encode_ogg_opus([b"\x00" * 10] * 4))
    # 4 x 10 ms packets = 1920 granule ticks minus the 312-sample
    # pre-skip = 1608 / 48000 -> the RFC 7845 playback duration
    assert (got["container"], got["duration_ms"]) == ("ogg", 33)


def test_video_and_image_triage():
    mp4 = encode_mp4_mjpeg(
        [b"\xff\xd8x", b"\xff\xd8y"], delays_ms=[40, 40],
        width=8, height=6, sample_type=b"avc1",
    )
    got = manifest_one(mp4)
    assert (got["container"], got["width"], got["height"],
            got["duration_ms"]) == ("mp4", 8, 6, 80)

    webm = encode_webm([b"a" * 4], [0], width=32, height=24)
    got = manifest_one(webm)
    assert (got["container"], got["width"], got["height"]) \
        == ("webm", 32, 24)

    for blob, kind, w, h in [
        (encode_image_png(np.zeros((4, 6, 3), np.uint8)), "png", 6, 4),
        (encode_image_gif(np.zeros((5, 7, 3), np.uint8)), "gif", 7, 5),
        (encode_image_jpeg(np.full((16, 16), 128, np.uint8)),
         "jpeg", 16, 16),
        (encode_webp_header(48, 30), "webp", 48, 30),
    ]:
        got = manifest_one(bytes(blob))
        assert (got["container"], got["width"], got["height"]) \
            == (kind, w, h), kind
        assert got["mime"].startswith("image/")


def test_subtitle_triage():
    got = manifest_one(S.encode_srt([(0, 1000, "a"), (1500, 2500, "b")]))
    assert (got["container"], got["n_cues"], got["duration_ms"]) \
        == ("srt", 2, 2500)
    # a muxed subtitle-only MP4 takes its extent from the cue span
    got = manifest_one(S.encode_mp4_subtitles([(0, 1000, "cue")]))
    assert (got["container"], got["n_cues"], got["duration_ms"]) \
        == ("mp4", 1, 1000)


def test_operator_keeps_rows_for_bad_payloads(spark):
    df = spark.createDataFrame(
        [(0, bytearray(encode_mp3_frames(2))),
         (1, bytearray(b"\x00\x01 garbage that parses nowhere")),
         (2, None)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in media_manifest(df).collect()}
    assert len(rows) == 3  # triage accounts for every payload
    assert rows[0].container == "mp3" and rows[0].error is None
    assert rows[1].container is None and rows[1].error
    assert rows[2].error == "null payload" and rows[2].n_bytes == 0


def test_fuzz_manifest_raises_only_decode_errors():
    from sed_binning_spark.pipeline.multimodal import _DECODE_ERRORS

    blobs = [
        encode_mp3_frames(2),
        bytes(encode_webp_header(8, 8)),
        S.encode_srt([(0, 500, "x")]),
        encode_flac(np.zeros((4096, 1), np.int16), 8000)[:128],
    ]
    for blob in blobs:
        for at in range(len(blob)):
            mutated = bytearray(blob)
            mutated[at] ^= 0xFF
            try:
                manifest_one(bytes(mutated))
            except _DECODE_ERRORS:
                pass


def test_ogg_vorbis_triages_fully_from_page_headers():
    import struct

    from sed_binning_spark.pipeline.ogg import _page
    from sed_binning_spark.pipeline.tags import (
        encode_vorbis_comment_block,
    )

    # 44.1 kHz stereo Vorbis, last granule 88200 samples -> 2000 ms:
    # no codebook decode anywhere — rate/channels from the ID header,
    # duration from the final page's granule position
    head = (b"\x01vorbis" + struct.pack("<IBI", 0, 2, 44100)
            + b"\x00" * 16)
    cmt = (b"\x03vorbis"
           + encode_vorbis_comment_block([("title", "V")]) + b"\x01")
    ogg = (_page(0x02, 0, 7, 0, [head])
           + _page(0, 0, 7, 1, [cmt])
           + _page(0x04, 88200, 7, 2, [b"\x00" * 20]))
    got = manifest_one(ogg)
    assert (got["container"], got["sample_rate"], got["channels"],
            got["duration_ms"], got["n_tags"], got["error"]) \
        == ("ogg", 44100, 2, 2000, 1, None)


def test_empty_payload_is_an_error_row_not_a_subrip(spark):
    with pytest.raises(ValueError, match="empty"):
        manifest_one(b"")
    df = spark.createDataFrame(
        [(0, bytearray(b"")), (1, bytearray(b"  \n "))],
        "media_id long, payload binary",
    )
    rows = media_manifest(df).collect()
    assert all(r.container is None and r.error for r in rows)


def test_os2_bmp_core_header_dims():
    from sed_binning_spark.pipeline.manifest import _image_dims
    import struct

    core = (b"BM" + b"\x00" * 12
            + struct.pack("<IHHHH", 12, 100, 50, 1, 24))
    assert _image_dims(core) == ("bmp", 100, 50)
    odd = b"BM" + b"\x00" * 12 + struct.pack("<I", 24) + b"\x00" * 8
    with pytest.raises(ValueError, match="not a known layout"):
        _image_dims(odd)


def test_truncated_mp3_tail_keeps_facts_and_notes_the_drop():
    trunc = encode_mp3_frames(3)[:-100]  # cut into the final frame
    got = manifest_one(trunc)
    assert got["container"] == "mp3"
    assert got["duration_ms"] == 72  # the two clean frames
    assert "truncated tail" in got["error"]
