from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from triangle_counting_spark.streaming.events import run_event_stream_demo


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 32
    by_id = {r.media_id: r.feature for r in feats}
    assert all(len(v) == 8 for v in by_id.values())
    assert all(0.0 <= x <= 1.0 for v in by_id.values() for x in v)
    # deterministic
    again = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert by_id == again


def test_multimodal_decode_stub_raises(spark):
    # video frame decode is the one remaining stub boundary (audio and
    # image decode for real now; their fake payloads would fail format
    # parsing instead, so test the video rows alone)
    media = synthetic_media(spark, n=24).where(F.col("kind") == "video")
    with pytest.raises(Exception, match="NotImplementedError|frame decoding"):
        extract_features(media, fake=False).collect()


def test_multimodal_real_image_features_end_to_end(spark):
    """fake=False over real PNG/BMP payloads: gray-histogram features
    through the same mapInPandas plumbing, checked against numpy."""
    import numpy as np
    from pyspark.sql import functions as FF

    from triangle_counting_spark.functions.images import synthetic_image_media

    media = synthetic_image_media(spark, n=8, seed=9).select(
        "media_id", FF.lit("image").alias("kind"), "payload"
    )
    rows = {r.media_id: r.feature for r in
            extract_features(media, dim=8, fake=False).collect()}
    assert len(rows) == 8
    for mid, feat in rows.items():
        assert len(feat) == 8
        if mid % 3 == 2:  # gif: header-only, zero feature by contract
            assert feat == [0.0] * 8
            continue
        w, h = mid % 61 + 4, (mid * 7) % 47 + 4
        px = np.random.default_rng(9 * 1_000_003 + mid).integers(
            0, 256, size=(h, w), dtype=np.uint8)
        hist, _ = np.histogram(px, bins=8, range=(0, 256))
        want = hist / hist.sum()
        assert np.allclose(feat, want)


def test_multimodal_real_audio_features_end_to_end(spark):
    """fake=False over real WAV payloads: the decode boundary feeds actual
    spectral features through the same mapInPandas plumbing."""
    from pyspark.sql import functions as FF

    from triangle_counting_spark.functions.audio import synthetic_wav_media

    media = synthetic_wav_media(spark, 6).select(
        "media_id", FF.lit("audio").alias("kind"), "payload"
    )
    rows = extract_features(media, dim=8, fake=False).collect()
    assert len(rows) == 6
    for r in rows:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9  # normalized band energies
        assert max(r.feature) > 0.2  # a sine concentrates in one band


def test_multimodal_audio_decode_is_real():
    """The decode boundary routes kind='audio' to the real WAV decoder."""
    import numpy as np

    from triangle_counting_spark.functions.audio import encode_wav_pcm16
    from triangle_counting_spark.functions.multimodal import _decode_stub

    t = np.arange(4000) / 4000.0
    payload = encode_wav_pcm16(0.3 * np.sin(2 * np.pi * 100 * t), 4000)
    rate, nch, samples = _decode_stub(payload, "audio")
    assert (rate, nch, len(samples)) == (4000, 1, 4000)
    # images route to the real PNG/BMP decoder (r4) — a WAV payload is
    # not an image, so the decoder (not a stub) rejects it
    with pytest.raises(ValueError, match="unknown image format"):
        _decode_stub(payload, "image")
    # video frame decode is the one remaining stub boundary
    with pytest.raises(NotImplementedError, match="frame decoding"):
        _decode_stub(payload, "video")


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=64)
    plan = frame_sample_plan(media, every_ms=5000)
    joined = plan.join(media, "media_id").select("media_id", "frame_ts_ms", "duration_ms")
    rows = joined.collect()
    assert rows
    assert all(0 <= r.frame_ts_ms <= r.duration_ms for r in rows)


def test_streaming_windowed_counts(spark, tmp_path):
    # batch vs stream parity: availableNow file-source run over the same
    # parquet must reproduce the batch aggregate (modulo watermark drops;
    # with availableNow + append mode, finalized windows flush on close)
    src = "/root/testdata/sf0.001/events.parquet"
    n = run_event_stream_demo(spark, src, str(tmp_path / "out"), timeout_sec=60)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert n > 0
    assert n <= batch


def test_streaming_exact_dedup(spark, tmp_path):
    """First arrival of each text survives; duplicates collapse — composes
    with the batch exact_dedup_groups (same md5 key)."""
    from triangle_counting_spark.streaming.events import run_dedup_stream_demo

    src = tmp_path / "docs"
    spark.createDataFrame(
        [
            (1, "alpha beta", "2026-01-01 00:00:00"),
            (2, "alpha beta", "2026-01-01 00:01:00"),  # dup
            (3, "gamma delta", "2026-01-01 00:02:00"),
            (4, "alpha beta", "2026-01-01 00:03:00"),  # dup
        ],
        "doc_id long, text string, ts string",
    ).write.parquet(str(src))
    n = run_dedup_stream_demo(spark, str(src), str(tmp_path / "out"))
    assert n == 2  # two distinct texts


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """The streaming session_window twin must agree with the batch
    sessionize on every session the final watermark closed (append mode
    holds back sessions inside the trailing gap — those are the batch
    operator's job on the sink table)."""
    from pyspark.sql import functions as F

    from triangle_counting_spark.functions.events import epoch_seconds, sessionize
    from triangle_counting_spark.streaming.events import run_session_stream_demo

    src = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(src)
    gap = 30
    # run the STREAMING side under a non-UTC session: the r3 failure mode
    # was an NTZ wall clock interpreted in the session zone, which shifts
    # every epoch by the UTC offset — parity here proves the streaming
    # twin shares the batch operator's tz-proof epoch derivation
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {
            (r.user_id, r.session_start_epoch, r.session_end_epoch,
             r.n_events, round(r.sum_value, 6))
            for r in run_session_stream_demo(
                spark, src, str(tmp_path / "sess"), gap_minutes=gap).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved_tz)
    assert got, "stream emitted no sessions"
    # expected: batch sessions whose end + gap <= max event time (the
    # final watermark with a 0-second delay)
    max_epoch = events.select(
        F.max(epoch_seconds(events)).alias("m")).collect()[0]["m"]
    batch = {
        (r.user_id, r.session_start_epoch, r.session_end_epoch,
         r.n_events, round(r.sum_value, 6))
        for r in sessionize(events, gap_minutes=gap).collect()
        if r.session_end_epoch + gap * 60 <= max_epoch
    }
    assert got == batch
