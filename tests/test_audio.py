"""Real WAV decode + features (functions/audio.py) — the audio modality's
decode boundary is no longer a stub (stdlib wave + numpy)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.audio import (
    audio_features,
    decode_wav,
    encode_wav_pcm16,
    synthetic_wav_media,
    wav_header_metadata,
)


def test_wav_roundtrip_local():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    payload = encode_wav_pcm16(sig, rate)
    r, nch, decoded = decode_wav(payload)
    assert (r, nch) == (rate, 1)
    assert len(decoded) == rate
    # 16-bit quantization: encode rounds to 1/32767 steps, decode scales by
    # 1/32768 — worst case ~1.5 LSB
    assert float(np.max(np.abs(decoded - sig))) < 2.0 / 32767


def test_sine_features_match_closed_forms(spark):
    """A pure sine has known RMS (A/sqrt2), ZCR (2f/rate) and spectral
    centroid (f) — the distributed kernel must reproduce them."""
    rate = 8000
    freq = 440.0
    amp = 0.5
    t = np.arange(2 * rate) / rate
    payload = encode_wav_pcm16(amp * np.sin(2 * np.pi * freq * t), rate)
    media = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = audio_features(media).collect()[0]
    assert row.sample_rate == rate
    assert row.n_samples == 2 * rate
    assert row.duration_ms == pytest.approx(2000.0)
    assert row.rms == pytest.approx(amp / math.sqrt(2), rel=1e-3)
    assert row.peak == pytest.approx(amp, rel=1e-3)
    assert row.zero_crossing_rate == pytest.approx(2 * freq / rate, rel=2e-2)
    assert row.spectral_centroid_hz == pytest.approx(freq, rel=2e-2)


def test_synthetic_media_distributed_deterministic(spark):
    a = {r.media_id: bytes(r.payload) for r in synthetic_wav_media(spark, 12).collect()}
    b = {
        r.media_id: bytes(r.payload)
        for r in synthetic_wav_media(spark, 12).repartition(7).collect()
    }
    assert a == b
    feats = audio_features(synthetic_wav_media(spark, 12)).collect()
    assert len(feats) == 12
    assert all(r.rms > 0 and r.spectral_centroid_hz > 0 for r in feats)


def test_header_metadata_jvm_side_matches_decode(spark):
    media = synthetic_wav_media(spark, 8, sample_rate=8000)
    meta = {r.media_id: r for r in wav_header_metadata(media).collect()}
    full = {r.media_id: r for r in audio_features(media).collect()}
    assert set(meta) == set(full)
    for mid, m in meta.items():
        assert m.sample_rate == 8000
        assert m.n_channels == 1
        assert m.bits_per_sample == 16
        assert m.data_bytes == 2 * full[mid].n_samples
    # and the metadata path is JVM-only: no Python-worker stages
    plan_str = (
        wav_header_metadata(media)
        .where(F.col("sample_rate") > 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan_str
    assert "BatchEvalPython" not in plan_str


def test_stereo_mixdown():
    rate = 4000
    t = np.arange(rate) / rate
    left = 0.5 * np.sin(2 * np.pi * 200.0 * t)
    # interleave L/R manually into a 2-channel wav
    import io
    import wave as wv

    inter = np.empty(2 * rate, dtype="<i2")
    inter[0::2] = (left * 32767).astype("<i2")
    inter[1::2] = 0
    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(inter.tobytes())
    r, nch, x = decode_wav(buf.getvalue())
    assert (r, nch) == (rate, 2)
    assert len(x) == rate
    # mono mixdown = (L+0)/2
    assert float(np.max(np.abs(x - left / 2))) < 1e-3
