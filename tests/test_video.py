"""Real MP4/AVI container metadata (functions/video.py) — the video
modality's METADATA boundary is no longer a stub (ISO-BMFF box walk +
RIFF chunk walk, stdlib struct). Frame decode remains the documented
stub (multimodal.py) — these tests pin the metadata surface."""

import struct

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.video import (
    avi_header_metadata,
    encode_avi_header,
    encode_mp4,
    parse_video,
    synthetic_video_media,
    video_metadata,
)


def test_mp4_roundtrip_local():
    fmt, w, h, nf, dur_ms, ts = parse_video(encode_mp4(640, 360, 100))
    assert (fmt, w, h) == ("mp4", 640, 360)
    assert ts == 600
    # 100 frames * 25 ticks / 600 ticks-per-sec = 4166 ms (floor)
    assert dur_ms == 100 * 25 * 1000 // 600
    assert nf is None  # mvhd carries duration, not frame count


def test_avi_roundtrip_local():
    fmt, w, h, nf, dur_ms, ts = parse_video(encode_avi_header(320, 240, 75))
    assert (fmt, w, h, nf) == ("avi", 320, 240, 75)
    assert dur_ms == 75 * 40_000 // 1000  # 25 fps
    assert ts is None


def test_mp4_v1_and_largesize_boxes():
    """The walker handles spec features our encoder never emits: version-1
    mvhd/tkhd (64-bit times) and a largesize moov box."""
    def box(tag, body, large=False):
        if large:
            return struct.pack(">I", 1) + tag + struct.pack(">Q", 16 + len(body)) + body
        return struct.pack(">I", 8 + len(body)) + tag + body

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = box(b"mvhd", struct.pack(">I", 0x01000000)      # version 1
               + struct.pack(">QQ", 0, 0)                    # ctime, mtime (64)
               + struct.pack(">IQ", 90000, 123456)           # timescale, duration
               + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
               + b"\x00" * 10 + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">I", 0x01000007)
               + struct.pack(">QQ", 0, 0) + struct.pack(">I", 1) + b"\x00" * 4
               + struct.pack(">Q", 123456) + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
               + struct.pack(">II", 1920 << 16, 1080 << 16))
    payload = (box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
               + box(b"moov", mvhd + box(b"trak", tkhd), large=True))
    fmt, w, h, nf, dur_ms, ts = parse_video(payload)
    assert (fmt, w, h, ts) == ("mp4", 1920, 1080, 90000)
    assert dur_ms == 123456 * 1000 // 90000


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="unknown video container"):
        parse_video(b"\x00" * 64)
    with pytest.raises(ValueError, match="AVI without avih"):
        parse_video(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_synthetic_media_distributed_deterministic(spark):
    a = {r.media_id: bytes(r.payload) for r in synthetic_video_media(spark, n=14).collect()}
    b = {
        r.media_id: bytes(r.payload)
        for r in synthetic_video_media(spark, n=14).repartition(5).collect()
    }
    assert a == b


def test_metadata_kernel_matches_formulas(spark):
    meta = {r.media_id: r for r in video_metadata(synthetic_video_media(spark, n=20)).collect()}
    assert len(meta) == 20
    for mid, r in meta.items():
        w, h, nf = mid % 127 + 16, (mid * 3) % 95 + 16, mid % 241 + 1
        assert (r.width, r.height) == (w, h)
        if mid % 2:  # mp4
            assert (r.format, r.timescale, r.n_frames) == ("mp4", 600, None)
            assert r.duration_ms == nf * 25 * 1000 // 600
        else:  # avi
            assert (r.format, r.timescale, r.n_frames) == ("avi", None, nf)
            assert r.duration_ms == nf * 40_000 // 1000


def test_avi_header_metadata_jvm_side(spark):
    media = synthetic_video_media(spark, n=16)
    meta = {r.media_id: r for r in avi_header_metadata(media).collect()}
    full = {r.media_id: r for r in video_metadata(media).collect()}
    for mid, m in meta.items():
        if mid % 2:  # mp4 rows: NULLs from the fixed-offset AVI path
            assert m.format is None and m.width is None
        else:
            assert (m.format, m.width, m.height, m.n_frames) == (
                "avi", full[mid].width, full[mid].height, full[mid].n_frames)
            assert m.usec_per_frame == 40_000
    plan_str = (
        avi_header_metadata(media)
        .where(F.col("width") > 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan_str
    assert "BatchEvalPython" not in plan_str
    assert plan_str.count("MapInPandas") == 1  # only the synthetic source


# --- property-based roundtrips (pure local functions, no Spark) ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=8192),
        h=st.integers(min_value=1, max_value=8192),
        nf=st.integers(min_value=1, max_value=1_000_000),
        ts=st.integers(min_value=1, max_value=1_000_000),
        ft=st.integers(min_value=1, max_value=10_000),
    )
    def test_mp4_roundtrip_property(w, h, nf, ts, ft):
        fmt, ww, hh, _nf, dur_ms, ts_out = parse_video(
            encode_mp4(w, h, nf, timescale=ts, frame_ticks=ft))
        assert (fmt, ww, hh, ts_out) == ("mp4", w, h, ts)
        assert dur_ms == nf * ft * 1000 // ts

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=8192),
        h=st.integers(min_value=1, max_value=8192),
        nf=st.integers(min_value=0, max_value=1_000_000),
        us=st.integers(min_value=1, max_value=10_000_000),
    )
    def test_avi_roundtrip_property(w, h, nf, us):
        fmt, ww, hh, nf_out, dur_ms, ts = parse_video(
            encode_avi_header(w, h, nf, usec_per_frame=us))
        assert (fmt, ww, hh, nf_out, ts) == ("avi", w, h, nf, None)
        assert dur_ms == nf * us // 1000


# --- uncompressed DIB frame decode (r5: the last frame-decode boundary
# narrows to compressed codecs only) --------------------------------------


def _expected_frame_stats(mid: int):
    import numpy as np

    w = mid % 13 + 4
    h = (mid * 3) % 11 + 4
    nf = mid % 5 + 1
    out = []
    for f in range(nf):
        px = (
            mid * 7 + f * 31 + np.arange(h)[:, None] * 5 + np.arange(w)[None, :]
        ) % 256
        out.append((mid, f, w, h, float(px.mean()), int(px.min()), int(px.max())))
    return out


def test_video_frames_closed_form(spark):
    from triangle_counting_spark.functions.video import (
        synthetic_dib_video,
        video_frames,
    )

    got = sorted(
        map(tuple, video_frames(synthetic_dib_video(spark, n=12)).collect())
    )
    want = sorted(t for mid in range(12) for t in _expected_frame_stats(mid))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4] and g[5:] == w[5:]
        assert abs(g[4] - w[4]) < 1e-9


def test_video_frames_partition_invariant(spark):
    from triangle_counting_spark.functions.video import (
        synthetic_dib_video,
        video_frames,
    )

    media = synthetic_dib_video(spark, n=8).localCheckpoint(eager=True)
    a = sorted(map(tuple, video_frames(media.repartition(1)).collect()))
    b = sorted(map(tuple, video_frames(media.repartition(7)).collect()))
    assert a == b


def test_video_frames_compressed_rejected(spark):
    # a '00dc' (compressed) chunk must raise, not silently skip
    import struct

    import pandas as pd
    import pytest as _pytest

    from triangle_counting_spark.functions.video import decode_avi_frames, encode_avi_dib
    import numpy as np

    payload = bytearray(encode_avi_dib(4, 4, [np.zeros((4, 4), np.uint8)]))
    ix = bytes(payload).find(b"00db")
    payload[ix : ix + 4] = b"00dc"
    with _pytest.raises(NotImplementedError, match="00dc"):
        decode_avi_frames(bytes(payload))


def test_dib_metadata_consistent_with_frames(spark):
    # the metadata walker and the frame decoder must agree on the SAME container
    from triangle_counting_spark.functions.video import (
        synthetic_dib_video,
        video_frames,
        video_metadata,
    )
    from pyspark.sql import functions as F

    media = synthetic_dib_video(spark, n=10).localCheckpoint(eager=True)
    meta = {r["media_id"]: r for r in video_metadata(media).collect()}
    per = (
        video_frames(media)
        .groupBy("media_id")
        .agg(F.count("*").alias("nf"), F.first("width").alias("w"),
             F.first("height").alias("h"))
        .collect()
    )
    for r in per:
        m = meta[r["media_id"]]
        assert (m["n_frames"], m["width"], m["height"]) == (r["nf"], r["w"], r["h"])
