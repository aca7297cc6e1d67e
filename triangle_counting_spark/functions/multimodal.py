"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride as opaque ``binary`` columns plus a metadata
struct; decode/feature-extraction run as Arrow-batched kernels over
``mapInPandas``. AUDIO decode is REAL (WAV/PCM via stdlib wave + numpy —
functions/audio.py), IMAGE decode is REAL (PNG/BMP pixel decode + GIF
headers — functions/images.py), VIDEO container METADATA is REAL
(MP4 ISO-BMFF box walk + AVI RIFF — functions/video.py). The one
remaining stub is video FRAME decode (H.264/VP9/AV1 bitstreams need
codec libraries this container lacks — clearly marked below). Everything
Spark-side — schema, batching, partition sizing, UDF signatures,
deterministic fake features — is real and tested, so swapping in a real
frame decoder is a one-function change.

Scale notes: binary columns dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs task memory; feature
extraction repartitions by size not row count; outputs carry the original
key + sha for the per-row audit chain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes
    (stands in for encoded images/audio)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60000)) + 100).cast("int").alias(
            "duration_ms"
        ),
    )


def _decode_stub(payload: bytes, kind: str):
    """THE decode boundary. AUDIO is real (WAV/PCM via stdlib wave + numpy,
    functions/audio.py), IMAGE is real (PNG/BMP pixels + GIF headers,
    functions/images.py), video container METADATA is real
    (functions/video.py). Video FRAME decode needs codecs this container
    lacks, so it raises — callers that need frame-level features use the
    deterministic fake path below instead."""
    if kind == "audio":
        from .audio import decode_wav

        return decode_wav(payload)
    if kind == "image":
        from .images import decode_image

        return decode_image(payload)
    raise NotImplementedError(
        f"{kind} frame decoding for COMPRESSED codecs (H.264/VP9/AV1) "
        "requires codec libraries not present in this environment; use "
        "functions.video.video_frames for UNCOMPRESSED (BI_RGB DIB) AVI "
        "pixel decode, functions.video.video_metadata for container "
        "metadata, or extract_features(fake=True). Audio (WAV) and "
        "images (PNG/BMP) decode for real — see functions/audio.py and "
        "functions/images.py."
    )


def extract_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """(media_id, kind, feature: array<double>) via an Arrow-batched kernel.

    fake=True → deterministic features hashed from the payload bytes (the
    Spark plumbing under test); fake=False → REAL decode per row:
    kind='audio' decodes WAV payloads and emits ``dim`` normalized
    spectral band energies; kind='image' decodes PNG/BMP pixels and
    emits a ``dim``-bin normalized gray histogram; kind='video' raises
    (frame decode needs codec libraries).
    """

    def make_kernel(_dim: int, _fake: bool):
        # captured at factory time: decode_wav/decode_image have <locals>
        # qualnames, so cloudpickle ships them BY VALUE — the kernel needs
        # no package import on the worker (repo-wide closure rule)
        from .audio import decode_wav as _decode_audio
        from .images import decode_image as _decode_img

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            import numpy as np

            for b in batches:
                feats = []
                for payload, kind in zip(b["payload"], b["kind"]):
                    if not _fake:
                        # per-row kind routing: audio (WAV) and image
                        # (PNG/BMP) decode FOR REAL; video frame decode
                        # is the one remaining stub boundary
                        if str(kind) == "image":
                            _fmt, _w, _h, px = _decode_img(bytes(payload))
                            if px is None:  # GIF: header-only format
                                feats.append([0.0] * _dim)
                                continue
                            hist, _ = np.histogram(
                                px, bins=_dim, range=(0, 256))
                            tot = float(hist.sum())
                            feats.append(
                                (hist / tot if tot > 0 else
                                 hist.astype(np.float64)).tolist())
                            continue
                        if str(kind) != "audio":
                            raise NotImplementedError(
                                f"{kind} frame decoding requires codec "
                                "libraries not present in this environment; "
                                "use extract_features(fake=True)"
                            )
                        _rate, _nch, samples = _decode_audio(bytes(payload))
                        spec = np.abs(np.fft.rfft(samples))
                        bands = np.array_split(spec, _dim)
                        e = np.array([float(x.mean()) if len(x) else 0.0 for x in bands])
                        tot = float(e.sum())
                        feats.append((e / tot if tot > 0 else e).tolist())
                        continue
                    h = hashlib.sha256(bytes(payload)).digest()
                    arr = np.frombuffer(h[: _dim * 4], dtype=np.uint32).astype(np.float64)
                    feats.append((arr / 2**32).tolist())
                yield pd.DataFrame(
                    {
                        "media_id": b["media_id"],
                        "kind": b["kind"],
                        "feature": feats,
                    }
                )

        return kernel

    return media.select("media_id", "kind", "payload").mapInPandas(
        make_kernel(dim, fake), schema="media_id long, kind string, feature array<double>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) — the frame-sampling EXPANSION (one row per
    frame to decode) computed JVM-side; the decode of each frame would be
    the stubbed kernel above. Demonstrates the explode-then-kernel shape
    video pipelines need."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
