"""Real audio decode + feature extraction over binary WAV columns.

Round 2 left ALL media decode stubbed (multimodal.py:50-57) because the
container has no imaging/audio libraries. WAV/PCM needs none: the stdlib
``wave`` module parses RIFF headers and numpy decodes the PCM frames, so
the audio modality gets a REAL decoder — synthesize → encode → ship as
``binary`` → decode → features, end-to-end, no fakes. Images/video remain
honestly stubbed in multimodal.py (they genuinely need codecs).

Reference scope: the reference engine (Bader-Research/triangle-counting)
has no media path at all — this module is part of the LLM-training-data
pipeline surface (documents/embeddings/media), not reference parity.

Scale shape: payloads dominate row size, so the decode kernel runs as an
Arrow-batched ``mapInPandas`` whose per-task byte volume is governed by
``spark.sql.files.maxPartitionBytes`` on the scan side; features are a
fixed small struct per row, so the output shuffles cheaply. The kernel
is stateless per row — any partitioning works, no skew surface beyond
payload-size variance (repartition by byte size upstream if payloads are
wildly uneven).
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms double, rms double, peak double, zero_crossing_rate double, "
    "spectral_centroid_hz double"
)


def _wav_codec():
    """Build (encode, decode) as NESTED functions: their ``<locals>``
    qualnames force cloudpickle to ship them BY VALUE into mapInPandas
    closures — a worker without this package on PYTHONPATH can still run
    the kernels (the repo-wide closure rule for Arrow-UDF helpers)."""

    def encode(samples, sample_rate: int) -> bytes:
        """Mono float[-1,1] -> 16-bit PCM WAV bytes (stdlib only)."""
        import io as _io
        import wave as _wave

        import numpy as np

        pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        ints = np.round(pcm * 32767.0).astype("<i2")
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(ints.tobytes())
        return buf.getvalue()

    def decode(payload: bytes):
        """WAV bytes -> (sample_rate, n_channels, float64 mono in [-1,1]).

        Real decode: RIFF header via stdlib ``wave``, PCM frames via
        numpy. 8/16/32-bit integer PCM; multi-channel mixes down to mono
        by averaging (the usual feature-extraction convention).
        """
        import io as _io
        import wave as _wave

        import numpy as np

        with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
        if width == 2:
            arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 4:
            arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        elif width == 1:  # WAV 8-bit is unsigned
            arr = (
                np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            raise ValueError(f"unsupported PCM sample width: {width} bytes")
        if nch > 1:
            arr = arr[: (len(arr) // nch) * nch].reshape(-1, nch).mean(axis=1)
        return rate, nch, arr

    return encode, decode


encode_wav_pcm16, decode_wav = _wav_codec()


def synthetic_wav_media(
    spark, n: int = 32, sample_rate: int = 8000, seed: int = 7
) -> DataFrame:
    """(media_id, payload) — REAL encoded WAV payloads, generated
    distributed (one sine + harmonic per row, parameters hashed from the
    id, so the table is deterministic at any partitioning)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            payloads = []
            for mid in b["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                freq = float(rng.integers(100, 2000))
                dur_s = float(rng.integers(2, 10)) / 10.0
                amp = 0.2 + 0.6 * float(rng.random())
                t = np.arange(int(sample_rate * dur_s)) / sample_rate
                sig = amp * np.sin(2 * np.pi * freq * t) + (amp / 4.0) * np.sin(
                    2 * np.pi * 2 * freq * t
                )
                payloads.append(encode_wav_pcm16(sig / 1.5, sample_rate))
            yield pd.DataFrame({"media_id": b["id"], "payload": payloads})

    return spark.range(n).mapInPandas(gen, schema="media_id long, payload binary")


def audio_features(media: DataFrame) -> DataFrame:
    """Real per-clip audio features via one Arrow-batched decode kernel:
    duration, RMS energy, peak amplitude, zero-crossing rate, spectral
    centroid (rfft). ``media`` needs (media_id, payload=WAV bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                rate, nch, x = decode_wav(payload)
                ns = len(x)
                if ns == 0:
                    rows.append((mid, rate, nch, 0, 0.0, 0.0, 0.0, 0.0, 0.0))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                peak = float(np.max(np.abs(x)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(ns, d=1.0 / rate)
                denom = float(spec.sum())
                centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
                rows.append(
                    (
                        mid,
                        rate,
                        nch,
                        ns,
                        1000.0 * ns / rate,
                        rms,
                        peak,
                        zcr,
                        centroid,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "rms",
                    "peak",
                    "zero_crossing_rate",
                    "spectral_centroid_hz",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA
    )


def wav_header_metadata(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_channels, bits_per_sample, data_bytes) by
    parsing ONLY the 44-byte canonical RIFF/fmt header JVM-side — no Python
    kernel, no full-payload decode: the typed-metadata extraction pattern
    for binary columns (cheap scan-time projection; the decode kernel above
    is reserved for rows that pass metadata predicates)."""
    hdr = F.substring(F.col("payload"), 1, 44)

    def le_int(col, start, nbytes):
        # little-endian unsigned int from the binary header, JVM-side
        b = [
            F.conv(F.hex(F.substring(col, start + i, 1)), 16, 10).cast("long")
            * (256**i)
            for i in range(nbytes)
        ]
        out = b[0]
        for x in b[1:]:
            out = out + x
        return out

    return media.select(
        "media_id",
        le_int(hdr, 25, 4).cast("int").alias("sample_rate"),
        le_int(hdr, 23, 2).cast("int").alias("n_channels"),
        le_int(hdr, 35, 2).cast("int").alias("bits_per_sample"),
        le_int(hdr, 41, 4).alias("data_bytes"),
    )


def _struct_selfcheck() -> None:  # pragma: no cover — dev aid
    """Offsets above follow the canonical 44-byte header: riff(12) fmt(8)
    audio_format(2)@20 channels(2)@22 rate(4)@24 byterate(4)@28 align(2)@32
    bits(2)@34 'data'(4)@36 size(4)@40 (1-indexed in substring)."""
    struct.calcsize("<4sI4s")
