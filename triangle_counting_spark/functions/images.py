"""Real image decode + metadata over binary image columns (stdlib only).

Round 3 left image decode stubbed (multimodal.py) pending codec
libraries. PNG and BMP need none: PNG is zlib (stdlib) + the five
standard row filters, BMP is raw little-endian rows — so the image
modality now gets a REAL decoder exactly as WAV did for audio
(functions/audio.py): synthesize → encode real bytes → ship as
``binary`` → parse/decode → features, end-to-end, no fakes. GIF pixel
data is LZW (not stdlib); GIF participates at the header-metadata level
only, and video remains the one documented stub (multimodal.py).

Reference scope: the reference engine (Bader-Research/triangle-counting)
has no media path — this is LLM-training-data pipeline surface, not
reference parity.

Scale shape: identical to audio — payload bytes dominate row size
(``spark.sql.files.maxPartitionBytes`` governs scan-task memory); header
metadata is a pure-JVM scan-time projection (no Python worker), so
metadata predicates prune rows BEFORE the Arrow decode kernel ever sees
payload bytes; the decode kernel is stateless per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "media_id long, format string, width int, height int, n_pixels long, "
    "sum_gray long, mean_gray double, std_gray double, min_gray int, max_gray int"
)


def _image_codec():
    """(encoders, decoder) as NESTED functions so cloudpickle ships them BY
    VALUE into mapInPandas closures (repo-wide closure rule — workers
    without the package on PYTHONPATH still run the kernels)."""

    def encode_png(pixels) -> bytes:
        """2-D uint8 grayscale array -> real 8-bit grayscale PNG bytes
        (zlib + CRC32, stdlib only; filter type 0 per row)."""
        import struct
        import zlib

        import numpy as np

        px = np.asarray(pixels, dtype=np.uint8)
        h, w = px.shape

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
        raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def encode_bmp(pixels) -> bytes:
        """2-D uint8 grayscale array -> real 24-bit BMP bytes (gray
        replicated to BGR; rows bottom-up, 4-byte padded — the canonical
        BITMAPINFOHEADER layout)."""
        import struct

        import numpy as np

        px = np.asarray(pixels, dtype=np.uint8)
        h, w = px.shape
        row_bytes = (3 * w + 3) & ~3
        pad = b"\x00" * (row_bytes - 3 * w)
        body = b"".join(
            np.repeat(px[r], 3).tobytes() + pad for r in range(h - 1, -1, -1)
        )
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
        return hdr + info + body

    def encode_gif_header(width: int, height: int) -> bytes:
        """Minimal complete GIF87a container: header + 2-entry global
        color table + a 1-pixel image block + trailer. Pixel data is LZW
        (not stdlib-decodable) — GIF is a metadata-level format here."""
        import struct

        return (
            b"GIF87a"
            + struct.pack("<HHBBB", width, height, 0x80, 0, 0)  # GCT, 2 entries
            + b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)  # image descriptor
            + b"\x02\x02\x44\x01\x00"  # 2-bit LZW, one clear+pixel, end
            + b"\x3b"
        )

    def decode(payload: bytes):
        """Image bytes -> (format, width, height, 2-D uint8 gray pixels or
        None). REAL pixel decode for PNG (zlib inflate + all five standard
        row unfilters) and BMP (raw rows); GIF returns header dims with
        pixels=None (LZW needs a codec)."""
        import struct
        import zlib

        import numpy as np

        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
            if depth != 8 or ctype != 0:
                raise ValueError(f"PNG decoder supports 8-bit grayscale only, got depth={depth} type={ctype}")
            # walk chunks, concatenate IDAT
            idat, pos = b"", 8
            while pos < len(b):
                (ln,) = struct.unpack(">I", b[pos : pos + 4])
                tag = b[pos + 4 : pos + 8]
                if tag == b"IDAT":
                    idat += b[pos + 8 : pos + 8 + ln]
                if tag == b"IEND":
                    break
                pos += 12 + ln
            raw = zlib.decompress(idat)
            stride = w + 1
            px = np.zeros((h, w), dtype=np.uint8)
            prev = np.zeros(w, dtype=np.int32)
            for r in range(h):
                row = raw[r * stride : (r + 1) * stride]
                ftype, data = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
                if ftype == 0:  # None
                    cur = data
                elif ftype == 2:  # Up
                    cur = (data + prev) & 0xFF
                elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
                    cur = np.zeros(w, dtype=np.int32)
                    a = 0
                    for i in range(w):
                        bb = int(prev[i])
                        if ftype == 1:
                            base = a
                        elif ftype == 3:
                            base = (a + bb) // 2
                        else:  # Paeth predictor
                            c = int(prev[i - 1]) if i else 0
                            p = a + bb - c
                            pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                            base = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                        cur[i] = (int(data[i]) + base) & 0xFF
                        a = int(cur[i])
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
                px[r] = cur.astype(np.uint8)
                prev = cur
            return "png", int(w), int(h), px
        if b[:2] == b"BM":
            w, h = struct.unpack("<ii", b[18:26])
            bpp = struct.unpack("<H", b[28:30])[0]
            if bpp != 24:
                raise ValueError(f"BMP decoder supports 24-bit only, got {bpp}")
            (off,) = struct.unpack("<I", b[10:14])
            row_bytes = (3 * w + 3) & ~3
            px = np.zeros((abs(h), w), dtype=np.uint8)
            for r in range(abs(h)):
                row = np.frombuffer(
                    b[off + r * row_bytes : off + r * row_bytes + 3 * w], dtype=np.uint8
                )
                # bottom-up rows; gray = blue channel (we encode gray=BGR)
                px[abs(h) - 1 - r if h > 0 else r] = row[0::3]
            return "bmp", int(w), int(abs(h)), px
        if b[:4] == b"GIF8":
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", int(w), int(h), None
        raise ValueError("unknown image format (not PNG/BMP/GIF)")

    return encode_png, encode_bmp, encode_gif_header, decode


encode_png, encode_bmp, encode_gif_header, decode_image = _image_codec()


#: SQL-replayable dimension formulas (the gate oracle recomputes these
#: directly from media_id — the Spark side must round-trip them through
#: real encoded bytes)
def _dims_for(media_id: int) -> tuple[str, int, int]:
    fmt = ("png", "bmp", "gif")[media_id % 3]
    width = media_id % 61 + 4
    height = (media_id * 7) % 47 + 4
    return fmt, width, height


def synthetic_image_media(
    spark, ids=None, n: int = 64, seed: int = 9, pixel_mode: str = "rng"
) -> DataFrame:
    """(media_id, payload) — REAL encoded PNG/BMP/GIF payloads, generated
    distributed; format + dimensions derive deterministically from
    media_id (``_dims_for``), pixel content from a seeded generator, so
    the table is identical at any partitioning. ``ids``: an optional
    1-column DataFrame of media ids (e.g. documents.doc_id) so gate
    queries can build media over driver-provided tables.

    ``pixel_mode``: "rng" (seeded PCG64 noise) or "formula" —
    ``gray(r, c) = (media_id*31 + r*7 + c*13) mod 256`` — whose pixel
    statistics an ANSI-SQL oracle recomputes in closed form WITHOUT a
    decoder, so a gate verifies the full encode→binary→decode pipeline
    against arithmetic ground truth (any bit error in the PNG filter or
    BMP row logic shifts the sums)."""
    enc_png, enc_bmp, enc_gif = encode_png, encode_bmp, encode_gif_header
    if pixel_mode not in ("rng", "formula"):
        raise ValueError(f"pixel_mode must be 'rng' or 'formula', got {pixel_mode!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            payloads = []
            for mid in b["media_id"]:
                mid = int(mid)
                fmt = ("png", "bmp", "gif")[mid % 3]
                width = mid % 61 + 4
                height = (mid * 7) % 47 + 4
                if fmt == "gif":
                    payloads.append(enc_gif(width, height))
                    continue
                if pixel_mode == "formula":
                    r = np.arange(height, dtype=np.int64)[:, None]
                    c = np.arange(width, dtype=np.int64)[None, :]
                    px = ((mid * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
                else:
                    rng = np.random.default_rng(seed * 1_000_003 + mid)
                    px = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
                payloads.append(enc_png(px) if fmt == "png" else enc_bmp(px))
            yield pd.DataFrame({"media_id": b["media_id"], "payload": payloads})

    if ids is None:
        ids = spark.range(n).select(F.col("id").alias("media_id"))
    else:
        ids = ids.toDF("media_id").select(F.col("media_id").cast("long"))
    return ids.mapInPandas(gen, schema="media_id long, payload binary")


def image_header_metadata(media: DataFrame) -> DataFrame:
    """(media_id, format, width, height, bit_depth) by parsing ONLY the
    fixed-offset header bytes JVM-side — no Python worker, no payload
    decode (same scan-time-projection pattern as wav_header_metadata):
    PNG IHDR big-endian dims at offset 16, BMP BITMAPINFOHEADER
    little-endian dims at 18, GIF little-endian u16 dims at 6. Unknown
    magics yield NULLs (filter them before the decode kernel)."""
    p = F.col("payload")

    def byte(pos):  # 1-indexed byte as long, JVM-side
        return F.conv(F.hex(F.substring(p, pos, 1)), 16, 10).cast("long")

    def be_int(start, nbytes):
        out = byte(start)
        for i in range(1, nbytes):
            out = out * 256 + byte(start + i)
        return out

    def le_int(start, nbytes):
        out = byte(start)
        for i in range(1, nbytes):
            out = out + byte(start + i) * (256 ** i)
        return out

    magic8 = F.hex(F.substring(p, 1, 8))
    is_png = magic8 == F.lit("89504E470D0A1A0A")
    is_bmp = F.hex(F.substring(p, 1, 2)) == F.lit("424D")
    is_gif = F.hex(F.substring(p, 1, 4)) == F.lit("47494638")
    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_gif, F.lit("gif"))
    )
    width = (
        F.when(is_png, be_int(17, 4))
        .when(is_bmp, le_int(19, 4))
        .when(is_gif, le_int(7, 2))
        .cast("int")
    )
    height = (
        F.when(is_png, be_int(21, 4))
        .when(is_bmp, le_int(23, 4))
        .when(is_gif, le_int(9, 2))
        .cast("int")
    )
    bit_depth = (
        F.when(is_png, byte(25))
        .when(is_bmp, le_int(29, 2))
        .when(is_gif, (F.pmod(byte(11), 8) + 1))  # GCT size field low bits
        .cast("int")
    )
    return media.select(
        "media_id",
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
        bit_depth.alias("bit_depth"),
    )


def image_features(media: DataFrame) -> DataFrame:
    """(media_id, format, width, height, n_pixels, sum_gray, mean_gray,
    std_gray, min_gray, max_gray) via REAL pixel decode in an
    Arrow-batched kernel (PNG/BMP; GIF rows yield header dims with NULL
    pixel stats). ``sum_gray`` is the exact int64 pixel sum — the
    integer-exact statistic gate hashing uses (floats stay for users)."""
    dec = decode_image

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                fmt, w, h, px = dec(bytes(payload))
                if px is None:
                    rows.append(
                        (int(mid), fmt, w, h, None, None, None, None, None, None)
                    )
                else:
                    rows.append(
                        (
                            int(mid), fmt, w, h, int(px.size),
                            int(px.astype("int64").sum()),
                            float(px.mean()), float(px.std()),
                            int(px.min()), int(px.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height", "n_pixels",
                    "sum_gray", "mean_gray", "std_gray", "min_gray", "max_gray",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURE_SCHEMA
    )
