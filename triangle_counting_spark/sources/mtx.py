"""MatrixMarket (.mtx) edge-list reader — format parity with the reference.

Reproduces readMatrixMarketFile's semantics (main.c:296-384): skip '%'
comment lines, first data line is ``rows cols nnz`` (must be square,
main.c:313-317), remaining lines are 1-indexed ``i j`` pairs → shifted to
0-indexed, symmetrized, deduplicated, self-loops dropped. Expressed as a
distributed text scan + split — no driver-side parsing, so a 1 TB .mtx
ingests in parallel (the reference reads it serially with fscanf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.orientation import canonical_edges


def read_mtx(spark: SparkSession, path: str) -> DataFrame:
    """Canonical (src, dst) edge table from a MatrixMarket file."""
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("%") & (F.trim("value") != "")
    )
    toks = lines.select(F.split(F.trim("value"), r"\s+").alias("t"))
    # header = the one line with 3 tokens (rows cols nnz); validate square
    header = toks.where(F.size("t") == 3).limit(1).collect()
    if header:
        rows, cols = int(header[0]["t"][0]), int(header[0]["t"][1])
        if rows != cols:
            raise ValueError(f"non-square MatrixMarket matrix {rows}x{cols}")
    pairs = toks.where(F.size("t") == 2).select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
    )
    return canonical_edges(pairs)
