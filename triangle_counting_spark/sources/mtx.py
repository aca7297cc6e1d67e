"""MatrixMarket (.mtx) edge-list reader — format parity with the reference.

Reproduces readMatrixMarketFile's semantics (main.c:296-384): skip '%'
comment lines, first data line is ``rows cols nnz`` (must be square,
main.c:313-317), remaining lines are 1-indexed ``i j [value]`` entries →
shifted to 0-indexed, symmetrized, deduplicated, self-loops dropped.
Weighted files (``coordinate real``/``integer``: 3 tokens per entry line)
parse by taking the first two fields; ``pattern`` files are the 2-token
case. Expressed as a distributed text scan + split — no driver-side data
parsing, so a 1 TB .mtx ingests in parallel (the reference reads it
serially with fscanf); only the header comes from a bounded driver-side
head read (the header is by definition the FIRST non-comment line, which a
distributed filter cannot identify without a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.orientation import canonical_edges


def _read_header(spark: SparkSession, path: str) -> tuple[str, int, int, int]:
    """(header_line, rows, cols, nnz) from the first non-comment line.

    sc.textFile(...).take() reads from the start of the first split —
    ordered, bounded, no full scan.
    """
    head = spark.sparkContext.textFile(path, 1).take(10_000)
    for line in head:
        t = line.strip()
        if not t or t.startswith("%"):
            continue
        toks = t.split()
        if len(toks) != 3:
            raise ValueError(
                f"malformed MatrixMarket header (want 'rows cols nnz'): {t!r}"
            )
        rows, cols, nnz = int(toks[0]), int(toks[1]), int(toks[2])
        if rows != cols:
            raise ValueError(f"non-square MatrixMarket matrix {rows}x{cols}")
        return t, rows, cols, nnz
    raise ValueError(f"no MatrixMarket header found in {path}")


def read_mtx(
    spark: SparkSession, path: str, weighted: bool = False
) -> DataFrame:
    """Canonical (src, dst) edge table from a MatrixMarket file.

    ``weighted=True``: also return the entry value as ``weight`` (1.0 for
    pattern files); duplicate/reversed entries keep the MAX weight per
    canonical edge (deterministic; the reference discards weights
    entirely, main.c:296-384)."""
    header, _rows, _cols, nnz = _read_header(spark, path)
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("%") & (F.trim("value") != "")
    )
    # drop the header by string equality: a DATA line identical to the
    # header text would require i=rows, j=cols, weight=nnz formatted as a
    # bare int — and (rows, cols) duplicates/self-loops are removed by
    # canonical_edges anyway
    toks = lines.where(F.trim("value") != header).select(
        F.split(F.trim("value"), r"\s+").alias("t")
    )
    pairs = toks.where(F.size("t") >= 2).select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
        F.when(F.size("t") >= 3, F.element_at("t", 3).cast("double"))
        .otherwise(F.lit(1.0))
        .alias("weight"),
    )
    if nnz > 0 and not pairs.limit(1).count():
        raise ValueError(f"MatrixMarket file {path}: header says nnz={nnz} "
                         "but no entry lines parsed")
    if not weighted:
        return canonical_edges(pairs)
    s, d = F.col("src"), F.col("dst")
    return (
        pairs.select(
            F.least(s, d).alias("src"), F.greatest(s, d).alias("dst"), "weight"
        )
        .where(F.col("src") != F.col("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
