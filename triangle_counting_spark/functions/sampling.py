"""Deterministic sampling and dataset splits for training pipelines.

Every assignment is a pure function of (row key, seed) via an md5 bucket —
no RNG state, no partition-order dependence — so a split is reproducible
across runs, cluster sizes, and engines (the exact buckets replay in ANSI
SQL: ``('0x' || substr(md5(k), 1, 8))::BIGINT % 10000``). That is the
property a 100 TB train/valid/test split actually needs: adding executors
or re-reading the table can never move a document across splits.

All-JVM expressions (md5/conv/case), zero shuffles: splitting and
sampling are pure maps over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def split_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, 10000) from md5(key ':' seed) — the shared
    primitive under ``hash_split`` / ``stratified_sample``."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split with
    the given weights (normalized; resolution 1/10000). Deterministic in
    (id, seed): the same document lands in the same split on every run
    and at every cluster size."""
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with positive sum: {weights}")
    b = split_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = b < int(round(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsample (``sampleBy`` semantics, but
    reproducible): keep a row iff its md5 bucket < fraction(stratum) ·
    10000. Strata absent from ``fractions`` use ``default_fraction``."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} out of [0,1]: {v}")
    b = split_bucket(F.col(id_col), seed)
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        lit = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    default = F.lit(int(round(default_fraction * _BUCKETS)))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.where(b < thresh)


# --------------------------------------------------------------- shards
#
# The WRITE side of a training pipeline: a global deterministic sample
# shuffle into fixed shards, an auditable per-shard manifest, and a
# read-back verifier. Same discipline as hash_split: every assignment is
# a pure function of (row key, seed), so shard membership and intra-shard
# order survive re-runs, repartitioning, and cluster-size changes — and
# the manifest digest is a COMMUTATIVE fold (bit_xor of a per-row md5
# prefix), so it aggregates map-side in bounded memory at any scale and
# replays in ANSI SQL: bit_xor(('0x' || substr(md5(k), 1, 15))::BIGINT).


def _row_digest(key: Column) -> Column:
    """60-bit per-row digest from the md5 prefix — shared by the Spark
    manifest and the DuckDB replay (15 hex chars keep the BIGINT cast
    overflow-free on both engines)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Add ``shard`` (long in [0, n_shards)) and ``sort_key`` (md5 hex)
    columns — the global training shuffle. Zero shuffles: both are pure
    JVM expressions over the scan; the actual data movement happens once,
    inside :func:`write_training_shards`. Shard balance is md5-uniform
    regardless of id distribution (the skew-proofing the dedup family
    gets from xxhash64 bucketing)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#" + seed)))
    return df.withColumn(
        "shard", F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).withColumn("sort_key", key)


def shard_manifest(
    sharded: DataFrame, id_col: str = "doc_id", content_col: str | None = None
) -> DataFrame:
    """(shard, rows, digest[, content_bytes]) — one row per shard. The
    digest xor-folds each row's md5-prefix (id when ``content_col`` is
    None, else id:content — the per-row content audit the north rule's
    sha256 invariant asks for, in aggregate form). One shuffle, partial
    aggregation map-side; memory per task is O(1) per shard."""
    key = (
        F.col(id_col).cast("string")
        if content_col is None
        else F.concat_ws(":", F.col(id_col).cast("string"), F.col(content_col))
    )
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(_row_digest(key)).alias("digest"),
    ]
    if content_col is not None:
        aggs.append(
            F.sum(F.length(F.col(content_col))).cast("long").alias("content_bytes")
        )
    return sharded.groupBy("shard").agg(*aggs)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    content_col: str | None = None,
    seed: str = "",
) -> DataFrame:
    """Shuffle ``df`` into ``n_shards`` deterministic shards under
    ``path`` (one directory per shard via ``partitionBy``) and return the
    manifest, also persisted at ``path + "/_manifest"``.

    Layout choices, 100 TB honest: ``repartition(n_shards, shard)`` gives
    one task per shard-hash bucket (AQE may coalesce empties);
    ``sortWithinPartitions(sort_key, id)`` fixes intra-file row order
    without a global rank (no window, no skew pivot), so two runs of the
    same input produce byte-stable row sequences per shard. The manifest
    is computed from the INPUT expressions, and :func:`verify_shards`
    recomputes it from the files on disk — write-path corruption surfaces
    as a digest mismatch, the checkpoint-audit discipline of the
    iterative operators applied to the sink."""
    sharded = shuffle_shards(df, n_shards, id_col=id_col, seed=seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    manifest = shard_manifest(sharded, id_col=id_col, content_col=content_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/_manifest")
    return manifest


def verify_shards(
    spark,
    path: str,
    id_col: str = "doc_id",
    content_col: str | None = None,
) -> DataFrame:
    """(shard, rows_match, digest_match[, bytes_match]) — recompute the
    manifest from the written files and compare to the persisted one.
    FULL OUTER join so a shard missing on either side shows up as a
    mismatch row instead of vanishing."""
    written = spark.read.parquet(path)
    actual = shard_manifest(written, id_col=id_col, content_col=content_col)
    expected = spark.read.parquet(path + "/_manifest")
    a, e = actual.alias("a"), expected.alias("e")
    cols = [
        F.coalesce(F.col("a.shard"), F.col("e.shard")).alias("shard"),
        (F.col("a.rows") == F.col("e.rows")).alias("rows_match"),
        (F.col("a.digest") == F.col("e.digest")).alias("digest_match"),
    ]
    if content_col is not None:
        cols.append(
            (F.col("a.content_bytes") == F.col("e.content_bytes")).alias(
                "bytes_match"
            )
        )
    return a.join(e, F.col("a.shard") == F.col("e.shard"), "full_outer").select(
        *cols
    )
