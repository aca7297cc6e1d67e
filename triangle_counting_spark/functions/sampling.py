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
