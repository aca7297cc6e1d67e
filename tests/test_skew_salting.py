"""Skew salting of the co-occurrence self-join (VERDICT r1 item 7).

µ+2σ heavy-group criterion (notebook cell 10); heavy groups split into S
salt buckets so the mega-repo's pair stream spreads over S reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from triangle_counting_spark.sources.edges import cooccurrence_edges
from triangle_counting_spark.sources.files import skew_fixture


def test_salted_edges_identical_to_unsalted(spark):
    files = skew_fixture(spark, mega_files=300)
    verts = files.select("repo", F.xxhash64("repo", "path").alias("fid"))
    plain = cooccurrence_edges(verts, "repo", "fid")
    salted = cooccurrence_edges(verts, "repo", "fid", salt_heavy=8)
    a = {(r.src, r.dst) for r in plain.collect()}
    b = {(r.src, r.dst) for r in salted.collect()}
    assert a == b and len(a) > 300 * 299 // 2


def test_salting_splits_the_hot_join_key(spark):
    """The reducer work unit is the join key: unsalted, the mega-repo is ONE
    key carrying C(k,2) pairs; salted, its max key bucket shrinks ~S-fold.
    (This is the per-key row evidence BASELINE.md cites.)"""
    files = skew_fixture(spark, mega_files=300)
    verts = files.select("repo", F.xxhash64("repo", "path").alias("fid"))
    base = verts.select(F.col("repo").alias("g"), F.col("fid").alias("i")).distinct()

    def max_key_rows(salts: int | None) -> int:
        if salts is None:
            a = base.select("g", F.col("i").alias("src"))
            b = base.select("g", F.col("i").alias("dst"))
            j = a.join(b, "g").where(F.col("src") < F.col("dst")).groupBy("g")
        else:
            sizes = base.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
            thr = sizes.agg(
                F.avg("n") + 2 * F.coalesce(F.stddev_pop("n"), F.lit(0.0))
            ).collect()[0][0]
            heavy = sizes.where(F.col("n") > thr).select("g")
            hb = base.join(heavy, "g", "left_semi")
            a = hb.select(
                "g", F.pmod(F.xxhash64("i"), F.lit(salts)).alias("salt"),
                F.col("i").alias("src"),
            )
            b = hb.select(
                "g", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))).alias("salt"),
                F.col("i").alias("dst"),
            )
            j = (
                a.join(b, ["g", "salt"])
                .where(F.col("src") < F.col("dst"))
                .groupBy("g", "salt")
            )
        return j.agg(F.count(F.lit(1)).alias("c")).agg(F.max("c")).collect()[0][0]

    hot = max_key_rows(None)
    split = max_key_rows(8)
    assert hot == 300 * 299 // 2  # the mega-repo is one reducer's work
    # salted: each of the 8 buckets carries ~1/8 of the pairs
    assert split < hot / 4, (hot, split)
