"""Training-shard sink (functions/sampling.py shards section): global
deterministic shuffle + auditable manifest + read-back verify.

Pins the properties a 100 TB sink needs: partition-invariant shard
assignment, byte-stable intra-shard order, a DuckDB-replayable digest,
and a verifier that catches corruption (not just happy-path equality).
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.sampling import (
    shard_manifest,
    shuffle_shards,
    verify_shards,
    write_training_shards,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.format_string("doc body %d", F.col("id")).alias("text"),
    )


def test_shard_assignment_partition_invariant(spark):
    d = _docs(spark)
    a = {
        (r.doc_id, r.shard)
        for r in shuffle_shards(d, 16, seed="s1").select("doc_id", "shard").collect()
    }
    b = {
        (r.doc_id, r.shard)
        for r in shuffle_shards(d.repartition(13), 16, seed="s1")
        .select("doc_id", "shard")
        .collect()
    }
    assert a == b
    shards = {s for _, s in a}
    assert shards == set(range(16))  # every shard populated at n=500


def test_shard_balance_md5_uniform(spark):
    counts = (
        shuffle_shards(_docs(spark, 2000), 8)
        .groupBy("shard")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in counts]
    assert len(sizes) == 8
    # md5-uniform: no shard further than 35% from the mean at n=2000
    mean = sum(sizes) / 8
    assert all(abs(s - mean) / mean < 0.35 for s in sizes)


def test_shuffle_shards_plan_is_jvm_only(spark):
    plan = (
        shuffle_shards(_docs(spark), 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # zero shuffles: pure map over the scan


def test_manifest_digest_replays_in_duckdb(spark):
    d = _docs(spark, 300)
    sharded = shuffle_shards(d, 4, seed="x")
    got = {
        r.shard: (r.rows, r.digest)
        for r in shard_manifest(sharded, content_col="text").collect()
    }
    pdf = sharded.select("doc_id", "text", "shard").toPandas()
    want = {
        int(r["shard"]): (int(r["rows"]), int(r["digest"]))
        for _, r in duckdb.sql(
            """
            SELECT shard, COUNT(*) AS rows,
                   bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT) AS digest
            FROM pdf GROUP BY shard
            """
        ).df().iterrows()
    }
    assert got == want


def test_write_verify_roundtrip_and_order_stability(spark, tmp_path):
    d = _docs(spark, 400)
    p = str(tmp_path / "shards")
    write_training_shards(d, p, 8, content_col="text", seed="v")
    checks = verify_shards(spark, p, content_col="text").collect()
    assert len(checks) == 8
    assert all(r.rows_match and r.digest_match and r.bytes_match for r in checks)
    # intra-shard row order is byte-stable: re-write to a second path and
    # compare the ordered id sequence of one shard file-read
    p2 = str(tmp_path / "shards2")
    write_training_shards(d, p2, 8, content_col="text", seed="v")
    seq1 = [r.doc_id for r in spark.read.parquet(p + "/shard=3").collect()]
    seq2 = [r.doc_id for r in spark.read.parquet(p2 + "/shard=3").collect()]
    assert seq1 == seq2 and len(seq1) > 0


def test_verify_catches_corruption(spark, tmp_path):
    import glob
    import os

    d = _docs(spark, 200)
    p = str(tmp_path / "shards")
    write_training_shards(d, p, 4, content_col="text")
    # corrupt: delete one shard's data files entirely
    victim = glob.glob(p + "/shard=2/*.parquet")
    assert victim
    for f in victim:
        os.remove(f)
    checks = {r.shard: r for r in verify_shards(spark, p, content_col="text").collect()}
    bad = checks[2]
    assert not (bad.rows_match and bad.digest_match)
    assert checks[0].rows_match and checks[0].digest_match


def test_n_shards_validation(spark):
    with pytest.raises(ValueError):
        shuffle_shards(_docs(spark, 5), 0)
