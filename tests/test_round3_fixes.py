"""Regression tests for the round-3 ADVICE fixes."""

from __future__ import annotations

import pytest

from tests.conftest import TINY, make_edges


def test_graph_pagerank_rejects_directed_and_weight(spark):
    """Graph canonicalizes edges, so directed/weighted PageRank through the
    facade would silently be wrong — it must refuse (ADVICE r2 #1)."""
    from triangle_counting_spark.graph import Graph

    g = Graph(make_edges(spark, TINY["K4"][0]))
    with pytest.raises(ValueError, match="directed"):
        g.pagerank(directed=True)
    with pytest.raises(ValueError, match="weight_col"):
        g.pagerank(weight_col="w")


def test_graph_pagerank_personalized_still_works(spark):
    """Personalization is a vertex set, unaffected by canonicalization —
    it must keep working through the facade (routed to the shuffle tier)."""
    from triangle_counting_spark.graph import Graph

    g = Graph(make_edges(spark, TINY["K4"][0]))
    res = g.pagerank(personalized_for=[0], max_iter=5)
    rows = {r["v"]: r["rank"] for r in res.state.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0] > rows[1]  # mass concentrates on the seed


def test_estimate_p_one_is_exact(spark):
    """p >= 1.0 must sample EVERY edge (the old strict-< against 'ffffff'
    could drop edges hashing to the max prefix; ADVICE r2 #3)."""
    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_estimate,
    )

    e = make_edges(spark, TINY["K5"][0])
    exact = triangle_count(e, "sql").collect()[0]["triangles"]
    est = triangle_count_estimate(e, p=1.0).collect()[0]
    assert est["triangles_estimate"] == exact
    assert est["sampled_triangles"] == exact


def test_streaming_dedup_uses_watermark_bounded_state(spark):
    """The dedup stream must build on dropDuplicatesWithinWatermark so
    per-key state evicts once the watermark passes (ADVICE r2 #2): the
    analyzed plan carries the within-watermark dedup node, not the
    unbounded plain dedup."""
    from pyspark.sql import functions as F

    from triangle_counting_spark.streaming.events import streaming_exact_dedup

    df = spark.createDataFrame(
        [("a", "2026-01-01 00:00:00")], "text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = streaming_exact_dedup(df)._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan


def test_labelprop_cli_passes_weight_col(spark, tmp_path):
    """jobs/run.py --job labelprop --weight-col must actually run weighted
    label propagation (ADVICE r2 #4) — verified by source wiring."""
    import inspect

    import jobs.run as run_mod

    src = inspect.getsource(run_mod.main)
    lp_call = src.split("label_propagation(")[1].split(")")[0]
    assert "weight_col=args.weight_col" in lp_call


def test_embedding_blocked_chunks_rows(spark):
    """The blocked kernel must chunk each slice's rows so the dense score
    block stays bounded (ADVICE r2 #5) — and still match allpairs."""
    import numpy as np

    from triangle_counting_spark.functions.similarity import (
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((12, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + 0.01 * rng.standard_normal(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.9, method="allpairs").collect()
    }
    assert got == want and len(want) >= 12
