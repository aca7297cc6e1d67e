"""Round-4 fixes: ADVICE r3 items + VERDICT r3 #4 (clustering double scan)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges


def _path_edges(spark, n):
    return make_edges(spark, [(i, i + 1) for i in range(n)])


def test_sssp_warns_when_max_iter_exhausted(spark):
    from triangle_counting_spark.operators.distances import sssp

    e = _path_edges(spark, 20).withColumn("weight", F.lit(1.0))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = sssp(e, root=0, max_iter=3, tier="shuffle").collect()
    assert any("max_iter" in str(x.message) for x in w), (
        "exhausted max_iter must warn, not silently return partial distances"
    )
    # and the partial result really is partial — the far end is missing
    assert len(out) < 21


def test_sssp_converges_within_oracle_budget(spark):
    """The driver oracle unrolls 16 Bellman-Ford rounds (ADVICE r3): the
    engine must converge within that budget on the gate fixture graph —
    pinned here at sf0.001 so a fixture change surfaces as a clear test
    failure, not a confusing gate hash mismatch."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(sf):
        pytest.skip("testdata missing")
    from triangle_counting_spark.operators.distances import sssp
    from triangle_counting_spark.sources.edges import cooccurrence_weighted_edges

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    we = cooccurrence_weighted_edges(li, "l_orderkey", "l_partkey")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        full = sssp(we, max_iter=16, tier="shuffle").collect()
    assert not any("max_iter" in str(x.message) for x in w), (
        "engine needs more rounds than the gate oracle unrolls"
    )
    assert len(full) > 0


def test_sampled_distances_warns_when_max_iter_exhausted(spark):
    from triangle_counting_spark.operators.distances import sampled_distances

    e = _path_edges(spark, 30)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sampled_distances(e, n_roots=1, max_iter=2, tier="shuffle").collect()
    assert any("max_iter" in str(x.message) for x in w)


def test_ivf_topk_ignores_zero_norm_vectors(spark):
    """A zero embedding must be excluded (as ivf_centroids does), not
    divide by zero into NaN cos_sim rows (ADVICE r3)."""
    import math

    from triangle_counting_spark.functions.similarity import ivf_topk

    rows = [(i, [float(i + 1), 1.0, 0.5]) for i in range(12)]
    rows.append((99, [0.0, 0.0, 0.0]))  # degenerate corpus vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(
        emb, emb.where(F.col("vec_id") < 2), k=3, n_centroids=2, n_probe=2
    ).collect()
    assert len(out) > 0
    assert all(not math.isnan(r.cos_sim) for r in out)
    assert all(r.neighbor_id != 99 for r in out)
    # a zero-norm QUERY is likewise dropped, not NaN'd
    zq = ivf_topk(
        emb, emb.where(F.col("vec_id") == 99), k=3, n_centroids=2, n_probe=2
    ).collect()
    assert zq == []


def test_streaming_edge_log_legacy_layout_raises(spark, tmp_path):
    """A readable edge log WITHOUT the batch= partition column (pre-r3
    flat layout) must fail loudly — silently treating prior edges as
    absent resets dedup and the running total (ADVICE r3)."""
    from triangle_counting_spark.streaming.triangles import _read_edges

    flat = str(tmp_path / "edges")
    spark.createDataFrame([(1, 2)], "src long, dst long").write.parquet(flat)
    with pytest.raises(ValueError, match="batch"):
        _read_edges(spark, flat)
    # absent and empty dirs are still the clean first-batch state
    assert _read_edges(spark, str(tmp_path / "nope")) is None
    (tmp_path / "empty").mkdir()
    assert _read_edges(spark, str(tmp_path / "empty")) is None


def test_clustering_coefficient_single_canonicalization(spark):
    from triangle_counting_spark.operators.triangles import clustering_coefficient

    k4 = make_edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = clustering_coefficient(k4).collect()[0]["global_clustering"]
    assert got == pytest.approx(1.0)  # K4: 3*4 triangles / 12 wedges
    path = _path_edges(spark, 3)
    got = clustering_coefficient(path).collect()[0]["global_clustering"]
    assert got == pytest.approx(0.0)


def test_level_banded_g1_is_exact(spark):
    """Forcing the banded G1 wedge join (the RMAT-22 shuffle-wall fix:
    horizontal edges split into K hash-bands, one bounded join per band)
    must give the same exact count as the single-shot join and as bcast —
    bands partition the horizontal edges, so every 1-horizontal triangle
    is counted in exactly one band."""
    from triangle_counting_spark.operators.triangles import triangle_count
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=10, edge_factor=8, seed=7)
    want = triangle_count(e, "bcast").collect()[0]["triangles"]
    confs = {"spark.tcs.levelBands": "7"}
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        got = triangle_count(e, "level").collect()[0]["triangles"]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got == want


def test_max_result_size_matches_blocked_tier_model(spark, monkeypatch):
    """The session factory must size spark.driver.maxResultSize to the
    same heap-derived model as the planner's blocked-tier cutoff — Spark's
    1 GiB default kills the sanctioned blocked-tier collect at ~62M+
    edges (measured at RMAT-22)."""
    from triangle_counting_spark.session import _max_result_bytes

    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "48g")
    assert _max_result_bytes() == 48 * 1024**3 // 8
    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "8g")
    assert _max_result_bytes() == 2 * 1024**3  # floor
    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "bogus")
    assert _max_result_bytes() == 2 * 1024**3
    # and the live session carries it (≥ the 2 GiB floor, not Spark's 1g)
    assert int(spark.conf.get("spark.driver.maxResultSize").rstrip("b")) >= 2 * 1024**3 or \
        spark.conf.get("spark.driver.maxResultSize") == str(2 * 1024**3)


def test_ngram_vocabulary_positional_and_idless(spark):
    """id_col must stay keyword-only so the historical positional call
    (docs, n, text_col, min_count) keeps working, and a corpus without a
    doc_id column must count each row as its own document."""
    from triangle_counting_spark.functions.text import ngram_vocabulary

    docs = spark.createDataFrame([("a b c",), ("b c",)], ["text"])
    # positional min_count in the 4th slot
    out = {r.ngram for r in ngram_vocabulary(docs, 2, "text", 2).collect()}
    assert out == {"b c"}
    # id-less corpus: n_docs counts rows, not one synthetic doc
    rows = {r.ngram: (r.n_occurrences, r.n_docs)
            for r in ngram_vocabulary(docs, 2).collect()}
    assert rows == {"a b": (1, 1), "b c": (2, 2)}


def test_profile_table_quoted_column_name(spark):
    """profile_table builds stack() via the Column API, so column names
    with SQL-significant characters (quotes) profile instead of raising
    a ParseException."""
    from triangle_counting_spark.functions.profile import profile_table

    df = spark.createDataFrame([(1, "x"), (2, None)], ["a", "it's_flag"])
    out = {r.col_name: (r.n_rows, r.n_nulls) for r in profile_table(df).collect()}
    assert out == {"a": (2, 0), "it's_flag": (2, 1)}


def test_hourly_bucket_floors_pre_epoch_timestamps(spark):
    """hour_epoch must FLOOR (like date_trunc), not truncate toward zero:
    an event 30 min before the epoch belongs to the -3600 hour, not 0."""
    import datetime as dt

    from triangle_counting_spark.functions.events import hourly_event_stats

    events = spark.createDataFrame(
        [
            (1, "c", 1.0, dt.datetime(1969, 12, 31, 23, 30, 0), 10),
            (2, "c", 1.0, dt.datetime(1970, 1, 1, 0, 30, 0), 11),
        ],
        "event_id long, event_type string, value double, ts timestamp_ntz, user_id long",
    )
    out = {r.hour_epoch for r in hourly_event_stats(events).collect()}
    assert out == {-3600, 0}
