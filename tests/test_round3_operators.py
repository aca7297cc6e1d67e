"""Round-3 operator tests: level G0/G1 split, incremental k-truss,
streaming triangle maintenance, PPR seed DataFrame, tier-dispatched
near-dup clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TINY, make_edges


# ---------------------------------------------------------------- level split


def _hub_fixture(spark):
    """Low-k hubby graph (the VERDICT r2 fixture): root 0 fans out to hub 1
    and spokes 2..N+1, so every hub-spoke edge is HORIZONTAL (all at BFS
    level 1) — the regime where the r2 single-kernel wedge join paid
    Σ_horiz deg(hub). Known triangles: one all-horizontal among spokes
    (2,3,4 clique edges) and the 1-horizontal (0,1,2)."""
    n_spokes = 1000
    pairs = [(0, 1)] + [(0, x) for x in range(2, n_spokes + 2)]
    pairs += [(1, x) for x in range(2, n_spokes + 2)]  # horizontal hub edges
    pairs += [(2, 3), (3, 4), (2, 4)]  # all-horizontal triangle
    return make_edges(spark, pairs)


def test_level_split_correct_on_hub_fixture(spark):
    from triangle_counting_spark.operators.triangles import triangle_count

    e = _hub_fixture(spark)
    want = triangle_count(e, "sql").collect()[0]["triangles"]
    got = triangle_count(e, "level").collect()[0]["triangles"]
    assert got == want


def test_level_split_collapses_hub_wedge_volume(spark):
    """The G1 kernel enumerates only CROSS neighbors: on the hub fixture the
    wedge-row volume must collapse ≥10× vs the r2 all-neighbors join
    (VERDICT r2 'done' criterion)."""
    from triangle_counting_spark.operators.bfs import bfs_levels
    from triangle_counting_spark.operators.orientation import (
        DST,
        SRC,
        canonical_edges,
        symmetrize,
    )

    ce = canonical_edges(_hub_fixture(spark))
    lv = bfs_levels(ce).select("v", "level")
    l_src = lv.select(F.col("v").alias(SRC), F.col("level").alias("level_src"))
    l_dst = lv.select(F.col("v").alias(DST), F.col("level").alias("level_dst"))
    labeled = ce.join(l_src, SRC).join(l_dst, DST)
    horiz = labeled.where(F.col("level_src") == F.col("level_dst")).select(SRC, DST)
    cross = labeled.where(F.col("level_src") != F.col("level_dst")).select(SRC, DST)
    old_rows = horiz.join(
        symmetrize(ce).select(SRC, F.col(DST).alias("x")), SRC
    ).count()
    new_rows = horiz.join(
        symmetrize(cross).select(SRC, F.col(DST).alias("x")), SRC
    ).count()
    assert new_rows * 10 <= old_rows, (old_rows, new_rows)


@pytest.mark.parametrize("name", ["triangle", "K5", "bowtie", "two_triangles"])
def test_level_split_tiny(spark, name):
    from triangle_counting_spark.operators.triangles import triangle_count

    pairs, want, _ = TINY[name]
    got = triangle_count(make_edges(spark, pairs), "level").collect()[0]["triangles"]
    assert got == want


# ------------------------------------------------------- incremental k-truss


def test_ktruss_incremental_matches_full_recompute(spark):
    """The incremental peel must produce the same fixpoint as recomputing
    support for every edge each round (the r2 semantics)."""
    from triangle_counting_spark.operators.orientation import (
        DST,
        SRC,
        canonical_edges,
    )
    from triangle_counting_spark.operators.subgraphs import (
        _edge_support,
        ktruss_edges,
    )
    from triangle_counting_spark.sources.rmat import rmat_edges

    edges = rmat_edges(spark, scale=9, edge_factor=6, seed=5)
    for k in (3, 4, 5):
        got = {
            (r[SRC], r[DST]) for r in ktruss_edges(edges, k).collect()
        }
        # reference fixpoint: full recompute every round
        cur = canonical_edges(edges).localCheckpoint(eager=True)
        m = cur.count()
        while m:
            nxt = (
                _edge_support(cur)
                .where(F.col("support") >= k - 2)
                .select(SRC, DST)
                .localCheckpoint(eager=True)
            )
            m2 = nxt.count()
            cur = nxt
            if m2 == m:
                break
            m = m2
        want = {(r[SRC], r[DST]) for r in cur.collect()}
        assert got == want, f"k={k}"


# ------------------------------------------- streaming triangle maintenance


def test_streaming_triangle_count_matches_batch(spark, tmp_path):
    """N insert micro-batches end with the exact batch count (VERDICT r2
    item 3's 'done' criterion)."""
    from triangle_counting_spark.operators.triangles import triangle_count
    from triangle_counting_spark.streaming.triangles import (
        run_triangle_stream_demo,
    )
    from triangle_counting_spark.sources.rmat import rmat_edges

    edges = rmat_edges(spark, scale=8, edge_factor=8, seed=9)
    want = triangle_count(edges, "sql").collect()[0]["triangles"]
    out = run_triangle_stream_demo(
        spark, edges, str(tmp_path / "tstate"), n_batches=3
    )
    assert out["batches"] >= 3
    assert out["total"] == want


def test_streaming_triangle_count_dedups_replayed_edges(spark, tmp_path):
    """Edges replayed in a later micro-batch must not double-count."""
    from triangle_counting_spark.streaming.triangles import (
        make_triangle_maintainer,
    )

    state = str(tmp_path / "replay")
    process = make_triangle_maintainer(state)
    tri = make_edges(spark, TINY["triangle"][0])
    process(tri, 0)
    process(tri, 1)  # exact replay — zero new edges
    ledger = spark.read.parquet(f"{state}/counts").orderBy("batch_id").collect()
    assert [r["added"] for r in ledger] == [1, 0]
    assert ledger[-1]["total"] == 1


def test_streaming_triangle_maintainer_crash_replay_idempotent(spark, tmp_path):
    """At-least-once semantics: re-running a batch — including after a
    simulated crash between the edges write and the counts write — must
    leave the ledger identical (all writes are per-batch overwrites)."""
    import shutil

    from triangle_counting_spark.streaming.triangles import (
        make_triangle_maintainer,
    )

    state = str(tmp_path / "crash")
    process = make_triangle_maintainer(state)
    k4 = make_edges(spark, TINY["K4"][0])
    tri = make_edges(spark, TINY["triangle"][0])
    process(k4, 0)
    process(tri, 1)

    def ledger():
        return [
            (r["batch_id"], r["added"], r["total"])
            for r in spark.read.option("basePath", f"{state}/counts")
            .parquet(f"{state}/counts")
            .orderBy("batch_id")
            .collect()
        ]

    want = ledger()
    # full replay of the last batch (checkpoint lost its commit)
    process(tri, 1)
    assert ledger() == want
    # crash AFTER the edges write, BEFORE the counts write: wipe the batch's
    # counts dir and replay — the edges/batch=1 dir still exists, which is
    # exactly the state the old append-based layout corrupted on
    shutil.rmtree(f"{state}/counts/batch=1")
    process(tri, 1)
    assert ledger() == want


# ------------------------------------------------------- PPR seed DataFrame


def test_ppr_seed_dataframe_matches_list(spark):
    from triangle_counting_spark.operators.pagerank import pagerank_fixed

    e = make_edges(spark, TINY["bowtie"][0])
    seeds_df = spark.createDataFrame([(0,), (3,)], "v long")
    by_list = {
        r["v"]: r["rank"]
        for r in pagerank_fixed(e, 8, personalized_for=[0, 3]).collect()
    }
    by_df = {
        r["v"]: r["rank"]
        for r in pagerank_fixed(e, 8, personalized_for=seeds_df).collect()
    }
    assert set(by_list) == set(by_df)
    for v in by_list:
        assert abs(by_list[v] - by_df[v]) < 1e-12


def test_ppr_large_seed_set_plans_fast(spark):
    """10^5 seeds as a DataFrame must not bloat the plan (the isin form
    grows linearly with the seed count) — planning+run in seconds."""
    import time

    from triangle_counting_spark.operators.pagerank import pagerank_fixed
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=10, edge_factor=8, seed=2)
    seeds = spark.range(0, 100_000).select(F.col("id").alias("v"))
    t0 = time.time()
    out = pagerank_fixed(e, 2, personalized_for=seeds)
    n = out.count()
    assert n > 0
    assert time.time() - t0 < 30.0


# ------------------------------------------- tier-dispatched near-dup CC


def test_neardup_clusters_uses_blocked_tier(spark, monkeypatch):
    """The pairs graph is small after thresholding, so the dispatcher must
    route CC to the blocked tier (VERDICT r2 item 4): the shuffle-tier CC
    must NOT be called."""
    import triangle_counting_spark.operators.components as comp_mod
    from triangle_counting_spark.functions.dedup import neardup_clusters

    def boom(*a, **k):  # noqa: ANN001, ANN002, ANN003
        raise AssertionError("shuffle-tier CC called for a small pairs graph")

    monkeypatch.setattr(comp_mod, "connected_components", boom)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "a b c d e g"),
            (4, "x y z w q r"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["cluster_keep_id"]
        for r in neardup_clusters(docs, "text", "doc_id", threshold=0.4).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4
