"""Plan audits: column pruning, filter pushdown, codegen — the 100 TB
lenses asserted on real physical plans, not eyeballed.

A scan that reads all 16 lineitem columns for a 2-column co-occurrence
derivation is wrong at any scale; these tests pin the properties so a
refactor that silently breaks pruning/pushdown fails CI.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_edge_derivation_prunes_lineitem_columns(spark):
    from triangle_counting_spark.sources.edges import cooccurrence_edges

    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = _plan(cooccurrence_edges(lineitem, "l_orderkey", "l_partkey"))
    # every parquet scan in the plan must read ONLY the two join columns
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:")[1]
            assert "l_orderkey" in schema and "l_partkey" in schema
            assert "l_comment" not in schema and "l_extendedprice" not in schema


def test_query_filter_reaches_parquet_scan(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(emb.where(F.col("vec_id") < 10).select("vec_id"))
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("LessThan(vec_id,10)" in l for l in pushed), pushed


def test_text_stats_is_whole_stage_codegen(spark):
    from triangle_counting_spark.functions.text import quality_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_scores(docs))
    # the pure-expression pipeline claim: no Python evaluation in the plan,
    # and the projection runs inside a codegen stage (the "*(n)" marker in
    # executedPlan().toString())
    assert "*(" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_brute_force_topk_broadcasts_query_side(spark):
    from triangle_counting_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantized_topk_rerank_broadcasts_query_side(spark):
    from triangle_counting_spark.functions.similarity import quantized_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(quantized_topk(emb, emb.where(F.col("vec_id") < 5), k=3))
    # the exact-rerank join ships the tiny query side by broadcast, and
    # the int8 scan stays Arrow-batched (MapInPandas), never per-row
    # Python eval
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
