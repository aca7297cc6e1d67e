"""SQ8 scalar-quantized similarity (functions/similarity.py r4): the
4-8x-smaller-scan tier for 100 TB similarity search, with exact rerank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.similarity import (
    brute_force_topk,
    quantize_embeddings,
    quantized_topk,
)


def _emb_df(spark, sf_dir="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_are_one_byte_per_dim_and_deterministic(spark):
    emb = _emb_df(spark)
    dim = len(emb.select("embedding").first()[0])
    q = quantize_embeddings(emb)
    rows = {r.vec_id: (bytes(r.codes), r.code_norm) for r in q.collect()}
    rows2 = {r.vec_id: (bytes(r.codes), r.code_norm)
             for r in quantize_embeddings(emb.repartition(7)).collect()}
    assert rows == rows2  # partitioning-invariant
    assert all(len(c) == dim for c, _ in rows.values())  # 1 byte/dim


def test_codes_match_numpy_definition(spark):
    emb = _emb_df(spark).limit(20)
    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    for r in quantize_embeddings(emb).collect():
        v = orig[r.vec_id]
        want = np.round(v / np.abs(v).max() * 127.0).astype(np.int8)
        got = np.frombuffer(bytes(r.codes), dtype=np.int8)
        assert np.array_equal(got, want)
        assert r.code_norm == pytest.approx(
            float(np.sqrt((want.astype(np.int64) ** 2).sum())))


def test_quantized_with_rerank_high_recall_vs_brute_force(spark):
    emb = _emb_df(spark)
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in quantized_topk(emb, queries, k=5, rerank=True).collect()}
    recall = len(exact & got) / len(exact)
    # int8 over 64-dim unit-ish vectors: candidate sets of 4k almost
    # always contain the true top-k
    assert recall >= 0.9, recall


def test_quantized_rerank_scores_are_exact(spark):
    """Reranked cos_sim must equal the brute-force score for every pair
    both report (the rerank path uses full-precision embeddings)."""
    emb = _emb_df(spark)
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in brute_force_topk(emb, queries, k=5).collect()}
    for r in quantized_topk(emb, queries, k=5, rerank=True).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.cos_sim == exact[key]


def test_quantized_no_rerank_still_reasonable(spark):
    emb = _emb_df(spark)
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in quantized_topk(emb, queries, k=5, rerank=False).collect()}
    assert len(exact & got) / len(exact) >= 0.8


def test_zero_norm_vectors_dropped(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    ids = {r.vec_id for r in quantize_embeddings(emb).collect()}
    assert ids == {1, 3}
