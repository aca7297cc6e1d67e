"""IVF ANN (functions/similarity.py:ivf_topk) — the second ANN scale path.

Exactness: probing every inverted list (n_probe == n_centroids) must
reproduce the brute-force ranking bit-for-bit (that config is the gate
oracle). Lossy configs: measured recall vs brute force on a clustered
corpus, where probing the single nearest list already finds same-cluster
neighbors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.similarity import (
    brute_force_topk,
    ivf_centroids,
    ivf_topk,
)


def _clustered_emb(spark, n_clusters=4, per_cluster=20, dim=16, seed=5):
    """Well-separated gaussian blobs on the sphere — IVF's home turf."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + rng.normal(scale=0.08, size=dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, cluster long, embedding array<double>")


def test_ivf_exhaustive_probe_equals_brute_force(spark):
    emb = _clustered_emb(spark).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % 10 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    ivf = ivf_topk(emb, queries, k=5, n_centroids=6, n_probe=6).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.neighbor_id, r.cos_sim) for r in rows)
    assert key(ivf) == key(exact)


def test_ivf_lossy_probe_recall_on_clusters(spark):
    """n_probe=1 on blob data: the quantizer routes each query to its own
    blob's list, so top-k recall vs brute force stays high (all true
    neighbors share the query's cluster by construction)."""
    df = _clustered_emb(spark)
    emb = df.select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % 7 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=4, n_probe=1).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f}"


def test_ivf_centroids_deterministic_and_unit_norm(spark):
    emb = _clustered_emb(spark).select("vec_id", "embedding")
    C1 = ivf_centroids(emb, n_centroids=4, lloyd_iters=2)
    C2 = ivf_centroids(emb.repartition(5), n_centroids=4, lloyd_iters=2)
    assert C1.shape == (4, 16)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
    # seeded init + order-insensitive partial-sum agg → same centroids to
    # float-sum noise at any partitioning
    assert np.allclose(C1, C2, atol=1e-9)


def test_ivf_fewer_vectors_than_centroids(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(emb, emb, k=2, n_centroids=8, n_probe=8).collect()
    exact = brute_force_topk(emb, emb, k=2).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in out} == {
        (r.query_id, r.rank, r.neighbor_id) for r in exact
    }


def test_ivf_empty_corpus_clear_error(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="positive norm"):
        ivf_centroids(empty, n_centroids=4)
    zero = spark.createDataFrame([(0, [0.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="positive norm"):
        ivf_centroids(zero, n_centroids=4)
