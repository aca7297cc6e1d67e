"""LSH recall at LOSSY configs vs the analytic bounds.

The gate oracles pin configs where recall is exact; these properties cover
the configs a 100 TB run would actually use — fewer bands / planes than
needed for exactness — and assert the measured recall against brute force
is at least the textbook probability bound:

- MinHash banded LSH: P(candidate | jaccard s) = 1 - (1 - s^r)^b
- Hyperplane LSH:     P(candidate | angle θ)   = 1 - (1 - (1-θ/π)^p)^t

Both pipelines are deterministic in their seeds, so the measured recall is
a fixed number; the assertions leave a 3σ binomial margin under the bound
so the test documents the guarantee rather than a lucky draw.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


def _doc_corpus(spark, n_docs: int = 60, seed: int = 11):
    """Docs built from a shared vocabulary so pair Jaccards spread over
    (0.2, 1.0): doc i+offset shares a prefix of doc i's words."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    base_words = []
    for i in range(n_docs):
        words = list(rng.choice(vocab, size=30, replace=False))
        base_words.append(words)
        rows.append((i, " ".join(words)))
    # near-dup partners at controlled overlap levels
    for i in range(n_docs):
        keep = 6 + (i % 24)  # 6..29 of 30 words shared
        words = base_words[i][:keep] + list(
            rng.choice(vocab, size=30 - keep, replace=False)
        )
        rows.append((1000 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lossy_recall_meets_band_bound(spark):
    from triangle_counting_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _doc_corpus(spark)
    n, s0 = 2, 0.45
    truth = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=n, threshold=s0).collect()
    }
    assert len(truth) >= 20, "fixture must produce a meaningful truth set"
    # LOSSY config: 64 hashes in 8 bands of r=8 — far from exact recall
    bands, num_hashes = 8, 64
    r = num_hashes // bands
    cand = {
        (c["id_a"], c["id_b"])
        for c in minhash_lsh_pairs(
            docs, "text", "doc_id", n=n, num_hashes=num_hashes, bands=bands
        ).collect()
    }
    hits = sum(1 for p in truth if p in cand)
    recall = hits / len(truth)
    # aggregate analytic bound: mean over true pairs of 1-(1-s^r)^b,
    # minus a 3σ binomial margin
    probs = [1.0 - (1.0 - s**r) ** bands for s in truth.values()]
    expected = sum(probs) / len(probs)
    sigma = math.sqrt(
        sum(p * (1 - p) for p in probs)
    ) / len(probs)
    assert recall >= expected - 3 * sigma, (
        f"recall {recall:.3f} < bound {expected:.3f} - 3σ({sigma:.3f})"
    )
    # and the config really is lossy — the bound itself must bite
    assert min(probs) < 0.999


def _embeddings(spark, n: int = 40, dim: int = 16, seed: int = 3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted neighbor at a small, varied angle
        w = v + (0.15 + 0.02 * (i % 10)) * rng.standard_normal(dim)
        rows.append((1000 + i, [float(x) for x in w]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hyperplane_lsh_lossy_recall_meets_bound(spark):
    from triangle_counting_spark.functions.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = _embeddings(spark)
    k = 3
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, emb, k=k).collect()
    }
    # LOSSY config: 8 planes x 2 tables
    n_planes, n_tables = 8, 2
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, emb, k=k, n_planes=n_planes, n_tables=n_tables).collect()
    }
    hits = sum(1 for p in truth if p in got)
    recall = hits / len(truth)
    probs = []
    for cs in truth.values():
        theta = math.acos(max(-1.0, min(1.0, cs)))
        p_plane = 1.0 - theta / math.pi
        probs.append(1.0 - (1.0 - p_plane**n_planes) ** n_tables)
    expected = sum(probs) / len(probs)
    sigma = math.sqrt(sum(p * (1 - p) for p in probs)) / len(probs)
    assert recall >= expected - 3 * sigma, (
        f"recall {recall:.3f} < bound {expected:.3f} - 3σ({sigma:.3f})"
    )
    assert min(probs) < 0.999  # genuinely lossy config
