from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.functions.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from triangle_counting_spark.functions.similarity import brute_force_topk, lsh_topk
from triangle_counting_spark.functions.text import (
    fingerprint,
    language_id_heuristic,
    quality_scores,
    token_counts,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
    (2, "completely different text about spark engines", "en"),
    (3, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
    (4, "uno dos tres cuatro cinco seis siete ocho nueve", "es"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def python_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        w = t.split(" ")
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, docs):
    rows = exact_dedup_groups(docs, "text", "doc_id").collect()
    groups = {r.text_hash: (r.keep_doc_id, r.n_dups) for r in rows}
    assert len(groups) == 4  # docs 0 and 3 collapse
    assert (0, 2) in groups.values()


def test_ngram_jaccard_matches_python(spark, docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.0).collect()
    }
    texts = {d[0]: d[1] for d in DOCS}
    for (a, b), j in got.items():
        assert abs(j - round(python_jaccard(texts[a], texts[b]), 6)) < 1e-9
    assert got[(0, 3)] == 1.0  # exact dup
    assert got[(0, 1)] > 0.5  # near dup
    assert (0, 4) not in got  # disjoint shingles never pair


def test_minhash_lsh_finds_neardups(spark, docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id", verify_threshold=0.5).collect()
    }
    assert (0, 3) in pairs
    assert (0, 1) in pairs or (1, 3) in pairs
    sigs = minhash_signatures(docs, "text", "doc_id").collect()
    by_id = {r.doc_id: r.sig for r in sigs}
    assert by_id[0] == by_id[3]  # identical shingle sets → identical sigs


def test_simhash_neardup(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(docs, "text", "doc_id", max_hamming=10).collect()
    }
    assert pairs.get((0, 3)) == 0  # identical docs → distance 0


def test_similarity_brute_force_and_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 16)).astype("float32")
    base[1] = base[0] + rng.normal(scale=0.01, size=16).astype("float32")  # 1 ≈ 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    topk = brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=3)
    got = [(r.rank, r.neighbor_id) for r in topk.orderBy("rank").collect()]
    assert got[0] == (1, 1)  # the planted near-duplicate is rank 1
    approx = lsh_topk(emb, emb.where(F.col("vec_id") == 0), k=3, n_planes=6, n_tables=8)
    arows = approx.orderBy("rank").collect()
    assert arows and arows[0].neighbor_id == 1  # LSH finds the planted nbr


def test_text_functions(spark, docs):
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert q[0].n_tokens == 9
    assert abs(q[0].type_token_ratio - 8 / 9) < 1e-6  # 'the' repeats
    lang = {r.doc_id: r.lang_pred for r in language_id_heuristic(docs).collect()}
    assert lang[0] == "en"
    fp = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    assert fp[0] == fp[3] and fp[0] != fp[1]
    tc = {r.doc_id: r.ws_tokens for r in token_counts(docs).collect()}
    assert tc[0] == 9


def test_neardup_clusters_transitive(spark):
    """A~B and B~C near-dups (A!~C directly) must land in ONE cluster —
    the transitive closure that pair lists alone don't give."""
    from triangle_counting_spark.functions.dedup import neardup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # ~1
            (3, base + " extra words"),    # ~2 (and ~1)
            (4, "completely different text about unrelated things entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cluster_keep_id, r.cluster_size)
        for r in neardup_clusters(docs, "text", "doc_id", threshold=0.5).collect()
    }
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)  # singleton keeps itself


def test_sessionize_gap_splits(spark):
    from triangle_counting_spark.functions.events import sessionize

    rows = [
        # user 1: two sessions split by a 2-hour gap
        (0, "2024-01-01 10:00:00", 1, 1.0),
        (1, "2024-01-01 10:10:00", 1, 2.0),
        (2, "2024-01-01 12:30:00", 1, 4.0),
        # user 2: one session
        (3, "2024-01-01 09:00:00", 2, 8.0),
        (4, "2024-01-01 09:29:00", 2, 16.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r.user_id, r.session_ix): (r.n_events, r.sum_value)
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert out == {(1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (2, 24.0)}


def test_token_vocabulary(spark):
    from triangle_counting_spark.functions.text import token_vocabulary

    docs2 = spark.createDataFrame(
        [(0, "a b a"), (1, "b  c"), (2, "")], "doc_id long, text string"
    )
    out = {r.token: (r.n_occurrences, r.n_docs) for r in token_vocabulary(docs2).collect()}
    assert out == {"a": (2, 1), "b": (2, 2), "c": (1, 1)}
    pruned = {r.token for r in token_vocabulary(docs2, min_count=2).collect()}
    assert pruned == {"a", "b"}


def test_ngram_vocabulary(spark):
    from triangle_counting_spark.functions.text import ngram_vocabulary

    docs2 = spark.createDataFrame(
        [(0, "a b c"), (1, "b c"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = {r.ngram: r.n_occurrences for r in ngram_vocabulary(docs2, n=2).collect()}
    assert out == {"a b": 1, "b c": 2}
    tri = {r.ngram: r.n_occurrences for r in ngram_vocabulary(docs2, n=3).collect()}
    assert tri == {"a b c": 1}


def test_tf_idf_closed_form(spark):
    import math

    from triangle_counting_spark.functions.text import tf_idf

    docs2 = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.token): (r.tf, r.idf, r.tf_idf) for r in tf_idf(docs2).collect()}
    # 'a' appears in both docs: idf = ln(3/3)+1 = 1
    assert out[(0, "a")][0] == pytest.approx(2 / 3, abs=1e-6)
    assert out[(0, "a")][1] == pytest.approx(1.0, abs=1e-6)
    # 'b' in one doc: idf = ln(3/2)+1
    want_idf = math.log(3 / 2) + 1
    assert out[(0, "b")][1] == pytest.approx(want_idf, abs=1e-6)
    assert out[(0, "b")][2] == pytest.approx(want_idf / 3, abs=1e-6)
    assert (1, "b") not in out
