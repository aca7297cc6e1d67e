"""Benchmark decontamination + PII scrubbing — planted fixtures with
hand-computed expectations, a pure-python differential for the n-gram
overlap, and JVM-only plan assertions (these are scan-speed passes; a
Python stage in the plan would be a regression)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from triangle_counting_spark.functions.decontam import (
    decontaminate,
    ngram_overlap,
)
from triangle_counting_spark.functions.pii import (
    DEFAULT_PII_PATTERNS,
    pii_scrub,
    pii_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_ngrams(text: str, n: int) -> list[str]:
    w = [t for t in text.split(" ") if t]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


# ---------------------------------------------------------------- decontam


def test_ngram_overlap_planted(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (0, "a doc with the quick brown fox inside it"),   # 2 matched 3-grams
            (1, "completely clean text nothing shared here"),  # clean
            (2, "quick brown fox jumps twice quick brown fox jumps"),  # 4 matches
            (3, "short doc"),                                   # < n words
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_overlap(train, bench, n=3).collect()
    }
    assert set(got) == {0, 2}
    # doc 0: grams "the quick brown", "quick brown fox" match; 7 grams total
    assert got[0]["n_matched"] == 2
    assert got[0]["n_distinct_matched"] == 2
    assert got[0]["n_grams"] == 7
    assert abs(got[0]["overlap_frac"] - 2 / 7) < 1e-6  # stored round(·, 6)
    # doc 2: "quick brown fox" ×2, "brown fox jumps" ×2 → 4 matches, 2 distinct
    assert got[2]["n_matched"] == 4
    assert got[2]["n_distinct_matched"] == 2


def test_ngram_overlap_differential(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    bench_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
        for i in range(5)
    ]
    train_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(40)
    ]
    n = 4
    bench_set = {g for _, t in bench_rows for g in _py_ngrams(t, n)}
    expect = {}
    for did, t in train_rows:
        grams = _py_ngrams(t, n)
        matched = [g for g in grams if g in bench_set]
        if matched:
            expect[did] = (len(matched), len(set(matched)), len(grams))
    got = {
        r["doc_id"]: (r["n_matched"], r["n_distinct_matched"], r["n_grams"])
        for r in ngram_overlap(
            _docs(spark, train_rows), _docs(spark, bench_rows), n=n
        ).collect()
    }
    assert got == expect


def test_decontaminate_drops_exactly_the_contaminated(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (0, "a doc with the quick brown fox inside it"),
            (1, "completely clean text nothing shared here"),
            (2, "short doc"),
        ],
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, bench, n=3).collect()
    )
    assert kept == [1, 2]


def test_decontam_plan_is_jvm_only_and_broadcasts(spark):
    bench = _docs(spark, [(100, "a b c d")])
    train = _docs(spark, [(0, "x a b c d y")])
    plan = ngram_overlap(train, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --------------------------------------------------------------------- pii


def test_pii_scrub_planted(spark):
    docs = _docs(
        spark,
        [
            (0, "contact me at alice@example.com or bob.smith@corp.io thanks"),
            (1, "call 555-867-5309 from 10.0.0.1 card 4111-1111-1111-1111"),
            (2, "ssn 123-45-6789 nothing else"),
            (3, "no pii in this one at all"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert got[0]["text"] == "contact me at <EMAIL> or <EMAIL> thanks"
    assert got[0]["n_redactions"] == 2
    assert got[1]["text"] == "call <PHONE> from <IPV4> card <CARD>"
    assert got[1]["n_redactions"] == 3
    assert got[2]["text"] == "ssn <SSN> nothing else"
    assert got[2]["n_redactions"] == 1
    assert got[3]["text"] == "no pii in this one at all"
    assert got[3]["n_redactions"] == 0


def test_pii_stats_counts_each_kind_once(spark):
    # a card number must count as ONE card, not two phone-shaped fragments
    docs = _docs(spark, [(0, "pay 4111-1111-1111-1111 or call 555-867-5309")])
    row = pii_stats(docs).collect()[0]
    assert row["n_card"] == 1
    assert row["n_phone"] == 1
    assert row["n_ssn"] == 0
    assert row["n_pii"] == 2


def test_pii_python_differential(spark):
    texts = [
        (0, "a@b.co and c@d.org meet at 192.168.1.1"),
        (1, "(212) 555-0123 vs 123-45-6789"),
        (2, "edge 999.999.999.999 still ipv4-shaped"),
        (3, "plain words only"),
    ]
    docs = _docs(spark, texts)
    got = {r["doc_id"]: r["text"] for r in pii_scrub(docs).collect()}
    for did, t in texts:
        expect = t
        for kind, rx in DEFAULT_PII_PATTERNS:
            expect = re.sub(rx, f"<{kind.upper()}>", expect)
        assert got[did] == expect, (did, got[did], expect)


def test_pii_plan_is_jvm_only(spark):
    docs = _docs(spark, [(0, "x")])
    for df in (pii_scrub(docs), pii_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pii_custom_patterns(spark):
    docs = _docs(spark, [(0, "user id U-12345 is internal")])
    got = pii_scrub(docs, patterns={"uid": r"U-\d{5}"}).collect()[0]
    assert got["text"] == "user id <UID> is internal"
    assert got["n_redactions"] == 1
