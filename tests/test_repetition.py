"""repetition_stats (functions/text.py) — Gopher-family within-document
repetition signals: hand-computed fixtures, edge cases, and the JVM-only
plan property (no Python stage in a codegen text pass)."""

from __future__ import annotations

from triangle_counting_spark.functions.text import repetition_stats


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}


def test_hand_computed_fixtures(spark):
    rows = _run(
        spark,
        [
            (1, "a b\na b\nc d"),  # 1 of 3 lines dup; 3 of 9 chars dup
            (4, "w w w w"),  # bigram "w w" ×3 of 3 → 1.0
            (5, "p q\nr s\np q\np q"),  # 2 of 4 lines dup; 6 of 12 chars
        ],
    )
    assert rows[1]["dup_line_frac"] == round(1 / 3, 6)
    assert rows[1]["dup_line_char_frac"] == round(3 / 9, 6)
    assert rows[4]["top_bigram_frac"] == 1.0
    assert rows[5]["dup_line_frac"] == 0.5
    assert rows[5]["dup_line_char_frac"] == 0.5
    # doc 5 bigrams: within lines only tokens split on ' ', newlines glue
    # tokens ("q\nr" is one token) — 3 bigrams, top one appears twice
    assert rows[5]["n_lines"] == 4


def test_edge_cases(spark):
    rows = _run(spark, [(2, "x"), (3, ""), (6, "\n\n\n"), (7, "same\nsame")])
    assert rows[2] == {
        "doc_id": 2,
        "n_lines": 1,
        "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0,
        "top_bigram_frac": 0.0,
    }
    assert rows[3]["n_lines"] == 0 and rows[3]["dup_line_frac"] == 0.0
    assert rows[6]["n_lines"] == 0  # all-empty lines filtered
    assert rows[7]["dup_line_frac"] == 0.5
    assert rows[7]["dup_line_char_frac"] == 0.5


def test_boilerplate_ranks_above_clean_text(spark):
    """The filter property the signals exist for: a spammy doc scores
    strictly higher than natural text on every signal."""
    clean = "the quick brown fox\njumps over the lazy dog\nand runs away"
    spam = "click here now\nclick here now\nclick here now\nclick here now"
    rows = _run(spark, [(1, clean), (2, spam)])
    for col in ("dup_line_frac", "dup_line_char_frac", "top_bigram_frac"):
        assert rows[2][col] > rows[1][col], col


def test_line_signals_are_jvm_only(spark):
    """The line-signal branch must stay inside codegen (no Python workers);
    the bigram branch is one explode+groupBy, also JVM."""
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
