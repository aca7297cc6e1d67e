"""Benchmark decontamination — n-gram overlap between a training corpus
and an evaluation/benchmark set, the standard pre-training hygiene pass
(flag or drop any training document sharing a long word n-gram with a
benchmark document).

Plan shape, sized for the real asymmetry (training corpus ~100 TB,
benchmark set ~MBs): both sides expand to word n-grams with the same pure
JVM sliding-window expression as :func:`..text.ngram_vocabulary`
(transform over a sequence + array_join — codegen, no Python), the
benchmark side collapses to a DISTINCT hash set and is explicitly
``broadcast()``, so the only full pass over the corpus is one scan +
map-side hash probe; no shuffle of corpus-sized data anywhere. Matched
grams then aggregate per training document (partial agg map-side).

The reference repo has no text pipeline; this operator exists for the
training-data-pipeline surface the brief mandates alongside SURVEY.md §2
(same family as dedup.py / text.py). Semantics follow the published
GPT-3/Llama decontamination recipe: a training doc is contaminated iff it
contains at least one benchmark n-gram (default n=13 in the literature;
parameterized because the useful n depends on tokenization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams


def _doc_ngrams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, gram) — one row per word n-gram occurrence; empty-safe for
    docs shorter than n words (word_ngrams carries the short-doc guard)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    )


def ngram_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_matched, n_distinct_matched, n_grams, overlap_frac) for
    every CONTAMINATED training document (no row = clean).

    ``n_matched`` counts gram occurrences in the training doc that appear
    anywhere in the benchmark set; ``n_distinct_matched`` counts distinct
    such grams; ``overlap_frac`` = n_matched / total grams in the doc.
    """
    bench_grams = (
        _doc_ngrams(benchmark, n, text_col, id_col)
        .select("gram")
        .distinct()
    )
    tg = _doc_ngrams(train, n, text_col, id_col)
    totals = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    matched = (
        tg.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.countDistinct("gram").alias("n_distinct_matched"),
        )
    )
    return (
        matched.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_matched",
            "n_distinct_matched",
            "n_grams",
            F.round(F.col("n_matched") / F.col("n_grams"), 6).alias("overlap_frac"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training rows with ZERO benchmark n-gram overlap — the drop-side
    twin of :func:`ngram_overlap` (left anti-join on the contaminated-id
    set). The contaminated set is usually tiny, but it is corpus-sized in
    the worst case (a ubiquitous benchmark n-gram), so the join is left
    unhinted: AQE broadcasts it when it measures small and falls back to a
    shuffled anti-join when it does not — a forced broadcast here would
    OOM exactly when contamination is worst."""
    contaminated = ngram_overlap(train, benchmark, n, text_col, id_col).select(
        F.col("doc_id").alias("_cid")
    )
    return train.join(
        contaminated,
        F.col(id_col).cast("long") == F.col("_cid"),
        "left_anti",
    )
