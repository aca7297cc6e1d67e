"""Text analysis for training-data pipelines — all JVM expressions.

language-ID heuristic, quality scoring, token counting, fingerprinting —
each a single-pass column computation (no Python, no UDFs), so it pushes
through whole-stage codegen and scales linearly with a parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def word_ngrams(text_col: str, n: int):
    """array<string> of the whitespace-word n-grams of ``text_col`` — ONE
    sliding-window JVM expression shared by every n-gram consumer
    (vocabulary, repetition, decontamination), so the short-doc guard and
    gram text stay bit-identical everywhere the SQL oracles replay them.
    Guard: Spark's sequence(0, -1) is a DESCENDING sequence, not empty —
    emit an empty array when the doc has no full n-gram."""
    words = F.filter(_words(text_col), lambda t: t != "")
    idx_hi = F.size(words) - n
    return F.when(
        idx_hi >= 0,
        F.transform(
            F.sequence(F.lit(0), idx_hi),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def language_stats(docs: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """(lang, n_docs, avg_chars, avg_tokens) — corpus profile per language."""
    return docs.groupBy(lang_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        F.round(F.avg(F.size(_words(text_col))), 6).alias("avg_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, chars_per_token, type_token_ratio) — the standard
    cheap quality signals (length/diversity ratios)."""
    w = _words(text_col)
    n_tok = F.size(w)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.length(text_col).cast("double") / n_tok, 6).alias("chars_per_token"),
        F.round(F.size(F.array_distinct(w)) / n_tok, 6).alias("type_token_ratio"),
    )


def stopword_ratio(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, stopword_ratio) — fraction of TOKEN OCCURRENCES that are in
    a tiny English stopword list; a classic quality/language signal.

    Occurrence-based (a 100-token doc that is all "the" scores 1.0, not
    0.01): lambda-filter count, still a pure codegen expression.
    """
    w = _words(text_col)
    stops = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stops, t)))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.round(n_stop / F.greatest(F.size(w), F.lit(1)), 6).alias("stopword_ratio"),
    )


def language_id_heuristic(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred) — n-gram/charset heuristic language ID.

    Real corpora would use a model via a pandas UDF; here the heuristic is
    charset-based (CJK codepoints → zh, accented latin → fr/es/de buckets,
    else en) — deliberately simple, JVM-only, deterministic.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(t.rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
        .when(t.rlike("[àâçéèêëîïôûùüÿœ]"), F.lit("fr"))
        .when(t.rlike("[áéíóúñ¿¡]"), F.lit("es"))
        .when(t.rlike("[äöüß]"), F.lit("de"))
        .otherwise(F.lit("en"))
        .alias("lang_pred"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens) — whitespace tokens plus a
    BPE-ish estimate (word-boundary pieces + length/4 residue), the usual
    cheap proxy when no tokenizer ships with the cluster."""
    ws = F.size(_words(text_col))
    pieces = F.size(F.split(F.col(text_col), r"(?=[A-Z])|[^A-Za-z0-9]+"))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        F.greatest(pieces, (F.length(text_col) / 4).cast("int")).cast("long").alias(
            "bpe_ish_tokens"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized text (rolling-hash fingerprinting reduces to one
    hash once normalization is a pure expression)."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.xxhash64(norm).alias("fp")
    )


def token_vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(token, n_occurrences, n_docs) — the corpus vocabulary with
    document frequencies, the tokenizer-training / df-filter input. One
    explode + one aggregate (map-side combined); whitespace tokens match
    the per-doc ``token_counts`` convention. ``min_count`` prunes the
    long tail before the result materializes."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_words(text_col)).alias("token"),
    ).where(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def ngram_vocabulary(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(ngram, n_occurrences, n_docs) — word n-gram counts and document
    frequencies across the corpus (language-model / collocation
    statistics). The n-gram expansion is a pure JVM expression: transform
    over a sliding index sequence + array_join — no Python, no UDF.

    ``id_col`` is keyword-only (it sits after ``min_count``, unlike the
    other text functions, to keep older positional call sites valid); when
    the column is absent each ROW counts as its own document for
    ``n_docs``, so id-less corpora still work."""
    if id_col not in docs.columns:
        # materialize the synthetic id BEFORE the explode so every n-gram
        # of one row shares one doc_id (a generator-adjacent expression
        # would be evaluated per exploded row)
        docs = docs.withColumn("_ngv_doc_id", F.monotonically_increasing_id())
        id_col = "_ngv_doc_id"
    grams = word_ngrams(text_col, n)
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(grams).alias("ngram"),
        )
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def tf_idf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, token, tf, idf, tf_idf) — classic smooth-idf weighting:
    tf = occurrences / doc tokens, idf = ln((1+N)/(1+df)) + 1 (the
    sklearn convention). Two aggregates over one exploded token stream —
    the document-frequency side is a broadcastable (token, df) table, so
    the scoring join streams. ``min_df`` drops hapax noise."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_words(text_col)).alias("token"),
    ).where(F.col("token") != "")
    n_docs = docs.select(F.countDistinct(id_col)).collect()[0][0]
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("_n"))
    doclen = tf.groupBy("doc_id").agg(F.sum("_n").alias("_len"))
    df = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_df)
    )
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("_df"))) + 1.0
    return (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            F.round(F.col("_n") / F.col("_len"), 6).alias("tf"),
            F.round(idf, 6).alias("idf"),
            F.round((F.col("_n") / F.col("_len")) * idf, 6).alias("tf_idf"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_frac) — within-document repetition signals, the standard
    quality filters for LLM training corpora (the Gopher/MassiveText
    repetition family): documents dominated by repeated lines or one
    n-gram are boilerplate/spam and get filtered before training.

    - dup_line_frac:      fraction of non-empty lines that are repeat
                          occurrences of an earlier line.
    - dup_line_char_frac: fraction of line characters in those repeat
                          occurrences (chars beyond each line's first).
    - top_bigram_frac:    fraction of word-bigram occurrences taken by the
                          document's most frequent bigram.

    All-JVM: array expressions for the line signals (one pass, codegen);
    one explode+groupBy for the bigram signal (shuffle keyed on doc_id —
    partition-count-independent, skew-free: a document's bigrams land in
    one group). Integer counts → single division → round 6, so the SQL
    replay is exact."""
    doc_id = F.col(id_col).cast("long").alias("doc_id")
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    acc0 = F.lit(0).cast("long")
    chars = F.aggregate(lines, acc0, lambda a, x: a + F.length(x))
    dchars = F.aggregate(F.array_distinct(lines), acc0, lambda a, x: a + F.length(x))
    zero = F.lit(0.0)
    line_stats = docs.select(
        doc_id,
        n_lines.cast("long").alias("n_lines"),
        F.round(
            F.when(n_lines > 0, (n_lines - n_distinct) / n_lines).otherwise(zero), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(chars > 0, (chars - dchars) / chars).otherwise(zero), 6
        ).alias("dup_line_char_frac"),
    )

    grams = word_ngrams(text_col, 2)
    per_gram = (
        docs.select(doc_id, F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = per_gram.groupBy("doc_id").agg(
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_bigram_frac")
    )
    return line_stats.join(top, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        F.coalesce("top_bigram_frac", zero).alias("top_bigram_frac"),
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_start, chunk_text, n_tokens) — fixed-size token
    windows with overlap, the context-window splitter every training
    pipeline runs before tokenization.

    Window starts step by ``stride = chunk_tokens - overlap``; a trailing
    start is emitted only if it contributes tokens beyond the previous
    window's coverage (``start < n - overlap``), so no chunk is fully
    contained in its predecessor; every doc yields at least one chunk.
    ``chunk_start`` (the 0-based token offset) is the stable chunk key —
    no window/ordinal needed, so the expansion is one generate+explode
    with NO shuffle at all: chunking 100 TB is a pure map over the scan.

    All-JVM (split → sequence → explode → slice/join): the exact token
    windows replay in ANSI SQL (DuckDB generate_series has the same
    inclusive-stop semantics as Spark sequence)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    words = F.filter(_words(text_col), lambda t: t != "")
    n = F.size(words)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s < n - overlap),
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            words.alias("_w"),
            n.alias("_n"),
            F.explode(starts).alias("chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.array_join(F.slice("_w", F.col("chunk_start") + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.greatest(
                F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start")), F.lit(0)
            ).cast("long").alias("n_tokens"),
        )
    )
