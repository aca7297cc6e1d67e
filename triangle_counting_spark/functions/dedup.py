"""Deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash.

All-JVM expressions where possible; the only Python is the (vectorized)
numpy in MinHash signature generation. The near-dup self-join family is the
same shape as the engine's co-occurrence edge derivation: explode → join on
a token → group — so the skew guidance (rare-token filtering ≈ degree
orientation) carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(text_hash, keep_doc_id, n_dups) — hash-groupBy exact dedup; one
    shuffle, partial agg map-side. keep = min id (deterministic)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(F.col(id_col)).cast("long").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(doc_id, sh) — distinct n-word shingles. Truncating slice at the tail
    (docs shorter than n words yield one partial shingle) so the semantics
    are exactly reproducible in ANSI SQL (the DuckDB oracle)."""
    words = F.split(F.col(text_col), " ")
    shingles = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)),"
        f" i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))"
    )
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"), F.explode(shingles).alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docfreq: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    Exact within the (optional) rare-shingle filter: at web scale, shingles
    appearing in > max_shingle_docfreq docs are dropped before the
    self-join (boilerplate shingles are the skew hubs of this graph — the
    exact analog of capping mega-repos in edge derivation). jaccard is a
    ratio of integer counts → bit-identical across engines.
    """
    sh = word_shingles(df, text_col, id_col, n)
    if max_shingle_docfreq is not None:
        keep = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(
            keep.where(F.col("df_") <= max_shingle_docfreq).select("sh"), "sh", "left_semi"
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb"))
    j = F.col("c") / (F.col("sa") + F.col("sb") - F.col("c"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .where(j >= threshold)
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
    )


def neardup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docfreq: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_keep_id, cluster_size) — transitive near-duplicate
    clusters: docs are vertices, Jaccard-≥-threshold pairs are edges, a
    cluster is a connected component, and the kept representative is the
    component's minimum doc id (the standard dedup-pipeline shape: pairs →
    union-find → keep-one). Composes the engine's own operators — the
    near-dup pair join feeds the connected-components substrate THROUGH the
    memory-tier dispatcher — so it inherits both of their scale paths: the
    pairs graph is almost always small after thresholding (duplicates are
    the exception, not the rule), so it typically lands on the blocked
    broadcast tier (2-3 rounds) rather than the iterative shuffle loop.
    Singleton docs keep themselves.
    """
    from ..operators.components import (
        connected_components,
        connected_components_blocked,
    )
    from ..plans.planner import choose_iterative_tier

    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, n=n, threshold=threshold,
        max_shingle_docfreq=max_shingle_docfreq,
    ).persist()
    docs = df.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    pair_edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # pair edges are canonical by construction (id_a < id_b, distinct)
    tier = choose_iterative_tier(pair_edges, assume_canonical=True)
    cc = (
        connected_components_blocked(pair_edges, assume_canonical=True)
        if tier == "blocked"
        else connected_components(pair_edges)
    )
    comp = cc.state
    pairs.unpersist()
    labeled = docs.join(
        comp.select(F.col("v").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster_keep_id"),
    )
    sizes = labeled.groupBy("cluster_keep_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_keep_id").select(
        "doc_id", "cluster_keep_id", "cluster_size"
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_hashes: int = 64, seed: int = 7
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures over word shingles.

    h_i(x) = xxhash64(shingle, seed+i) — evaluated JVM-side; the num_hashes
    mins come from one groupBy with array-of-min aggregates (no Python).
    """
    sh = word_shingles(df, text_col, id_col, n)
    hashes = [
        F.min(F.xxhash64(F.col("sh"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*hashes)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    Signature split into ``bands`` bands of r = num_hashes/bands rows; docs
    agreeing on any full band become candidates (band hash join — the
    scalable path: no all-pairs). If ``verify_threshold`` is set, candidates
    are verified with the exact shingle Jaccard and filtered.
    Returns (id_a, id_b [, jaccard]).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, seed)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    exact = ngram_jaccard_pairs(df, text_col, id_col, n, verify_threshold)
    return cand.join(exact, ["id_a", "id_b"])


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash: long) — SimHash over words: sign-sum of per-word
    hash bits, all via bitwise JVM expressions (explode words, per-bit ±1
    contributions, aggregate, re-pack).

    hash_fn:
    - "xxhash64" (default, fastest): 64-bit JVM hash.
    - "md5": word hash = first 15 hex chars of md5 as an int (60 bits).
      md5 is bit-identical in Spark and DuckDB, so an md5-based simhash
      pipeline is replayable by the ANSI-SQL oracle (the engine's
      all-implementations-checked rule, main.c:433-435). bits must be ≤ 60.
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64("w")
    elif hash_fn == "md5":
        if bits > 60:
            raise ValueError("md5 hash mode carries 60 usable bits")
        h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    words = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).select("doc_id", h.alias("h"))
    # per-bit contribution: +1 if bit set else -1; sum over words; bit = sum>0
    # (shift ops, not 1<<i literals: 1<<63 overflows a 64-bit literal, while
    # shiftleft wraps to the sign bit, which is exactly the packed pattern)
    one = F.lit(1).cast("long")
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(one) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    packed = sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
                for i in range(bits)
            ],
            F.lit(0).cast("long"),
        ).cast("long").alias("simhash"),
    )
    return packed


def _pigeonhole_blocks(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(start_bit, width) per block: ``bits`` split into n_blocks near-equal
    chunks. A pair within Hamming distance n_blocks-1 agrees EXACTLY on ≥1
    block (pigeonhole) — the completeness guarantee of the block join."""
    base, rem = divmod(bits, n_blocks)
    out, start = [], 0
    for b in range(n_blocks):
        width = base + (1 if b < rem else 0)
        out.append((start, width))
        start += width
    return out


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming) — ALL pairs within Hamming distance
    ``max_hamming`` via pigeonhole LSH with ``max_hamming + 1`` blocks (a
    pair within distance d differs in ≤ d blocks, so with d+1 blocks at
    least one matches exactly → block-equality join, no all-pairs, and the
    recall guarantee holds for ANY max_hamming — the r1 version fixed 4
    blocks and silently under-reported beyond distance 3)."""
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError(f"max_hamming={max_hamming} needs more blocks than bits={bits}")
    sh = simhash(df, text_col, id_col, bits=bits, hash_fn=hash_fn)
    spans = _pigeonhole_blocks(bits, n_blocks)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("simhash", start)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("key"),
                    )
                    for b, (start, width) in enumerate(spans)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.blk", "bb.key")
    a = blocks.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "key")
    b = blocks.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "key")
    cand = (
        a.join(b, ["blk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
