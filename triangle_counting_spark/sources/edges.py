"""Co-occurrence edge derivation — the engine's real ingest path.

Replaces the reference's MatrixMarket parser (main.c:296-384) with what the
north rule actually needs: derive an edge table from a table of items
grouped by a key (files grouped by repo; parts grouped by order; ...).
Two items co-occur (share an edge) iff they appear under the same group key:
a group with k items contributes C(k,2) edges — so a group is a clique and
Σ C(k,3) is a closed-form triangle oracle (FIXTURES.md §1).

Scale design:
- the pair generation is a **self-equi-join on the group key** with an
  ``item_a < item_b`` theta filter — Catalyst plans one shuffle on the key
  and AQE's skew-join splits giant groups (the mega-repo problem). We keep
  it a join (not applyInPandas) precisely so AQE *can* split it.
- ``max_group_size`` caps pathological groups (a repo with 10^6 files would
  alone emit 5·10^11 edges); capping is an explicit, logged policy knob —
  the standard practice for co-occurrence graphs at web scale.
- output ids are ``xxhash64`` of the item's natural key → dense-enough
  longs with no global ranking shuffle at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.orientation import DST, SRC


def cooccurrence_edges(
    items: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
    salt_heavy: int | None = None,
) -> DataFrame:
    """Canonical (src, dst) with src < dst, distinct, from item co-occurrence.

    ``item_col`` must already be an integral vertex id (use
    :func:`file_vertices` / ``xxhash64`` upstream for string keys).

    ``salt_heavy=S``: explicit skew salting of the self-join (SURVEY §7.2;
    heavy = group size > µ+2σ, the notebook's cell-10 criterion). A heavy
    group's left side is hashed into S salt buckets and its right side
    replicated to all S, so the join key becomes (g, salt) and the
    mega-group's C(k,2) pair stream spreads over S reducers instead of one.
    Each unordered pair still appears exactly once: (x,y) matches only in
    x's salt bucket (the reversed orientation fails the src<dst filter).
    Light groups pay nothing (salt 0, no replication). Default off — AQE's
    skew-join split handles moderate skew; salting is the deterministic
    plan-level fix for the one-mega-repo regime.
    """
    base = items.select(
        F.col(group_col).alias("g"), F.col(item_col).cast("long").alias("i")
    ).where(F.col(item_col).isNotNull()).distinct()
    if max_group_size is not None:
        sizes = base.groupBy("g").agg(F.count(F.lit(1)).alias("_gsz"))
        base = base.join(
            sizes.where(F.col("_gsz") <= max_group_size).select("g"), "g", "left_semi"
        )
    if salt_heavy is None:
        a = base.select("g", F.col("i").alias(SRC))
        b = base.select("g", F.col("i").alias(DST))
        return (
            a.join(b, "g")
            .where(F.col(SRC) < F.col(DST))
            .select(SRC, DST)
            .distinct()
        )
    s = int(salt_heavy)
    sizes = base.groupBy("g").agg(F.count(F.lit(1)).alias("_gsz"))
    stats = sizes.agg(
        (F.avg("_gsz") + 2 * F.coalesce(F.stddev_pop("_gsz"), F.lit(0.0))).alias("thr")
    ).collect()[0]
    heavy = sizes.where(F.col("_gsz") > float(stats["thr"])).select(
        "g", F.lit(True).alias("_heavy")
    )
    flagged = base.join(F.broadcast(heavy), "g", "left").select(
        "g", "i", F.coalesce("_heavy", F.lit(False)).alias("_heavy")
    )
    a = flagged.select(
        "g",
        F.when(F.col("_heavy"), F.pmod(F.xxhash64("i"), F.lit(s)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt"),
        F.col("i").alias(SRC),
    )
    b = flagged.select(
        "g",
        F.explode(
            F.sequence(F.lit(0), F.when(F.col("_heavy"), s - 1).otherwise(F.lit(0)))
        ).alias("salt"),
        F.col("i").alias(DST),
    )
    return (
        a.join(b, ["g", "salt"])
        .where(F.col(SRC) < F.col(DST))
        .select(SRC, DST)
        .distinct()
    )


def cooccurrence_weighted_edges(
    items: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """(src, dst, weight) — co-occurrence edges weighted by the NUMBER of
    shared groups (parts sharing 3 orders → weight 3.0). The natural edge
    strength for link graphs; feeds weighted PageRank. Same skew-safe
    self-equi-join as :func:`cooccurrence_edges`, with the distinct
    replaced by a count aggregate (identical shuffle shape)."""
    base = items.select(
        F.col(group_col).alias("g"), F.col(item_col).cast("long").alias("i")
    ).where(F.col(item_col).isNotNull()).distinct()
    if max_group_size is not None:
        sizes = base.groupBy("g").agg(F.count(F.lit(1)).alias("_gsz"))
        base = base.join(
            sizes.where(F.col("_gsz") <= max_group_size).select("g"), "g", "left_semi"
        )
    a = base.select("g", F.col("i").alias(SRC))
    b = base.select("g", F.col("i").alias(DST))
    return (
        a.join(b, "g")
        .where(F.col(SRC) < F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def file_vertices(files: DataFrame) -> DataFrame:
    """Vertex table for the source-code files input
    (repo, path, commit, lang, content): one vertex per file,
    id = xxhash64(repo, path) — no global rank/shuffle needed at 10^12 rows.

    Keeps the sha256(content) audit column so every derived table can prove
    the per-row invariant (BASELINE.json input_hint).
    """
    return files.select(
        F.xxhash64("repo", "path").alias("v"),
        "repo",
        "path",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    ).distinct()


def file_cooccurrence_edges(
    files: DataFrame,
    lang: str | None = None,
    max_repo_files: int | None = None,
    salt_heavy: int | None = None,
) -> DataFrame:
    """(src, dst) between files of the same repo (f1.repo = f2.repo AND
    f1 < f2), optionally restricted to one language. The engine's flagship
    derivation (SURVEY.md §7.1 step 1); the `content` column is never read —
    Catalyst prunes it out of the scan. ``salt_heavy``: split mega-repos
    above µ+2σ into that many salt buckets (see cooccurrence_edges)."""
    f = files
    if lang is not None:
        f = f.where(F.col("lang") == lang)
    verts = f.select("repo", F.xxhash64("repo", "path").alias("fid"))
    return cooccurrence_edges(
        verts, "repo", "fid", max_group_size=max_repo_files, salt_heavy=salt_heavy
    )


def sha256_audit(files: DataFrame, derived: DataFrame) -> DataFrame:
    """Rows of ``files`` whose sha256(content) is missing/mismatched in a
    derived table carrying ``content_sha256`` — MUST be empty (the per-row
    invariant). Anti-join keeps it one shuffle."""
    want = files.select(
        F.xxhash64("repo", "path").alias("v"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )
    return want.join(
        derived.select("v", "content_sha256"), ["v", "content_sha256"], "left_anti"
    )


def directed_cooccurrence_edges(
    items: DataFrame,
    group_col: str,
    item_col: str,
    sample_mod: int = 10,
    sample_keep: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """(src, dst) DIRECTED — a deterministic directed view of the
    co-occurrence graph for directed analytics (SCC, bowtie structure).

    The undirected pair stream is md5-subsampled (keep iff the first
    8 hex chars of md5("a,b") mod ``sample_mod`` < ``sample_keep``) and
    each kept edge is oriented by an INDEPENDENT slice of the same digest
    (hex chars 9-16), so sampling and direction are decorrelated. Both
    decisions are pure functions of the unordered pair — no RNG state,
    identical at any parallelism, and the whole derivation replays in
    ANSI SQL (the md5-rank idiom the sampled estimators use).

    Subsampling matters beyond determinism: a dense co-occurrence graph
    randomly oriented is strongly connected with probability → 1, which
    makes SCC degenerate; at 1/10 density the directed graph keeps the
    web-like giant-SCC-plus-tendrils shape the operator exists for."""
    und = cooccurrence_edges(items, group_col, item_col, max_group_size=max_group_size)
    key = F.concat_ws(",", F.col(SRC), F.col(DST))
    h_sample = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    h_orient = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    kept = und.where(h_sample % sample_mod < sample_keep)
    return kept.select(
        F.when(h_orient % 2 == 0, F.col(SRC)).otherwise(F.col(DST)).alias(SRC),
        F.when(h_orient % 2 == 0, F.col(DST)).otherwise(F.col(SRC)).alias(DST),
    )
