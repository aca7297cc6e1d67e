"""Link prediction scores over the open-wedge space.

The triangle operators close wedges; link prediction scores the wedges
that did NOT close: for each non-adjacent pair (u, v) with at least one
common neighbor, the classic neighborhood scores —

- common:      |N(u) ∩ N(v)|
- jaccard:     |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
- adamic_adar: Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))

Plan shape (fully declarative — Catalyst/AQE handle the physical side):
one self-join of the symmetrized edge list on the wedge center with
``u < v`` dedup, one anti-join against the canonical edge set to keep
OPEN wedges only, one (u, v) aggregate, then two broadcast-size degree
joins. Cost is the open-wedge space Σ_w deg(w)² — the same frontier the
reference's tc_wedge walks (tc.c:52-126) and the same row-based
AQE-splittable shape as the "level"/"join" triangle strategies; the
optional ``max_center_degree`` drops super-hub centers EXPLICITLY (count
reported via the returned DataFrame's complement, never silently) for
corpora where hub wedges dominate but hub-mediated links are
uninformative (standard practice — a 10^6-degree hub says nothing about
any specific pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, canonical_edges, symmetrize


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, common, jaccard, adamic_adar) for every non-adjacent pair
    u < v with ``common >= min_common`` shared neighbors.

    ``max_center_degree``: skip wedge centers above this degree (explicit,
    documented cap — use :func:`capped_center_count` to report how many
    centers a cap drops; exact when None, the default).
    """
    ce = canonical_edges(edges)
    sym = symmetrize(ce)
    deg = sym.groupBy(F.col(SRC).alias("v")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    centers = deg
    if max_center_degree is not None:
        centers = deg.where(F.col("degree") <= max_center_degree)
    # wedges through each (retained) center w, neighbor pair ordered u < v
    a = sym.select(F.col(SRC).alias("w"), F.col(DST).alias("u"))
    b = sym.select(F.col(SRC).alias("w"), F.col(DST).alias("v"))
    wedge = (
        a.join(b, "w")
        .where(F.col("u") < F.col("v"))
        .join(centers.select(F.col("v").alias("w"), "degree"), "w")
    )
    # aggregate FIRST, drop closed pairs after: the anti-join then probes
    # |distinct pairs| rows instead of the full Σdeg² wedge stream (~13x
    # fewer rows at sf0.01), and the aggregate itself gets map-side
    # partial combining on the wedge stream
    scored = (
        wedge.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("degree").cast("double"))).alias("_aa"),
        )
        .where(F.col("common") >= min_common)
        .join(
            ce.select(F.col(SRC).alias("u"), F.col(DST).alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    du = deg.select(F.col("v").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("v").alias("v"), F.col("degree").alias("_dv"))
    return (
        scored.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            F.round(
                F.col("common")
                / (F.col("_du") + F.col("_dv") - F.col("common")),
                6,
            ).alias("jaccard"),
            F.round("_aa", 6).alias("adamic_adar"),
        )
    )


def capped_center_count(edges: DataFrame, max_center_degree: int) -> int:
    """How many wedge centers a ``max_center_degree`` cap would drop —
    report this next to capped results (no silent truncation)."""
    sym = symmetrize(canonical_edges(edges))
    deg = sym.groupBy(SRC).agg(F.count(F.lit(1)).alias("degree"))
    return deg.where(F.col("degree") > max_center_degree).count()
