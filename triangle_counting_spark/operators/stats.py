"""Graph statistics & skew profiling — notebook parity + planner inputs.

Reproduces the analysis notebook's profiling pipeline
(triangle_counting_analysis.ipynb cells 8-27) as single-pass aggregates:
degree mean/stddev, heavy/light classification at µ+2σ (cell 10), fraction
of vertices with degree ≥ √n (cell 25), heavy/light/mixed edge classes
(cell 15), and the communication-cost model (cell 18). The heavy/light
split is exactly our salting criterion for skewed joins (SURVEY.md §3.3).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, canonical_edges, degrees, symmetrize


def degree_stats(edges: DataFrame) -> DataFrame:
    """1 row: n, m, mean/stddev/max degree, heavy threshold µ+2σ
    (ipynb cell 8; max-degree reduction tc_parallel.c:799-803)."""
    deg = degrees(edges)
    return deg.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("degree") / 2).cast("long").alias("m"),
        F.avg("degree").alias("mean_degree"),
        F.coalesce(F.stddev_pop("degree"), F.lit(0.0)).alias("stddev_degree"),
        F.max("degree").alias("max_degree"),
    ).select(
        "*",
        (F.col("mean_degree") + 2 * F.col("stddev_degree")).alias("heavy_threshold"),
    )


def classify_vertices(edges: DataFrame, threshold: float | None = None) -> DataFrame:
    """(v, degree, weight∈{heavy,light}) — ipynb cell 10."""
    deg = degrees(edges)
    if threshold is None:
        s = degree_stats(edges).collect()[0]
        threshold = s["heavy_threshold"]
    return deg.select(
        "v",
        "degree",
        F.when(F.col("degree") > F.lit(threshold), F.lit("heavy"))
        .otherwise(F.lit("light"))
        .alias("weight"),
    )


def sqrt_n_fraction(edges: DataFrame) -> DataFrame:
    """1 row (fraction): share of vertices with degree ≥ √n (ipynb cell 25)."""
    deg = degrees(edges)
    n = deg.count()
    thr = math.sqrt(n) if n else 0.0
    return deg.agg(
        (
            F.coalesce(F.sum((F.col("degree") >= thr).cast("long")), F.lit(0))
            / F.greatest(F.count(F.lit(1)), F.lit(1))
        ).alias("fraction")
    )


def classify_edge_weights(edges: DataFrame, threshold: float | None = None) -> DataFrame:
    """(edge_class ∈ {light,heavy,mixed}, cnt) — ipynb cells 15/27."""
    cls = classify_vertices(edges, threshold)
    ce = canonical_edges(edges)
    w_src = cls.select(F.col("v").alias(SRC), F.col("weight").alias("w_src"))
    w_dst = cls.select(F.col("v").alias(DST), F.col("weight").alias("w_dst"))
    return (
        ce.join(w_src, SRC)
        .join(w_dst, DST)
        .select(
            F.when(
                (F.col("w_src") == "light") & (F.col("w_dst") == "light"), "light"
            )
            .when((F.col("w_src") == "heavy") & (F.col("w_dst") == "heavy"), "heavy")
            .otherwise("mixed")
            .alias("edge_class")
        )
        .groupBy("edge_class")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, cnt) with a running cumulative count — the MapJIK
    degree-bucket prefix-sum view (tc_parallel.c:837-871) as a window."""
    from pyspark.sql import Window

    hist = degrees(edges).groupBy("degree").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select("degree", "cnt", F.sum("cnt").over(w).alias("cum_cnt"))


def degree_panel(edges: DataFrame) -> DataFrame:
    """(degree, cnt, cum_cnt, knn, rich_club) — the degree-histogram rows
    (MapJIK prefix-sum view, tc_parallel.c:837-871) widened with the two
    classic degree-correlation structure functions of link-graph analysis:

    - ``knn(k)``: mean neighbor degree over all half-edges leaving a
      degree-k vertex (Pastor-Satorras/Vázquez/Vespignani) — the resolved
      form of the scalar assortativity r (operators/stats.py companion).
      Computed as an exact BIGINT sum of neighbor degrees divided ONCE,
      so the double is bit-identical across engines.
    - ``rich_club(k)``: φ(k) = 2·E_≥k / (N_≥k·(N_≥k−1)) where N_≥k counts
      vertices of degree ≥ k and E_≥k counts edges whose BOTH endpoints
      have degree ≥ k (Zhou/Mondragón). E_≥k is the descending cumulative
      of the min-endpoint-degree histogram — min(d_u, d_v) is itself a
      realized vertex degree, so one left join onto the degree rows plus
      one descending window covers every class with no densification.
      φ = 0 where N_≥k < 2 (no pair to wire).

    Scale shape: two hash aggregates + two equi-joins of a ~hundreds-row
    histogram; the only per-edge work is the sym×deg joins, broadcast
    when small, shuffle-partitioned on the vertex key otherwise. The
    window runs over the tiny histogram frame, never the edge set.
    """
    from pyspark.sql import Window

    # one canonicalization feeds BOTH the degree table and the edge scan
    # (degrees over raw rows would count duplicate/reversed edges the sym
    # stream dedups); deg is reused three times and `both` — the only
    # per-edge work — feeds two aggregates, so both are materialized once
    ce = canonical_edges(edges)
    deg = degrees(ce).localCheckpoint(eager=True)
    sym_e = symmetrize(ce)
    d_src = deg.select(F.col("v").alias(SRC), F.col("degree").alias("deg_src"))
    d_dst = deg.select(F.col("v").alias(DST), F.col("degree").alias("deg_dst"))
    both = (
        sym_e.join(d_src, SRC).join(d_dst, DST).localCheckpoint(eager=True)
    )

    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("cnt"))
    # Σ of neighbor degrees per source-degree class (exact, BIGINT)
    nbr = both.groupBy(F.col("deg_src").alias("degree")).agg(
        F.sum("deg_dst").cast("long").alias("nbr_deg_sum")
    )
    # half of the sym stream is each canonical edge once ⇒ min-endpoint
    # histogram from the canonical half (deg_src vs deg_dst symmetric in
    # sym, so take every sym row once and divide by 2 — exact, both
    # orientations contribute the same min)
    emin = (
        both.select(F.least("deg_src", "deg_dst").alias("degree"))
        .groupBy("degree")
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("ecnt"))
    )

    asc = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, 0)
    desc = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    half_edges = F.col("degree") * F.col("cnt")  # k·N_k half-edges, exact
    n_ge = F.sum("cnt").over(desc)
    e_ge = F.sum(F.coalesce(F.col("ecnt"), F.lit(0).cast("long"))).over(desc)
    return (
        hist.join(nbr, "degree", "left")
        .join(emin, "degree", "left")
        .select(
            "degree",
            "cnt",
            F.sum("cnt").over(asc).alias("cum_cnt"),
            (
                F.coalesce(F.col("nbr_deg_sum"), F.lit(0).cast("long"))
                / half_edges
            ).alias("knn"),
            F.when(n_ge < 2, F.lit(0.0))
            .otherwise((F.lit(2.0) * e_ge) / (n_ge * (n_ge - F.lit(1))))
            .alias("rich_club"),
        )
    )


def comm_cost_model(edges: DataFrame) -> DataFrame:
    """Per-edge min(|N(a)|·log n, |N(b)|·log n, n) strategy split
    (ipynb cell 18): for each edge pick the cheapest of send-A's-list,
    send-B's-list, or send-a-bitmap; report edge counts + total bits per
    strategy."""
    deg = degrees(edges)
    ce = canonical_edges(edges)
    n = deg.count()
    logn = math.log2(max(n, 2))
    d_src = deg.select(F.col("v").alias(SRC), F.col("degree").alias("deg_src"))
    d_dst = deg.select(F.col("v").alias(DST), F.col("degree").alias("deg_dst"))
    costs = (
        ce.join(d_src, SRC)
        .join(d_dst, DST)
        .select(
            (F.col("deg_src") * logn).alias("cost_a"),
            (F.col("deg_dst") * logn).alias("cost_b"),
            F.lit(float(n)).alias("cost_bitmap"),
        )
        .select(
            F.when(
                (F.col("cost_a") <= F.col("cost_b"))
                & (F.col("cost_a") <= F.col("cost_bitmap")),
                "send_a",
            )
            .when(F.col("cost_b") <= F.col("cost_bitmap"), "send_b")
            .otherwise("bitmap")
            .alias("strategy"),
            F.least("cost_a", "cost_b", "cost_bitmap").alias("bits"),
        )
    )
    return costs.groupBy("strategy").agg(
        F.count(F.lit(1)).alias("edges"), F.round(F.sum("bits"), 4).alias("total_bits")
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """1 row ``(assortativity)`` — Pearson correlation of endpoint degrees
    over the symmetrized edge list (Newman's degree-correlation r): r > 0
    hubs link hubs, r < 0 hubs link leaves (the usual web/link-graph
    regime). One symmetrize + two broadcastable degree joins + one corr
    aggregate; round 6 for oracle parity (ANSI CORR is the same two-pass
    moment formula at this scale)."""
    ce = canonical_edges(edges)
    deg = degrees(ce)
    sym = ce.select(SRC, DST).union(
        ce.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    paired = (
        sym.join(deg.select(F.col("v").alias(SRC), F.col("degree").alias("_du")), SRC)
        .join(deg.select(F.col("v").alias(DST), F.col("degree").alias("_dv")), DST)
    )
    # corr spelled as covar/(σx·σy) with try_divide: Spark 4 ANSI `corr`
    # RAISES on a zero-variance input (regular graphs), while the oracle's
    # ANSI CORR returns NULL — try_divide restores the NULL semantics; the
    # population/sample distinction cancels in the ratio
    x = F.col("_du").cast("double")
    y = F.col("_dv").cast("double")
    return paired.agg(
        F.round(
            F.try_divide(
                F.covar_pop(x, y), F.stddev_pop(x) * F.stddev_pop(y)
            ),
            6,
        ).alias("assortativity")
    )


def power_law_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """1 row ``(alpha, n_tail)`` — the continuous-MLE power-law exponent of
    the degree distribution over the tail degree >= dmin
    (Clauset-Shalizi-Newman: alpha = 1 + n / Σ ln(d / (dmin - 1/2)));
    the notebook eyeballs the log-log histogram (ipynb 8-10), this is the
    estimator that replaces the eyeball. Single aggregate over the degree
    table; exact SQL replay."""
    deg = degrees(edges).where(F.col("degree") >= dmin)
    return deg.agg(
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("degree") / F.lit(dmin - 0.5))),
            6,
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
    )
