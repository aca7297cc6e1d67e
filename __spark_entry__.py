"""Driver contract for the spark-graft builder (PySpark target).

Graph queries run over the part co-occurrence graph derived from
``lineitem`` (two parts share an edge iff they appear in the same order) —
the same derivation shape as the north rule's repo/file co-occurrence
(FIXTURES.md §1), on the driver-provided tables. Every aggregate/computed
column is aliased identically in the Spark code and the DuckDB oracle SQL;
doubles are rounded to 6 decimals on both sides (engine sum-order noise is
~1e-15, far below the rounding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

PR_ITERS = 10
PR_DAMPING = 0.85
LP_ITERS = 3
TOPK_K = 5
TOPK_NQUERY = 10
JACCARD_MIN = 0.15


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-occurrence edges from lineitem (src < dst, distinct)."""
    from triangle_counting_spark.sources.edges import cooccurrence_edges

    return cooccurrence_edges(_t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey")


# Shared DuckDB CTE prelude (ANSI; tables pre-registered as views)
EDGES_CTE = """
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
verts AS (SELECT DISTINCT src AS v FROM sym),
deg AS (SELECT src AS v, COUNT(*)::BIGINT AS degree FROM sym GROUP BY src)
"""


def _pagerank_sql() -> str:
    """Generate PR_ITERS synchronous power-iteration CTEs."""
    its = [
        "r0 AS (SELECT v, 1.0/(SELECT n FROM params) AS rank FROM verts)"
    ]
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"""r{i} AS (
  SELECT verts.v,
         (1-{PR_DAMPING})/(SELECT n FROM params) + {PR_DAMPING}*COALESCE(g.s, 0.0) AS rank
  FROM verts LEFT JOIN (
    SELECT sym.dst AS v, SUM(r{i-1}.rank / deg.degree) AS s
    FROM sym JOIN r{i-1} ON sym.src = r{i-1}.v JOIN deg ON deg.v = sym.src
    GROUP BY sym.dst
  ) g ON verts.v = g.v
)"""
        )
    return (
        "WITH "
        + EDGES_CTE
        + ", params AS (SELECT COUNT(*)::DOUBLE AS n FROM verts),\n"
        + ",\n".join(its)
        + f"\nSELECT v, ROUND(rank, 6) AS rank FROM r{PR_ITERS}"
    )


def _labelprop_sql() -> str:
    its = ["l0 AS (SELECT v, v AS label FROM verts)"]
    for i in range(1, LP_ITERS + 1):
        its.append(
            f"""l{i} AS (
  SELECT t.v, COALESCE(w.label, t.label) AS label
  FROM l{i-1} t LEFT JOIN (
    SELECT v, label FROM (
      SELECT sym.dst AS v, l.label AS label, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY sym.dst ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM sym JOIN l{i-1} l ON sym.src = l.v
      GROUP BY sym.dst, l.label
    ) x WHERE rn = 1
  ) w ON t.v = w.v
)"""
        )
    return (
        "WITH " + EDGES_CTE + ",\n" + ",\n".join(its)
        + f"\nSELECT v, label FROM l{LP_ITERS}"
    )


# ---------------------------------------------------------------- queries


def q_edge_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges(spark, sf_dir)


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import triangle_count

    return triangle_count(_edges(spark, sf_dir), "sql")


def q_triangle_count_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import triangle_count

    return triangle_count(_edges(spark, sf_dir), "join")


def q_triangle_count_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import triangle_count

    return triangle_count(_edges(spark, sf_dir), "merge")


def q_triangle_count_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import triangle_count

    return triangle_count(_edges(spark, sf_dir), "probe")


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import triangles_per_vertex

    return triangles_per_vertex(_edges(spark, sf_dir))


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.orientation import degrees

    return degrees(_edges(spark, sf_dir))


def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.stats import degree_stats

    s = degree_stats(_edges(spark, sf_dir))
    return s.select(
        "n",
        "m",
        F.round("mean_degree", 6).alias("mean_degree"),
        F.round("stddev_degree", 6).alias("stddev_degree"),
        "max_degree",
        F.round("heavy_threshold", 6).alias("heavy_threshold"),
    )


def q_wedge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.triangles import wedge_count

    return wedge_count(_edges(spark, sf_dir))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.pagerank import pagerank_fixed

    pr = pagerank_fixed(_edges(spark, sf_dir), PR_ITERS, damping=PR_DAMPING)
    return pr.select("v", F.round("rank", 6).alias("rank"))


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.components import connected_components

    return connected_components(_edges(spark, sf_dir)).state


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.labelprop import label_propagation_fixed

    return label_propagation_fixed(_edges(spark, sf_dir), LP_ITERS)


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.bfs import bfs_levels

    e = _edges(spark, sf_dir)
    root = e.agg(F.min("src")).collect()[0][0]
    return bfs_levels(e, roots=[int(root)]).select("v", "level")


def q_heavy_light_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.operators.stats import classify_edge_weights

    return classify_edge_weights(_edges(spark, sf_dir))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=JACCARD_MIN
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.text import language_stats

    return language_stats(_t(spark, sf_dir, "documents"))


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.text import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < TOPK_NQUERY)
    return brute_force_topk(emb, queries, k=TOPK_K)


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triangle_counting_spark.functions.events import hourly_event_stats

    return hourly_event_stats(_t(spark, sf_dir, "events"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact triangle count of the part co-occurrence graph at
    sf0.001 via degree-ordered orientation + intersection join."""
    return q_triangle_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edge_derivation": q_edge_derivation,
        "triangle_count": q_triangle_count,
        "triangle_count_join": q_triangle_count_join,
        "triangle_count_merge": q_triangle_count_merge,
        "triangle_count_probe": q_triangle_count_probe,
        "triangles_per_vertex": q_triangles_per_vertex,
        "degrees": q_degrees,
        "degree_stats": q_degree_stats,
        "wedge_count": q_wedge_count,
        "pagerank": q_pagerank,
        "connected_components": q_connected_components,
        "label_propagation": q_label_propagation,
        "bfs_levels": q_bfs_levels,
        "heavy_light_edges": q_heavy_light_edges,
        "dedup_exact": q_dedup_exact,
        "neardup_jaccard": q_neardup_jaccard,
        "text_stats": q_text_stats,
        "doc_quality": q_doc_quality,
        "similarity_topk": q_similarity_topk,
        "events_window": q_events_window,
    }


def oracle_sql() -> dict[str, str]:
    tri_sql = (
        "WITH "
        + EDGES_CTE
        + """
SELECT COUNT(*)::BIGINT AS triangles FROM edges e1
JOIN edges e2 ON e1.dst = e2.src
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""
    )
    return {
        "edge_derivation": "WITH " + EDGES_CTE + "\nSELECT src, dst FROM edges",
        "triangle_count": tri_sql,
        "triangle_count_join": tri_sql,
        "triangle_count_merge": tri_sql,
        "triangle_count_probe": tri_sql,
        "triangles_per_vertex": (
            "WITH "
            + EDGES_CTE
            + """,
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v, COUNT(*)::BIGINT AS triangles FROM corners GROUP BY v"""
        ),
        "degrees": "WITH " + EDGES_CTE + "\nSELECT v, degree FROM deg",
        "degree_stats": (
            "WITH "
            + EDGES_CTE
            + """
SELECT COUNT(*)::BIGINT AS n,
       (SUM(degree)/2)::BIGINT AS m,
       ROUND(AVG(degree), 6) AS mean_degree,
       ROUND(STDDEV_POP(degree), 6) AS stddev_degree,
       MAX(degree)::BIGINT AS max_degree,
       ROUND(AVG(degree) + 2*STDDEV_POP(degree), 6) AS heavy_threshold
FROM deg"""
        ),
        "wedge_count": (
            "WITH "
            + EDGES_CTE
            + "\nSELECT SUM(degree*(degree-1)/2)::BIGINT AS wedges FROM deg"
        ),
        "pagerank": _pagerank_sql(),
        "connected_components": (
            "WITH RECURSIVE "
            + EDGES_CTE
            + """,
reach(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT sym.dst, reach.l FROM sym JOIN reach ON sym.src = reach.v
  WHERE reach.l < sym.dst
)
SELECT v, MIN(l)::BIGINT AS component FROM reach GROUP BY v"""
        ),
        "label_propagation": _labelprop_sql(),
        "bfs_levels": (
            "WITH RECURSIVE "
            + EDGES_CTE
            + """,
reach(v, level) AS (
  SELECT (SELECT MIN(v) FROM verts), 0::BIGINT
  UNION
  SELECT sym.dst, reach.level + 1 FROM sym JOIN reach ON sym.src = reach.v
  WHERE reach.level < 64
)
SELECT v, MIN(level)::BIGINT AS level FROM reach GROUP BY v"""
        ),
        "heavy_light_edges": (
            "WITH "
            + EDGES_CTE
            + """,
thr AS (SELECT AVG(degree) + 2*STDDEV_POP(degree) AS t FROM deg),
cls AS (
  SELECT v, CASE WHEN degree > (SELECT t FROM thr) THEN 'heavy' ELSE 'light' END AS w
  FROM deg
)
SELECT CASE WHEN a.w = 'light' AND b.w = 'light' THEN 'light'
            WHEN a.w = 'heavy' AND b.w = 'heavy' THEN 'heavy'
            ELSE 'mixed' END AS edge_class,
       COUNT(*)::BIGINT AS cnt
FROM edges JOIN cls a ON edges.src = a.v JOIN cls b ON edges.dst = b.v
GROUP BY 1"""
        ),
        "dedup_exact": """
SELECT md5(text) AS text_hash, MIN(doc_id)::BIGINT AS keep_doc_id,
       COUNT(*)::BIGINT AS n_dups
FROM documents GROUP BY md5(text)""",
        "neardup_jaccard": f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[i:i+2], ' ') AS sh
  FROM words, UNNEST(generate_series(1, GREATEST(len(w)-2, 1))) t(i)
),
sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS sz FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS c
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(c / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c / (sa.sz + sb.sz - c) >= {JACCARD_MIN}""",
        "text_stats": """
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(length(text)), 6) AS avg_chars,
       ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens
FROM documents GROUP BY lang""",
        "doc_quality": """
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       ROUND(length(text)::DOUBLE / len(string_split(text, ' ')), 6) AS chars_per_token,
       ROUND(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 6)
         AS type_token_ratio
FROM documents""",
        "similarity_topk": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {TOPK_NQUERY}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.emb, e.emb), 9) AS cs
  FROM q JOIN e ON q.vec_id <> e.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, rank::BIGINT AS rank, neighbor_id, ROUND(cs, 6) AS cos_sim
FROM ranked WHERE rank <= {TOPK_K}""",
        "events_window": """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2""",
    }
