"""Bucketed oriented-adjacency reuse (VERDICT r1 item 1a): build the
adjacency once as a v-bucketed table; subsequent triangle queries join it
without shuffling the adjacency side."""

from __future__ import annotations

from tests.conftest import TINY, make_edges


def test_bucketed_adjacency_roundtrip(spark):
    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_from_adjacency,
        write_oriented_adjacency,
    )

    import shutil

    e = make_edges(spark, TINY["bowtie"][0])
    spark.sql("DROP TABLE IF EXISTS tcs_adj_test")
    # a previously failed run can leave an orphaned managed-table location
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(wh.replace("file:", "") + "/tcs_adj_test", ignore_errors=True)
    write_oriented_adjacency(e, "tcs_adj_test", buckets=4)
    adj = spark.table("tcs_adj_test")
    got = triangle_count_from_adjacency(adj).collect()[0]["triangles"]
    want = triangle_count(e, "sql").collect()[0]["triangles"]
    assert got == want == TINY["bowtie"][1]
    # the bucketed layout removes the Exchange: a forced sort-merge
    # self-join on v plans with NO shuffle on either side
    a1 = spark.table("tcs_adj_test").hint("merge")
    a2 = spark.table("tcs_adj_test").withColumnRenamed("nbrs", "nbrs2").hint("merge")
    plan = a1.join(a2, "v")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Exchange" not in plan
    spark.sql("DROP TABLE IF EXISTS tcs_adj_test")


def test_from_adjacency_matches_on_rmat(spark):
    from triangle_counting_spark.operators.adjacency import oriented_adjacency
    from triangle_counting_spark.operators.orientation import (
        canonical_edges,
        orient_by_degree,
    )
    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_from_adjacency,
    )
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=9, num_partitions=4)
    adj = oriented_adjacency(orient_by_degree(canonical_edges(e)))
    a = triangle_count_from_adjacency(adj).collect()[0]["triangles"]
    b = triangle_count(e, "bcast").collect()[0]["triangles"]
    assert a == b
