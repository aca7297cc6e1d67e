from __future__ import annotations

from triangle_counting_spark.operators.triangles import (
    BroadcastCSRTriangles,
    triangle_count_estimate,
)
from triangle_counting_spark.sources.edges import file_cooccurrence_edges
from triangle_counting_spark.sources.files import skew_fixture


def test_skew_fixture_64bit_counters(spark):
    """FIXTURES.md §6 intent (its stated constant had an arithmetic slip —
    C(2000,3)=1,331,334,000 which fits uint32): a 3000-file mega-repo gives
    C(3000,3) + 500 = 4,495,501,500 > 2^32, proving 64-bit counters
    end-to-end (the reference's UINT_t would overflow, SURVEY.md §1.4)."""
    edges = file_cooccurrence_edges(skew_fixture(spark, mega_files=3000)).persist()
    counter = BroadcastCSRTriangles(edges, assume_canonical=True)
    got = counter.count()
    assert got == 3000 * 2999 * 2998 // 6 + 500
    assert got > 2**32


def test_sampled_estimate_in_range(spark):
    edges = file_cooccurrence_edges(skew_fixture(spark, mega_files=300)).persist()
    exact = 300 * 299 * 298 // 6 + 500
    est = triangle_count_estimate(edges, p=0.5, seed=42).collect()[0][
        "triangles_estimate"
    ]
    # p=0.5 on a clique: estimator variance is small; 25% tolerance
    assert abs(est - exact) / exact < 0.25, (est, exact)
