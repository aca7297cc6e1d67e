"""Property-based differential test: on arbitrary small graphs, every
physical strategy equals a brute-force Python oracle (the reference's
all-algorithms-agree methodology, main.c:153-158, as a hypothesis law)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edge_sets = st.sets(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=24,
)


def brute_force(pairs) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        a, b = min(a, b), max(a, b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    return sum(
        1
        for a, b, c in combinations(verts, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


@settings(
    max_examples=12,  # each example spins Spark jobs; 12 × 7 strategies
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_sets)
def test_all_strategies_match_python_oracle(spark, pairs):
    from triangle_counting_spark.operators.triangles import (
        STRATEGIES,
        triangle_count,
    )

    want = brute_force(pairs)
    rows = [(int(a), int(b)) for a, b in pairs] or [(0, 1)]
    e = spark.createDataFrame(rows, "src long, dst long")
    if not pairs:
        want = 0
    for strategy in STRATEGIES:
        if strategy == "auto":
            continue  # delegates to one of the others
        got = triangle_count(e, strategy).collect()[0]["triangles"]
        assert got == want, (strategy, sorted(pairs), got, want)
