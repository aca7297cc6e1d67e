"""Driver-contract consistency guards (no Spark session needed)."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, os_ = entry.queries(), entry.oracle_sql()
    missing = [k for k in qs if k not in os_]
    assert missing == [], f"gate queries without oracle SQL: {missing}"


def test_oracles_do_not_orphan_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    orphans = [k for k in os_ if k not in qs]
    assert orphans == [], f"oracle SQL without a gate query: {orphans}"


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in entry.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir), got {params}"


def test_oracle_sql_mentions_only_registered_tables():
    # the driver pre-registers exactly these views; an oracle referencing
    # anything else fails at gate time — catch it at test time instead
    tables = set(
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    )
    import re

    for name, sql in entry.oracle_sql().items():
        for m in re.findall(r"\bFROM\s+([a-z_][a-z0-9_]*)", sql, re.IGNORECASE):
            tok = m.lower()
            # CTE names are declared in the same statement
            if tok in tables or f"{tok} as" in sql.lower() or f"{tok}(" in sql.lower():
                continue
            assert re.search(
                rf"\b{tok}\s+AS\b", sql, re.IGNORECASE
            ), f"{name}: FROM {tok} is neither a registered view nor a CTE"


def test_gate_count_matches_readme_claim():
    n = len(entry.queries())
    readme = open("README.md").read()
    assert f"All {n} gate queries" in readme, (
        f"README gate-count claim is stale: {n} queries in __spark_entry__"
    )


def test_gate_count_within_driver_budget():
    # the driver gates at most 50 queries per round (observed r3: exactly
    # the first 50 of 63 ran; the rest went stale) — a gate that never
    # runs is not a gate, so the registry must fit the budget
    assert len(entry.queries()) <= 50
