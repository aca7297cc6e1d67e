"""Every oracle's DuckDB result dtypes must match the Spark result schema
(VERDICT r4 item #2) — making the `sessions` failure class structurally
impossible, the way test_harness_invariance.py did for timezones.

Round 4 lost the `sessions` gate because a windowed ``SUM(CASE ...)``
with no ``::BIGINT`` cast comes back from DuckDB as HUGEINT, which lands
in pandas as float64 while Spark returns int64; the driver's value hash
is type-sensitive, so ``1.0`` vs ``1`` fails even though the values are
equal. This test runs every oracle through DuckDB at sf0.001 and pins
each column's pandas dtype against the dtype of the Spark result's own
``toPandas()`` — exactly the two frames the driver hashes — so any
uncast HUGEINT/DECIMAL fails here before the driver sees it. (Comparing
against ``toPandas()`` rather than the logical schema is deliberate: a
NULL-bearing int64 column promotes to float64 on BOTH sides, which the
driver's hash accepts; only an asymmetric promotion is a bug.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Spark types whose pandas landing dtype is deterministic enough to pin.
# Columns with types outside this set (timestamps, arrays) are skipped —
# the oracle surface deliberately converts timestamps to epoch BIGINTs (r3).
_PINNED = {
    T.LongType(),
    T.IntegerType(),
    T.DoubleType(),
    T.FloatType(),
    T.BooleanType(),
    T.StringType(),
}


def _oracle_names():
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    return sorted(set(qs) & set(os_))


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("qname", _oracle_names())
def test_oracle_dtypes_match_spark_schema(spark, duck, qname):
    import __spark_entry__ as entry

    sdf = entry.queries()[qname](spark, SF_DIR)
    pinned = {f.name for f in sdf.schema.fields if f.dataType in _PINNED}
    got_spark = sdf.toPandas()
    got_duck = duck.sql(entry.oracle_sql()[qname]).df()
    assert sorted(got_duck.columns) == sorted(got_spark.columns)
    # object-vs-string backends vary by pandas/pyarrow version; both hash
    # the same after the driver's str() normalization, so fold them.
    def _d(s):
        d = str(s.dtype)
        return "object" if d in ("object", "string", "str") else d

    bad = {
        c: (_d(got_spark[c]), _d(got_duck[c]))
        for c in got_spark.columns
        if c in pinned and _d(got_spark[c]) != _d(got_duck[c])
    }
    assert not bad, (
        f"{qname}: spark toPandas dtype != oracle dtype for "
        f"{bad} (uncast HUGEINT/DECIMAL or asymmetric NULL promotion — "
        "add an explicit ::BIGINT / ::DOUBLE cast in oracle_sql())"
    )
