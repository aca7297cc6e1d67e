"""Gate results must be invariant to confs the driver's session may set
differently from ours (VERDICT r3 item #9): session timezone and the
parquet NTZ-infer read mode. Round 3 lost the ``sessions`` gate to
exactly this; the timestamp-touching queries are the exposed surface
(everything else is integer/string keyed).

Both confs are runtime-settable, so one shared JVM covers the matrix.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

TZ_QUERIES = ["sessions", "events_window"]

CONFIGS = [
    ("true", "UTC"),
    ("true", "America/New_York"),  # NTZ read + offset tz: the r3 killer
    ("true", "Asia/Kolkata"),  # non-whole-hour offset
    ("false", "America/New_York"),  # instant read + offset tz
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("qname", TZ_QUERIES)
def test_timestamp_queries_invariant_to_session_conf(spark, qname):
    import __spark_entry__ as entry

    fn = entry.queries()[qname]
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    saved_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    results = []
    try:
        for ntz, tz in CONFIGS:
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz)
            spark.conf.set("spark.sql.session.timeZone", tz)
            results.append(((ntz, tz), _norm(fn(spark, SF_DIR).toPandas())))
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", saved_ntz)
    base_cfg, base = results[0]
    assert len(base) > 0, "invariance over an empty result is vacuous"
    for cfg, got in results[1:]:
        pd.testing.assert_frame_equal(
            got, base, check_dtype=False, check_exact=True,
            obj=f"{qname} under {cfg} vs {base_cfg}",
        )


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("qname", TZ_QUERIES)
def test_timestamp_queries_invariant_to_partition_count(spark, qname):
    """Float-sum accumulation order must not leak into results (the other
    r3 `sessions` suspect): exact integer micro-unit sums make the result
    independent of `spark.sql.shuffle.partitions`."""
    import __spark_entry__ as entry

    fn = entry.queries()[qname]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = _norm(fn(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        many = _norm(fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    pd.testing.assert_frame_equal(many, one, check_dtype=False, check_exact=True)
