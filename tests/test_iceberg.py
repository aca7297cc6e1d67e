"""Iceberg read path (VERDICT r1 item 8): conf shape unit-tested; the
actual catalog read is exercised only if iceberg-spark-runtime is present
(not bundled in this sandbox → skipped, with the error path asserted)."""

from __future__ import annotations

import pytest


def test_iceberg_conf_shape():
    from triangle_counting_spark.session import iceberg_conf

    c = iceberg_conf("ice", warehouse="/tmp/wh")
    assert c["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.ice.type"] == "hadoop"
    assert c["spark.sql.catalog.ice.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in c["spark.sql.extensions"]


def test_read_iceberg_table_errors_cleanly_without_runtime(spark):
    from triangle_counting_spark.sources.iceberg import read_iceberg_table

    with pytest.raises(Exception) as ei:
        read_iceberg_table(spark, "ice.db.files")
    # either our wrapped RuntimeError or Spark's table-not-found — never a
    # silent empty result
    assert "ice" in str(ei.value) or "TABLE_OR_VIEW_NOT_FOUND" in str(ei.value)
