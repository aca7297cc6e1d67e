"""Pure-Python Iceberg v2 hadoop-catalog table: write → plan → read.

Closes VERDICT r4 "What's missing" #3 as far as the sandbox allows: with no
iceberg-spark-runtime jar and no network, the JVM catalog path cannot run,
so the table FORMAT itself is implemented from the public spec
(sources/iceberg_format.py) and exercised end-to-end here — catalog
create → snapshot/manifest chain → scan planning with partition pruning →
spark.read → co-occurrence edge derivation → sha256 audit green.
"""

from __future__ import annotations

import json
import os

import pytest

from triangle_counting_spark.sources import iceberg_format as ice
from triangle_counting_spark.sources.avro_ocf import read_ocf
from triangle_counting_spark.sources.files import synthetic_files


def sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ice") / "files_table")
    df = synthetic_files(spark, n_files=300, n_repos=20, seed=7)
    snap1 = ice.create_table(spark, df, d, partition_by=["lang"])
    return d, df, snap1


def test_roundtrip_equals_source(spark, table):
    d, df, _ = table
    got = ice.read_table(spark, d)
    # names+types round-trip; nullability comes back all-nullable (Spark's
    # parquet file source property — metadata still records `required`,
    # asserted below)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    meta = ice._read_metadata(d)
    required = {f["name"]: f["required"] for f in meta["schemas"][0]["fields"]}
    assert required == {f.name: not f.nullable for f in df.schema.fields}
    assert sorted_rows(got) == sorted_rows(df)


def test_layout_is_spec_shaped(table):
    d, _, snap1 = table
    with open(os.path.join(d, "metadata", "version-hint.text")) as f:
        assert f.read().strip() == "1"
    meta = json.load(open(os.path.join(d, "metadata", "v1.metadata.json")))
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == snap1
    spec = meta["partition-specs"][0]["fields"][0]
    assert (spec["name"], spec["transform"], spec["field-id"]) == ("lang", "identity", 1000)
    # manifest list → manifest chain resolvable by the stdlib avro reader
    snap = meta["snapshots"][0]
    schema, manifests = read_ocf(snap["manifest-list"])
    assert schema["name"] == "manifest_file"
    assert manifests[0]["added_snapshot_id"] == snap1
    eschema, entries = read_ocf(manifests[0]["manifest_path"])
    assert eschema["name"] == "manifest_entry"
    assert all(e["status"] == ice.STATUS_ADDED for e in entries)
    # field-ids survive into the written avro schema (Iceberg requirement)
    by_name = {f["name"]: f for f in eschema["fields"]}
    assert by_name["status"]["field-id"] == 0
    assert by_name["data_file"]["field-id"] == 2


def test_partition_pruning_from_manifests(spark, table):
    d, df, _ = table
    plan_all = ice.plan_scan(d)
    plan_py = ice.plan_scan(d, partition_filter={"lang": "py"})
    assert plan_py.pruned_files > 0
    assert plan_py.kept_files + plan_py.pruned_files == plan_all.total_files
    got = ice.read_table(spark, d, partition_filter={"lang": "py"})
    assert sorted_rows(got) == sorted_rows(df.where("lang = 'py'"))
    # multi-value filter
    got2 = ice.read_table(spark, d, partition_filter={"lang": ["py", "go"]})
    assert sorted_rows(got2) == sorted_rows(df.where("lang in ('py','go')"))


def test_append_and_time_travel(spark, table):
    d, df, snap1 = table
    extra = synthetic_files(spark, n_files=60, n_repos=20, seed=99)
    snap2 = ice.append(spark, extra, d)
    assert snap2 != snap1
    # current = union, snapshot-id time travel = original
    assert ice.read_table(spark, d).count() == 360
    assert sorted_rows(ice.read_table(spark, d, snapshot_id=snap1)) == sorted_rows(df)
    # timestamp time travel via snapshot-log
    info = ice.table_info(d)
    t1 = info["snapshots"][0]["timestamp_ms"]
    assert ice.read_table(spark, d, as_of_timestamp_ms=t1).count() == 300
    assert info["current_snapshot_id"] == snap2
    assert info["live_records"] == 360
    assert [s["operation"] for s in info["snapshots"]] == ["append", "append"]
    # second snapshot's manifest list carries BOTH manifests (v2 layout)
    meta = ice._read_metadata(d)
    cur = next(s for s in meta["snapshots"] if s["snapshot-id"] == snap2)
    _, manifests = read_ocf(cur["manifest-list"])
    assert len(manifests) == 2


def test_north_rule_derivation_over_iceberg(spark, table):
    """The north-rule chain on the Iceberg read path: derive co-occurrence
    edges + per-row sha256 audit, equal to the direct-DataFrame result."""
    from triangle_counting_spark.sources.edges import (
        file_cooccurrence_edges,
        file_vertices,
        sha256_audit,
    )

    d, df, snap1 = table
    files_ice = ice.read_table(spark, d, snapshot_id=snap1)
    v_ice = file_vertices(files_ice)
    assert sha256_audit(files_ice, v_ice).count() == 0  # audit green
    e_ice = file_cooccurrence_edges(files_ice)
    e_dir = file_cooccurrence_edges(df)
    assert sorted_rows(e_ice) == sorted_rows(e_dir)


def test_error_paths(spark, table, tmp_path):
    d, df, _ = table
    with pytest.raises(FileExistsError):
        ice.create_table(spark, df, d)
    with pytest.raises(ValueError, match="schema mismatch"):
        ice.append(spark, df.select("repo", "path"), d)
    with pytest.raises(ValueError, match="empty"):
        ice.append(spark, df.where("1=0"), d)
    with pytest.raises(FileNotFoundError):
        ice.plan_scan(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="not found"):
        ice.plan_scan(d, snapshot_id=123)


def test_catalog_entrypoint_dispatches_to_format_layer(spark, table):
    """sources.iceberg.read_iceberg_table serves path-addressed hadoop
    tables through the pure-Python layer (jarless), incl. time travel."""
    from triangle_counting_spark.sources.iceberg import read_iceberg_table

    d, df, snap1 = table
    assert read_iceberg_table(spark, d).count() == 360
    assert read_iceberg_table(spark, d, snapshot_id=snap1).count() == 300


def test_version_hint_fallback(spark, table):
    """A missing version-hint resolves to the highest committed metadata
    version (hadoop-catalog recovery rule)."""
    d, _, _ = table
    hint = os.path.join(d, "metadata", "version-hint.text")
    saved = open(hint).read()
    os.remove(hint)
    try:
        assert ice.read_table(spark, d).count() == 360
    finally:
        open(hint, "w").write(saved)
