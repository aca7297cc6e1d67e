"""Pure-Python Apache Iceberg (format v2) hadoop-catalog table layer.

The north rule's input is *an Iceberg table* of source-code files. The
sandbox has no ``iceberg-spark-runtime`` jar and no network, so the JVM
catalog path (``sources/iceberg.py``) cannot execute here. This module
closes that gap at the *table-format* level, from the public Iceberg Table
Spec (https://iceberg.apache.org/spec/): it writes and reads real Iceberg
metadata — ``metadata/version-hint.text`` → ``vN.metadata.json`` →
snapshot → manifest-list Avro → manifest Avro → parquet data files — with
no JVM involvement, then hands the planned file list to
``spark.read.parquet``. Avro comes from the sibling stdlib implementation
(``avro_ocf.py``).

Spec surface implemented (enough for the planning chain a reader needs):

- table metadata JSON v2: schemas (with field-ids), identity partition
  specs, snapshots + snapshot-log + metadata-log, sequence numbers
- manifest lists (``manifest_file`` records, field-ids 500-517)
- manifests (``manifest_entry`` status/snapshot_id/data_file, ids 0-4,
  100-104, 134; identity partition record r102 with ids 1000+)
- snapshots: append commits, time travel by snapshot-id and by timestamp
- scan planning: manifest-entry status filtering (DELETED skipped) and
  partition pruning from the manifest's partition record — file-level
  pruning happens *before* Spark ever lists a file, exactly where the
  real runtime does it (driver-side planning)

Scale notes. Planning is driver-side by design — that is how Iceberg
itself works (manifests are O(#data-files) and read by the planner, not
shuffled). Data files keep ALL columns including identity-partitioned
ones (matching what Spark's Iceberg writer produces), so the read path is
a plain multi-file parquet scan with column pruning / predicate pushdown
intact. The fixture writer commits one partition at a time, which is fine
at test scale; a production writer fans out per-task (documented, not
load-bearing for the read path under test).

Determinism: UUIDs, snapshot ids, and commit timestamps derive from the
table path and commit sequence so fixtures are byte-reproducible.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import urllib.parse
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .avro_ocf import read_ocf, write_ocf

_EPOCH_MS = 1700000000000  # deterministic commit-clock base

_SPARK_TO_ICE = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "binary",
    T.DateType: "date",
}
_ICE_TO_SPARK = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
}
_ICE_TO_AVRO = {
    "string": "string",
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
    "date": "int",
}


def _iceberg_schema(spark_schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(spark_schema.fields, start=1):
        ice = _SPARK_TO_ICE.get(type(f.dataType))
        if ice is None:
            raise NotImplementedError(
                f"column {f.name!r}: Spark type {f.dataType} has no Iceberg "
                "mapping in this minimal layer"
            )
        fields.append(
            {"id": i, "name": f.name, "required": not f.nullable, "type": ice}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _spark_schema(ice_schema: dict) -> T.StructType:
    """Spark read schema for an Iceberg schema. All fields come back
    nullable: Spark's parquet file source reports every column nullable
    regardless of the requested schema (only the JVM Iceberg relation
    carries ``required`` through). ``required`` is still recorded
    faithfully in the table metadata."""
    return T.StructType(
        [
            T.StructField(f["name"], _ICE_TO_SPARK[f["type"]], True)
            for f in ice_schema["fields"]
        ]
    )


def _partition_spec(ice_schema: dict, partition_by: list[str]) -> dict:
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    fields = []
    for i, col in enumerate(partition_by):
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        fields.append(
            {
                "name": col,
                "transform": "identity",
                "source-id": by_name[col]["id"],
                "field-id": 1000 + i,
            }
        )
    return {"spec-id": 0, "fields": fields}


# --------------------------------------------------------------------------
# Avro schemas for manifests and manifest lists (field-ids per the spec)
# --------------------------------------------------------------------------


def _partition_record_schema(spec: dict, ice_schema: dict) -> dict:
    by_id = {f["id"]: f for f in ice_schema["fields"]}
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": pf["name"],
                "type": ["null", _ICE_TO_AVRO[by_id[pf["source-id"]]["type"]]],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in spec["fields"]
        ],
    }


def _manifest_entry_schema(spec: dict, ice_schema: dict) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "type": _partition_record_schema(spec, ice_schema),
                            "field-id": 102,
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    ],
                },
            },
        ],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2


# --------------------------------------------------------------------------
# write path (fixture writer)
# --------------------------------------------------------------------------


def _det_long(*parts: str) -> int:
    h = hashlib.sha256(":".join(parts).encode()).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 62) - 1)


def _read_metadata(table_dir: str) -> dict:
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
        path = os.path.join(table_dir, "metadata", f"v{v}.metadata.json")
    else:  # fall back to the highest committed version
        versions = glob.glob(os.path.join(table_dir, "metadata", "v*.metadata.json"))
        if not versions:
            raise FileNotFoundError(f"{table_dir}: no Iceberg metadata found")
        path = max(versions, key=lambda p: int(os.path.basename(p)[1:].split(".")[0]))
    with open(path) as f:
        return json.load(f)


def _write_partition_files(
    df: DataFrame, commit_dir: str, partition_by: list[str]
) -> list[tuple[str, dict]]:
    """Write parquet keeping ALL columns in every file (Iceberg's layout:
    partition values live in the manifest AND in the file columns). Returns
    [(absolute file path, {partition col: value})]."""
    out: list[tuple[str, dict]] = []
    if not partition_by:
        df.write.mode("overwrite").parquet(commit_dir)
        for p in sorted(glob.glob(os.path.join(commit_dir, "*.parquet"))):
            out.append((os.path.abspath(p), {}))
        return out
    # low-cardinality identity partitions: one filtered write per tuple
    # (a production writer fans out per task; planning-path-equivalent)
    tuples = [r.asDict() for r in df.select(*partition_by).distinct().collect()]
    for tup in sorted(tuples, key=lambda d: tuple(str(d[c]) for c in partition_by)):
        cond = None
        for c in partition_by:
            piece = F.col(c) == F.lit(tup[c])
            cond = piece if cond is None else (cond & piece)
        sub = os.path.join(
            commit_dir,
            *[f"{c}={urllib.parse.quote(str(tup[c]), safe='')}" for c in partition_by],
        )
        df.where(cond).write.mode("overwrite").parquet(sub)
        for p in sorted(glob.glob(os.path.join(sub, "*.parquet"))):
            out.append((os.path.abspath(p), dict(tup)))
    return out


def create_table(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    partition_by: list[str] | None = None,
) -> int:
    """Create a hadoop-catalog Iceberg table at ``table_dir`` from ``df``.
    Returns the first snapshot id."""
    if os.path.exists(os.path.join(table_dir, "metadata")):
        raise FileExistsError(f"{table_dir}: table already exists (use append)")
    partition_by = list(partition_by or [])
    ice_schema = _iceberg_schema(df.schema)
    spec = _partition_spec(ice_schema, partition_by)
    meta = {
        "format-version": 2,
        "table-uuid": "-".join(
            hashlib.sha256(table_dir.encode()).hexdigest()[i : i + 8] for i in (0, 8, 16, 24)
        ),
        "location": os.path.abspath(table_dir),
        "last-sequence-number": 0,
        "last-updated-ms": _EPOCH_MS,
        "last-column-id": len(ice_schema["fields"]),
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": [spec],
        "last-partition-id": (1000 + len(partition_by) - 1) if partition_by else 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    os.makedirs(os.path.join(table_dir, "metadata"))
    return _commit_append(spark, df, table_dir, meta, version=1)


def append(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a new append snapshot. Returns the snapshot id."""
    meta = _read_metadata(table_dir)
    want = _spark_schema(meta["schemas"][meta["current-schema-id"]])
    if [f.name for f in want.fields] != list(df.columns):
        raise ValueError(
            f"append schema mismatch: table has {[f.name for f in want.fields]}, "
            f"df has {list(df.columns)}"
        )
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    with open(hint) as f:
        version = int(f.read().strip()) + 1
    return _commit_append(spark, df, table_dir, meta, version=version)


def _commit_append(
    spark: SparkSession, df: DataFrame, table_dir: str, meta: dict, version: int
) -> int:
    ice_schema = meta["schemas"][meta["current-schema-id"]]
    spec = meta["partition-specs"][meta["default-spec-id"]]
    partition_by = [f["name"] for f in spec["fields"]]
    seq = meta["last-sequence-number"] + 1
    snapshot_id = _det_long(table_dir, "snap", str(seq))
    ts_ms = _EPOCH_MS + 1000 * seq

    commit_dir = os.path.join(table_dir, "data", f"commit-{seq:05d}")
    files = _write_partition_files(df, commit_dir, partition_by)
    if not files:
        raise ValueError("append of an empty DataFrame (no data files written)")

    entry_schema = _manifest_entry_schema(spec, ice_schema)
    entries = []
    added_rows = 0
    for path, part in files:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
        added_rows += n
        entries.append(
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest (spec)
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,  # DATA
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {c: part.get(c) for c in partition_by},
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(path),
                },
            }
        )
    manifest_path = os.path.join(
        table_dir, "metadata", f"{hashlib.sha256(str(snapshot_id).encode()).hexdigest()[:16]}-m0.avro"
    )
    write_ocf(manifest_path, entry_schema, entries)

    # manifest list = this commit's manifest + every prior snapshot's manifests
    new_entry = {
        "manifest_path": os.path.abspath(manifest_path),
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": spec["spec-id"],
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    prior: list[dict] = []
    if meta["current-snapshot-id"] != -1:
        cur = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, prior = read_ocf(cur["manifest-list"])
    list_path = os.path.join(
        table_dir, "metadata", f"snap-{snapshot_id}-1-{hashlib.sha256(str(seq).encode()).hexdigest()[:16]}.avro"
    )
    write_ocf(list_path, _MANIFEST_LIST_SCHEMA, [new_entry] + prior)

    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": ts_ms,
        "manifest-list": os.path.abspath(list_path),
        "schema-id": meta["current-schema-id"],
        "summary": {
            "operation": "append",
            "added-data-files": str(len(files)),
            "added-records": str(added_rows),
        },
    }
    if meta["current-snapshot-id"] != -1:
        snapshot["parent-snapshot-id"] = meta["current-snapshot-id"]

    new_meta = dict(meta)
    new_meta.update(
        {
            "last-sequence-number": seq,
            "last-updated-ms": ts_ms,
            "current-snapshot-id": snapshot_id,
            "snapshots": meta["snapshots"] + [snapshot],
            "snapshot-log": meta["snapshot-log"]
            + [{"timestamp-ms": ts_ms, "snapshot-id": snapshot_id}],
            "metadata-log": meta["metadata-log"]
            + (
                [
                    {
                        "timestamp-ms": meta["last-updated-ms"],
                        "metadata-file": os.path.join(
                            table_dir, "metadata", f"v{version - 1}.metadata.json"
                        ),
                    }
                ]
                if version > 1
                else []
            ),
        }
    )
    meta_path = os.path.join(table_dir, "metadata", f"v{version}.metadata.json")
    with open(meta_path, "w") as f:
        json.dump(new_meta, f, indent=2)
    with open(os.path.join(table_dir, "metadata", "version-hint.text"), "w") as f:
        f.write(str(version))
    return snapshot_id


# --------------------------------------------------------------------------
# read path (scan planning + Spark hand-off)
# --------------------------------------------------------------------------


@dataclass
class ScanPlan:
    snapshot_id: int
    sequence_number: int
    files: list[str] = field(default_factory=list)
    total_files: int = 0
    pruned_files: int = 0
    total_records: int = 0

    @property
    def kept_files(self) -> int:
        return len(self.files)


def _select_snapshot(
    meta: dict, snapshot_id: int | None, as_of_timestamp_ms: int | None
) -> dict:
    snaps = meta["snapshots"]
    if not snaps:
        raise ValueError("table has no snapshots")
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise ValueError(f"snapshot {snapshot_id} not found")
    if as_of_timestamp_ms is not None:
        eligible = [
            e for e in meta["snapshot-log"] if e["timestamp-ms"] <= as_of_timestamp_ms
        ]
        if not eligible:
            raise ValueError(f"no snapshot at or before {as_of_timestamp_ms}")
        want = max(eligible, key=lambda e: e["timestamp-ms"])["snapshot-id"]
        return next(s for s in snaps if s["snapshot-id"] == want)
    return next(s for s in snaps if s["snapshot-id"] == meta["current-snapshot-id"])


def _partition_match(partition: dict, partition_filter: dict[str, Any]) -> bool:
    for col, want in partition_filter.items():
        if col not in partition:
            continue  # not a partition column at this spec → cannot prune on it
        have = partition[col]
        allowed = want if isinstance(want, (list, tuple, set)) else (want,)
        if have not in allowed:
            return False
    return True


def plan_scan(
    table_dir: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    partition_filter: dict[str, Any] | None = None,
) -> ScanPlan:
    """Resolve version-hint → metadata → snapshot → manifest list →
    manifests → live data files, pruning by the manifest partition record."""
    meta = _read_metadata(table_dir)
    snap = _select_snapshot(meta, snapshot_id, as_of_timestamp_ms)
    plan = ScanPlan(snapshot_id=snap["snapshot-id"], sequence_number=snap["sequence-number"])
    _, manifests = read_ocf(snap["manifest-list"])
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        for e in entries:
            if e["status"] == STATUS_DELETED:
                continue
            df_rec = e["data_file"]
            plan.total_files += 1
            if partition_filter and not _partition_match(
                df_rec["partition"], partition_filter
            ):
                plan.pruned_files += 1
                continue
            plan.files.append(df_rec["file_path"])
            plan.total_records += df_rec["record_count"]
    return plan


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    partition_filter: dict[str, Any] | None = None,
) -> DataFrame:
    """DataFrame over the table's live data at the chosen snapshot.

    File-level partition pruning happens here (from manifests, before Spark
    lists anything); the same predicate is re-applied as a ``where`` so the
    result is exact even for non-identity future specs, and Catalyst pushes
    it into the parquet scan anyway.
    """
    meta = _read_metadata(table_dir)
    schema = _spark_schema(meta["schemas"][meta["current-schema-id"]])
    plan = plan_scan(table_dir, snapshot_id, as_of_timestamp_ms, partition_filter)
    if not plan.files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*plan.files)
    if partition_filter:
        for col, want in partition_filter.items():
            if isinstance(want, (list, tuple, set)):
                df = df.where(F.col(col).isin(list(want)))
            else:
                df = df.where(F.col(col) == F.lit(want))
    return df


def table_info(table_dir: str) -> dict:
    """Inspection helper: snapshots, current pointer, file/row totals."""
    meta = _read_metadata(table_dir)
    plan = plan_scan(table_dir) if meta["snapshots"] else None
    return {
        "table_uuid": meta["table-uuid"],
        "format_version": meta["format-version"],
        "current_snapshot_id": meta["current-snapshot-id"],
        "snapshots": [
            {
                "snapshot_id": s["snapshot-id"],
                "sequence_number": s["sequence-number"],
                "timestamp_ms": s["timestamp-ms"],
                "operation": s["summary"]["operation"],
            }
            for s in meta["snapshots"]
        ],
        "partition_by": [
            f["name"] for f in meta["partition-specs"][meta["default-spec-id"]]["fields"]
        ],
        "live_files": plan.kept_files if plan else 0,
        "live_records": plan.total_records if plan else 0,
    }
