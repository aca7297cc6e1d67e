"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every conf here is chosen for a
multi-executor cluster reading 100 TB:

- AQE on (runtime coalesce, skew-join splitting — the Spark analog of the
  reference's dynamic OpenMP scheduling, tc_parallel.c:22) ,
- shuffle partitions sized to the parallelism level (caller-tunable),
- Arrow execution for the pandas-UDF kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_conf(
    catalog: str = "ice",
    warehouse: str | None = None,
    catalog_impl: str = "hadoop",
) -> dict[str, str]:
    """Spark conf for an Apache Iceberg catalog (the north rule's input is
    an Iceberg table of source files).

    Standard public configuration (Iceberg docs): a SparkCatalog entry plus
    the extensions class. Requires ``iceberg-spark-runtime`` on the
    classpath — not bundled in this sandbox, so the confs are exposed as a
    pure dict (unit-testable) and :func:`get_spark` applies them when
    ``iceberg_catalog`` is set.
    """
    wh = warehouse or os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE", "/tmp/iceberg-wh")
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_impl,
        f"spark.sql.catalog.{catalog}.warehouse": wh,
    }


def _max_result_bytes(floor: int = 2 * 1024**3) -> int:
    """driver heap / 8 (floor 2 GiB) — keeps ``spark.driver.maxResultSize``
    consistent with the planner's heap-derived blocked-tier cutoff."""
    raw = os.environ.get("SPARK_DRIVER_MEMORY", "8g").strip().lower()
    unit = 1024**3 if raw.endswith("g") else 1024**2 if raw.endswith("m") else 1
    try:
        heap = int(float(raw.rstrip("gm"))) * unit
    except ValueError:
        return floor
    return max(floor, heap // 8)


def get_spark(
    app_name: str = "triangle-counting-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    iceberg_catalog: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    so the bench harness can run the identical job at two parallelism
    levels (the sandbox stand-in for N vs 4N executor clusters).

    ``iceberg_catalog``: name of an Iceberg catalog to configure (see
    :func:`iceberg_conf`); needs the iceberg-spark-runtime jar at runtime.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one-ish shuffle partition per core locally; on a real cluster this
        # is set to 2-3x total executor cores (or left to AQE coalesce).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MB input splits: at 100 TB that is ~800k scan tasks — small
        # enough that one task's rows (+ its shuffle write buffers) fit
        # executor memory even on array-heavy adjacency rows, large enough
        # to amortize task startup. Raise for pure-columnar narrow scans.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # the blocked/bcast tiers COLLECT up to bcast_max_edges × 16 B ≈
        # heap/10 by design (plans/planner.py) — Spark's 1 GiB
        # maxResultSize default contradicts that memory model and kills
        # the sanctioned collect at ~62M+ edges on a big-heap box
        # (measured: RMAT-22 bfs blocked tier, 67M edges → 1045 MiB
        # result > 1024 MiB cap). Size it to the same model: heap/8,
        # floor 2 GiB, env-overridable via SPARK_GRAFT_MAX_RESULT.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", str(_max_result_bytes())),
        )
        # pin the session tz: epoch arithmetic over TIMESTAMP_NTZ columns
        # (sessionize, event windows) interprets naive timestamps in the
        # SESSION zone — unpinned, results shift by the host's UTC offset
        # and split sessions across DST transitions; the SQL oracles treat
        # naive timestamps as UTC, so the engine must too
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if iceberg_catalog:
        for k, v in iceberg_conf(iceberg_catalog).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
