"""SparkSession factory tuned for this engine.

Defaults favor the local[N] test harness but every knob is the one you
would set on a real cluster: AQE on (runtime coalesce + skew-join),
Arrow on (fast pandas interchange for the few UDF paths), sensible
shuffle parallelism, and 128 MB scan partitions so a 100 TB input maps
to ~800k tasks rather than a handful of giant ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cpx-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS``
    so the bench harness and tests share one code path.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    # transformWithState needs google.protobuf in every JVM-spawned
    # python process (state-server clients in executor workers AND the
    # schema-validation driver worker, which addPyFile cannot reach).
    # If no system protobuf exists, expose the vendored pure-python
    # runtime via PYTHONPATH BEFORE the JVM launches so all child
    # processes inherit it; a real installation always wins.
    # NOTE: "importable in-process" is NOT the test — if vendor
    # .activate() already ran in this process, google.protobuf imports
    # fine here via sys.path, but JVM children inherit only PYTHONPATH
    # (code-review r9). Export whenever the import resolves to the
    # vendored tree OR fails entirely; skip only for a real install.
    vendor_dir = os.path.join(os.path.dirname(__file__), "vendor")
    needs_export = True
    try:  # pragma: no cover - depends on container contents
        import google.protobuf as _gp  # noqa: F401

        gp_file = getattr(_gp, "__file__", None)
        if gp_file:  # real installs and the vendored tree both set it
            gp_dir = os.path.dirname(os.path.abspath(gp_file))
            needs_export = gp_dir.startswith(vendor_dir + os.sep)
    except ImportError:
        pass
    if needs_export:
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if vendor_dir not in parts:
            os.environ["PYTHONPATH"] = (
                vendor_dir + os.pathsep + os.environ.get("PYTHONPATH", "")
            ).rstrip(os.pathsep)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalesce floor defaults to 1 MB per partition, which
        # collapses the MB-scale shuffles of a local test corpus onto
        # 1-2 cores (measured: the k=64 minhash agg ran 4x slower on 2
        # threads than on 32). 64 KB keeps small shuffles parallel; at
        # cluster scale the parallelism-first target (total/parallelism)
        # dwarfs this floor, so the knob is inert on big shuffles.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas/UDF interchange (multimodal, streaming state).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Scan granularity: 128 MB keeps per-task memory bounded at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Dims under 64 MB broadcast automatically; explicit hints elsewhere.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # The test corpus stores TIMESTAMP(NANOS); Spark's reader has no
        # nanos type, so read as long and convert in the registry.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("CPX_WAREHOUSE_DIR", "/tmp/cpx_etl_spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
