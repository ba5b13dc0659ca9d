"""SparkSession construction and tuning.

Scale posture: these confs are the local[32] analog of a 1000-executor
cluster config — AQE for runtime re-planning (skew joins, partition
coalescing), filter/aggregate pushdown to Parquet, Arrow for the few
pandas-UDF paths. `tune()` applies the runtime-settable subset to an
externally-owned session (the driver hands us one in __spark_entry__).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must be set before the session exists.
_BUILD_CONFS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep Spark's 10 MB default: raising it (r1-r3 used 64 MB) makes the
    # static size estimator broadcast FILTERED FACT TABLES near the
    # boundary (a column-pruned 6M-row lineitem estimates ~16 MB and the
    # planner builds a multi-million-entry hash relation per execution —
    # measured 2-3s/query at 10x sf0.1, and catastrophic on a real
    # cluster). Dim tables stay comfortably under 10 MB; joins that lose
    # a marginal broadcast fall back to shuffle joins that scale.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Older testdata vintages store events.ts as TIMESTAMP(NANOS), which
    # Spark's reader rejects without this conf (reads as long ns instead;
    # __spark_entry__._events type-dispatches). Harmless no-op on the
    # current vintage's TIMESTAMP(MICROS) data.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
    # No data-locality delay: in local mode every task is process-local
    # (the 3s default only postpones scheduling), and on a modern
    # cluster network reading a non-local shuffle block is cheaper than
    # idling an executor slot. Measured ~50ms/job off the local floor.
    "spark.locality.wait": "0",
}

# Runtime-settable subset, safe on a session we did not create.
_RUNTIME_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ext_jar_path() -> str | None:
    """Path of the committed Catalyst extension jar (the index-covered
    COUNT rewrite for PLAIN spark.sql — columnar_spark/jvm/), or None.
    Rebuild with tools/build_jvm_ext.sh."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jvm", "columnar-spark-ext.jar")
    return p if os.path.exists(p) else None


def get_spark(app_name: str = "columnar-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Cluster-friendly: when a master is already configured (spark-submit
    --master, spark-defaults, or SPARK_MASTER env) it is respected; the
    local[N] master is only a fallback for bare `python` invocations
    (tests, bench, CLI on a laptop)."""
    from pyspark import SparkConf

    configured = SparkConf().get("spark.master", None) or os.environ.get("SPARK_MASTER")
    builder = SparkSession.builder.appName(app_name)
    if configured:
        builder = builder.master(configured)
    else:
        cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
        builder = builder.master(f"local[{cpus}]")
    for k, v in _BUILD_CONFS.items():
        builder = builder.config(k, v)
    # Catalyst extension (reference CalcCount is host-wired
    # unconditionally, secondary.cpp:531-551): the JVM rule makes the
    # index-covered COUNT rewrite reach PLAIN spark.sql, not only the
    # Engine.sql facade. Session-creation-time only — an already-running
    # session (getOrCreate reuse) keeps whatever it was built with.
    jar = ext_jar_path()
    if jar:
        builder = (
            builder.config("spark.jars", jar)
            .config("spark.driver.extraClassPath", jar)
            .config("spark.sql.extensions", "ColumnarSparkExtensions")
        )
    spark = builder.getOrCreate()
    tune(spark)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    UTC session time zone keeps timestamp semantics identical to the
    DuckDB oracle (parquet timestamps are naive micros; reference
    TIMESTAMP is plain uint32 seconds — common/schema.h:31).
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session build; fine
    return spark
