"""SparkSession factory tuned for the link-graph engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-planning + skew-join splitting for hub vertices), Arrow
enabled for the vectorized pandas-UDF path, shuffle partitions sized
to cores instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _default_driver_mem() -> str:
    """Size the local-mode JVM heap from what the host can actually
    give (60% of MemAvailable, clamped to [4g, 24g]) instead of a
    fixed number that OOM-kills smaller hosts. Bench/scaling scripts
    still pin an explicit SPARK_GRAFT_DRIVER_MEM."""
    try:
        with open("/proc/meminfo") as f:
            kb = next(int(l.split()[1]) for l in f if l.startswith("MemAvailable"))
        return f"{max(4, min(24, int(kb / 1024 / 1024 * 0.6)))}g"
    except Exception:
        return "8g"


def _java_opts() -> str:
    """User opts win; the throughput-GC default is appended unless the
    user already chose a collector (env replaces, not merges)."""
    opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
    if "GC" not in opts:
        opts = (opts + " -XX:+UseParallelGC").strip()
    return opts


def get_spark(
    app_name: str = "linkgraph",
    cores: int | str = "*",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is the local[] parallelism; on a real cluster this factory
    is bypassed and the session comes from spark-submit, so every config
    here is also safe/ignored under YARN/K8s.
    """
    if shuffle_partitions is None:
        shuffle_partitions = (
            int(cores) if isinstance(cores, int) or str(cores).isdigit() else DEFAULT_SHUFFLE_PARTITIONS
        )
    # SPARK_GRAFT_MASTER overrides the single-JVM local[] master — the
    # multi-JVM scaling legs pass local-cluster[W,C,mem_mb] so each
    # "executor" gets its OWN heap and GC (the one-box proxy closest to
    # a real N-executor cluster; also the bed that shows the local-mode
    # ParallelGC full-GC ramp vanishing with separate heaps)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory caps reduce-side parallelism at
        # (shuffle bytes / 64m) tasks — far below core count for
        # mid-size supersteps; 16m keeps all cores busy
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PART", "16m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # superstep joins are co-partitioned by construction: a shuffled
        # hash join streams the (cached/bucketed) arc table without
        # sorting it every iteration; SMJ re-sorts m rows per superstep
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # G1's concurrent mark cycles + humongous-allocation churn stall
        # gather supersteps for seconds (measured: 2.7s young pauses,
        # 18s mark cycles at 48g); throughput GC suits batch supersteps
        .config("spark.driver.extraJavaOptions", _java_opts())
        .config("spark.executor.extraJavaOptions", _java_opts())
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem())
        .config("spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
        # localCheckpoint/collect task-result metadata scales with task
        # count; the 1g default aborts wide materializations
        .config("spark.driver.maxResultSize", "4g")
        # a taskset-pinned low-core leg (scaling_bench) runs driver +
        # executor + netty + GC on 2 cores: a long shuffle write can
        # starve the in-process heartbeat thread past the default
        # 60×10s failure budget and kill the executor mid-job. Batch
        # supersteps never need fast failure detection — be patient.
        .config("spark.executor.heartbeatInterval", "20s")
        .config("spark.executor.heartbeat.maxFailures", "240")
        .config("spark.network.timeout", "600s")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"))
        # local-mode shuffles go through spark.local.dir; on a RAM-rich
        # box pointing it at tmpfs removes the disk bottleneck that
        # otherwise caps superstep scaling (set SPARK_GRAFT_LOCAL_DIR)
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
