"""SparkSession factory tuned for the engine.

Local mode stands in for a multi-executor cluster; the same builder is
what ``spark-submit --py-files`` would configure on a real cluster.
Parallelism is a parameter so the scaling run (N vs 4N cores, BASELINE
scaling-efficiency rule) uses identical config apart from core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cores_per_worker(master: str) -> int:
    """cores-per-worker field of a local-cluster[n,cores,mem] URL."""
    try:
        return max(1, int(master.rstrip("]").split(",")[1].strip()))
    except (IndexError, ValueError):
        return 1


def get_spark(
    app_name: str = "tlgs_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → ``local[*]``. Shuffle partitions default to the core
    count (local mode: more just adds task-launch overhead; on a real
    cluster this is sized to corpus/partition-bytes instead).

    ``master`` (or env ``TLGS_SPARK_MASTER``) overrides the master URL —
    the multi-JVM scaling probe passes ``local-cluster[N,1,mem_mb]`` so
    N executor JVMs run as real separate processes with inter-process
    shuffle/broadcast (the closest sandbox analog of N cluster
    executors). ``cores`` then still sizes shuffle partitions and must
    equal the total executor cores. local-cluster executors don't
    inherit the driver's sys.path, so PYTHONPATH is exported to them.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    master = master or os.environ.get("TLGS_SPARK_MASTER") or (
        f"local[{cores}]" if cores and cores > 0 else "local[*]"
    )
    if shuffle_partitions is None:
        # 4× cores: fine-grained tasks keep slots busy through skewed
        # stages (hot-term aggs) and shorten straggler tails; AQE
        # coalesces the small ones back together
        n = cores if cores and cores > 0 else (os.cpu_count() or 8)
        shuffle_partitions = max(4 * n, 16)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR scheduler (guide §2.6; r5 VERDICT #1): jobs that set no
        # pool land in "default" (internally FIFO — build behavior
        # unchanged, later jobs still back-fill straggler tails), while
        # each SERVING thread sets its own pool (engine._serving_pool),
        # so short selective queries stop head-of-line-blocking behind a
        # dense query's task waves once past the driver-path envelope.
        .config("spark.scheduler.mode",
                os.environ.get("TLGS_SPARK_SCHEDULER", "FAIR"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("TLGS_SPARK_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if master.startswith("local-cluster"):
        # executor JVMs are separate processes: give each its own heap
        # (the worker-memory field of the master URL caps it) and export
        # the repo onto their Python workers' path — spark-submit
        # --py-files does the same job on a real cluster
        exec_mem = os.environ.get("TLGS_SPARK_EXECUTOR_MEM")
        if not exec_mem:
            try:
                exec_mem = master.rstrip("]").split(",")[2].strip() + "m"
            except IndexError:
                exec_mem = "4g"
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        py_path = os.environ.get("PYTHONPATH", "")
        b = (
            b.config("spark.executor.memory", exec_mem)
            .config(
                "spark.executorEnv.PYTHONPATH",
                f"{repo_root}:{py_path}" if py_path else repo_root,
            )
            # every executor JVM on this box sees ALL its CPUs and sizes
            # GC/JIT/netty pools for the whole machine — N executors ×
            # machine-wide thread pools thrash the few cores the probe
            # pins them to (measured: 21M-turn mj8 phases uniformly
            # ~2.5x instead of ~4x). A real cluster's executors own
            # their cores; tell each JVM what it actually has (the
            # cores-per-worker field of the local-cluster URL).
            .config(
                "spark.executor.extraJavaOptions",
                f"-XX:ActiveProcessorCount={_cores_per_worker(master)}",
            )
            .config(
                "spark.driver.extraJavaOptions",
                "-XX:ActiveProcessorCount=2",
            )
            # multi-JVM mode is for scaling measurement: a modest driver
            # heap (scheduling only — executors hold the data) unless
            # explicitly overridden, so N-executor and 4N-executor runs
            # carry the same driver footprint
            .config(
                "spark.driver.memory",
                os.environ.get("TLGS_SPARK_DRIVER_MEM", "8g"),
            )
        )
    local_dir = os.environ.get("TLGS_SPARK_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Kill the gateway so a new master/core-count takes effect (needed for
    # the two-parallelism scaling run inside one Python process).
    from pyspark import SparkContext

    SparkContext._gateway = None  # type: ignore[attr-defined]
    SparkContext._jvm = None  # type: ignore[attr-defined]
