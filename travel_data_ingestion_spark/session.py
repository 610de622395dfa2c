"""SparkSession factory tuned for this engine.

Design notes for scale (100 TB target, tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and runtime join-strategy demotion all matter far more at 1000
  executors than locally.
- shuffle.partitions is sized to cores locally; on a real cluster this is
  overridden (AQE's coalesce makes the initial number less critical).
- UTC session timezone: parity with the DuckDB oracle (naive UTC
  timestamps) and with the reference's TIMESTAMP_NTZ silver columns
  (reference sql/silver_google_timeline.sql:4-5).
- dynamic partition overwrite: the idempotent silver sink rewrites only
  the load_id partitions it touches (reference utils.py:12-46 semantics).
- Arrow enabled: all pandas interchange (createDataFrame/toPandas and
  pandas UDFs) goes through Arrow batches, never row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def session_token(spark: SparkSession) -> str:
    """Stable identity for a Python SparkSession wrapper, for keying
    driver-side memo caches. ``id(spark)`` is NOT usable for this:
    CPython recycles addresses after GC, so a new session allocated at a
    dead session's address would collide and the cache would hand back a
    DataFrame bound to the dead session. The token is stored as an
    attribute on the wrapper, so it dies with the object — a fresh
    wrapper can only ever miss, never falsely hit."""
    tok = getattr(spark, "_tdi_session_token", None)
    if tok is None:
        import uuid

        tok = uuid.uuid4().hex
        spark._tdi_session_token = tok
    return tok


def _export_pythonpath(effective_master: str) -> bool:
    """Whether to export the driver's repo root as
    spark.executorEnv.PYTHONPATH. Only correct when executors share
    the driver's filesystem: local / local-cluster masters (executor
    JVMs on this machine). On yarn/k8s/standalone-remote the driver's
    paths mean nothing on executors, so the export is skipped and
    --py-files/wheels is the documented shipping mechanism;
    SPARK_EXPORT_PYTHONPATH=1 opts in for shared-FS standalone."""
    return effective_master.startswith("local") or (
        os.environ.get("SPARK_EXPORT_PYTHONPATH") == "1"
    )


def get_spark(
    app_name: str = "travel_data_ingestion_spark",
    master: str | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # local mode = driver-only: the driver heap is ALL the memory
        # (executors, broadcasts, shuffle). The 1g default OOMs the first
        # nontrivial broadcast at >=8x sf0.1 (measured via scale_probe).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime bloom-filter join pruning (semi-join reduction): when a
        # shuffle join's build side is selective, inject a bloom filter of
        # its join keys into the probe side's scan, dropping non-matching
        # rows BEFORE the shuffle. At 100 TB this is the difference between
        # shuffling the full fact table and shuffling only rows that can
        # match. Default thresholds (10M creation / 10G application) are
        # cluster-appropriate; kept explicit so the policy is visible.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_MASTER"):
        # explicit override (e.g. SPARK_MASTER=local-cluster[4,8,6144]
        # for the multi-JVM evidence tier — tools/lc_bench.py,
        # tools/lc_check.py, SCALE.md §9)
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cores}]")
    if os.environ.get("SPARK_EXECUTOR_MEMORY"):
        # only meaningful off local mode: local-mode executors live in
        # the driver heap, sized by SPARK_DRIVER_MEMORY above
        builder = builder.config(
            "spark.executor.memory", os.environ["SPARK_EXECUTOR_MEMORY"]
        )
    # Executor-side Python workers must import this package. In
    # local[*] they inherit the driver's sys.path; in local-cluster
    # the executor JVMs spawn their own workers ON THIS MACHINE, so
    # the repo root is exported explicitly. The export is gated on
    # masters whose executors share the driver's filesystem (local /
    # local-cluster) — on a real cluster the driver's paths mean
    # nothing on remote executors, and --py-files/wheels is the
    # documented shipping mechanism (SPARK_EXPORT_PYTHONPATH=1
    # opts in anyway for shared-filesystem standalone setups).
    effective_master = (
        master
        or os.environ.get("SPARK_MASTER")
        or f"local[{cores}]"
    )
    if _export_pythonpath(effective_master):
        repo_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        exec_pp = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            repo_root + (os.pathsep + exec_pp if exec_pp else ""),
        )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ensure_checkpoint_dir(spark)
    return spark


def _ensure_checkpoint_dir(spark: SparkSession) -> None:
    """Guarantee a RELIABLE checkpoint dir whenever one can be correct.

    The connected-components propagation (llm_dedup.propagate_min_labels)
    must truncate lineage every pass; without a checkpoint dir it falls
    back to ``localCheckpoint``, whose blocks live on executors — an
    executor loss mid-propagation on a real cluster kills the job. So:

    - ``SPARK_CHECKPOINT_DIR`` set -> use it (on a cluster this must be
      shared storage: HDFS/S3/NFS).
    - else, LOCAL master only -> a process-lifetime temp dir (single-JVM:
      driver-local disk IS reliable storage, and "executor loss" means
      the app died anyway).
    - else (real cluster, no env) -> leave unset: a driver-local temp
      path would be silently wrong (executors write checkpoint files on
      their own machines), so the propagation's documented
      localCheckpoint fallback is the lesser risk.
    """
    sc = spark.sparkContext
    try:
        if sc._jsc.sc().getCheckpointDir().isDefined():
            return
    except Exception:
        pass  # private-API drift: fall through and just set one
    ckpt = os.environ.get("SPARK_CHECKPOINT_DIR")
    if ckpt is None:
        if not sc.master.startswith("local"):
            return
        import atexit
        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    sc.setCheckpointDir(ckpt)
