"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests / bench / entry share one
tuned profile: AQE on (runtime re-plan + skew handling), Arrow on (all kernels
are Arrow-batched pandas UDFs), modest Arrow batch size (media payloads are
fat binary rows — a 10k-row Arrow batch of page images would blow executor
memory at production page sizes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "document_quality_assessment_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    extra_conf: dict | None = None,
) -> SparkSession:
    # glibc malloc tuning for the Python workers (they inherit this env in
    # local mode): numpy kernels allocate many 0.3–4 MB temporaries; without
    # this, every allocation is an mmap/munmap pair and 32 concurrent workers
    # serialize on kernel page-fault handling (measured: +12% at 8 workers,
    # +13% at 32, and sys-CPU drops from ~25% to ~5%)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "134217728")
    # python workers must import this package regardless of the caller's cwd
    # (set before the JVM launches; workers inherit the env)
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _repo_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _repo_root + (os.pathsep + _pp if _pp else "")
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~2x cores keeps all slots busy without tiny-task overhead
        n = int(cpus) if cpus.isdigit() else (os.cpu_count() or 4)
        shuffle_partitions = max(2 * n, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "134217728")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "134217728")
    )
    if master.startswith("local-cluster"):
        # multi-executor mode (separate Worker JVMs): ship the package the
        # spark-submit --py-files way so executor python workers import it
        b = b.config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEM", "4g"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if master.startswith("local-cluster"):
        spark.sparkContext.addPyFile(_package_zip())
    return spark


def _package_zip() -> str:
    """Zip this package for addPyFile (--py-files deployment analog)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(os.path.dirname(pkg_dir), ".bench_cache", "dqa_spark_pkg.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return out
