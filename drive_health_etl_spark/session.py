"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every config here is chosen for the
1000-executor / 100 TB case and merely *parameterized* down for local runs:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  strategy switch) — the main line of defense against skew at scale.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE's coalescing makes the initial number mostly a ceiling.
- Arrow enabled for the one pandas_udf boundary (phone normalization).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SHIPPED_APP_IDS: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python WORKERS of an
    already-running SparkSession (pandas UDFs / applyInPandasWithState
    pickle references to our modules).

    PYTHONPATH only helps if set before the JVM launches; a caller-provided
    session (the driver's) may exist already — so zip the package and
    ``addPyFile`` it, which distributes to workers at runtime. Idempotent
    per app."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APP_IDS:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # fresh zip per process (a cached /tmp zip could ship stale code)
    fd, zip_path = tempfile.mkstemp(prefix="dhe_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("drive_health_etl_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_APP_IDS.add(app_id)


class spark_conf:
    """Temporarily set arbitrary session confs, restoring (or unsetting)
    prior values on exit — write-mode knobs like
    ``spark.sql.sources.partitionOverwriteMode`` must not leak into a
    caller's later writes on the same shared session."""

    def __init__(self, spark: SparkSession, confs: dict[str, str]):
        self.spark, self.confs = spark, confs

    def __enter__(self):
        self.old: dict[str, str | None] = {}
        for k, v in self.confs.items():
            try:
                self.old[k] = self.spark.conf.get(k)
            except Exception:
                self.old[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, prev in self.old.items():
            if prev is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, prev)
        return False


class shuffle_partitions:
    """Temporarily pin spark.sql.shuffle.partitions — a caller-provided
    (driver) session defaults to 200, which makes stateful-streaming and
    iterative shuffles scheduling-bound at test scale. Streaming queries
    capture the value at start, so restoring on exit is safe.

    The conf is SESSION-GLOBAL, so concurrent pinned sections from multiple
    threads (the parallel rehearsal pool) would interleave enter/exit and
    leave the session pinned to whichever exit ran last. A process-wide
    re-entrant lock serializes pinned sections instead: correctness never
    depended on the value (the decimal-sum policy makes results
    partitioning-independent), but a leaked pin would silently degrade
    every later query's parallelism. Uncontended, the lock costs nothing
    for single-threaded use."""

    _lock = threading.RLock()

    def __init__(self, spark: SparkSession, n: int = 32):
        self.spark, self.n = spark, n

    def __enter__(self):
        self._lock.acquire()
        # If conf access raises (e.g. session stopped mid-run), __exit__
        # never runs — release the lock before re-raising or every later
        # pinned section across all threads would deadlock.
        try:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        except BaseException:
            self._lock.release()
            raise
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        self._lock.release()
        return False


def get_spark(app_name: str = "drive-health-etl-spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    # Python workers (pandas_udf) are separate processes that resolve imports
    # via PYTHONPATH, not the driver's sys.path — make the package importable
    # for them no matter the caller's cwd. (On a real cluster you'd ship a
    # wheel via --py-files / pip instead.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims (region/nation/customer/supplier/part at
        # test SF) stay broadcastable; at 100 TB the fact side never broadcasts
        # and explicit broadcast() hints on true dims still apply.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Testdata tables are single parquet files (a few MB-30 MB); the
        # default 128 MB split size would put each whole table in ONE input
        # partition, serializing every narrow stage. 4 MB splits restore
        # parallelism locally; on a real cluster inputs are many files and
        # this knob is irrelevant.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        # Driver testdata stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in the loader (tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
