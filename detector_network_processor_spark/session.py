"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the configs below are the ones that matter at
cluster scale too (AQE, adaptive shuffle partition coalescing, skew-join
handling, Arrow for the Pandas-UDF operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def release_cached(
    spark: SparkSession, jvm_gc: bool = False, settle_sec: float = 0.0, blocking: bool = False
) -> None:
    """Release everything cached in the session: catalog cache + every
    persisted RDD (operators persist intermediates per plan-build, so any
    loop over many queries accumulates cached copies and late queries run
    under executor memory pressure — measured in bench.py's protocol notes).

    ``jvm_gc=True`` additionally hints a JVM GC and sleeps ``settle_sec``:
    ContextCleaner reclaims dead broadcast/shuffle blocks only when a GC
    notices they are unreachable, and a busy short-lived session may never
    GC on its own; the settle lets the block-manager removals land OUTSIDE
    a subsequent measurement window (quiet-host protocol, BASELINE.md).
    ``blocking=True`` waits for each unpersist to complete."""
    import time

    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(blocking)
    if jvm_gc:
        spark.sparkContext._jvm.System.gc()
    if settle_sec:
        time.sleep(settle_sec)


def eager_ckpt_tracked(df):
    """``localCheckpoint(eager=True)`` plus the JVM handles of the RDDs it
    persisted, so an iterative loop can release the previous iteration's
    state deterministically (``release_ckpts``).

    Why the handles: ``DataFrame.unpersist`` does NOT cover localCheckpoint
    storage (probed on 4.1 — the persisted-RDD set is unchanged after it),
    and waiting for the ContextCleaner's GC-driven release would keep up to
    ``max_iters`` O(data) states live at once. The handle diff is taken
    around the checkpoint call; the loops using this are single-threaded
    (as is plan fingerprinting), so no concurrent checkpoint can leak into
    the diff."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keys())
    ck = df.localCheckpoint(eager=True)
    handles = [jrdd for rid, jrdd in sc._jsc.getPersistentRDDs().items() if rid not in before]
    return ck, handles


def release_ckpts(handles: list) -> None:
    """Free the storage of checkpoints a loop no longer references (after
    this their DataFrames are unreadable — callers release only state whose
    last read has happened)."""
    for h in handles:
        try:
            h.unpersist(False)
        except Exception:  # pragma: no cover — release is best-effort
            pass


def pin_storage_level(spark: SparkSession):
    """Storage level for BIG working-set pins — the eager localCheckpoints
    of O(corpus)-sized intermediates (shingle arrays, kept postings).

    Returns ``None`` by default, which keeps Spark's localCheckpoint
    default (MEMORY_AND_DISK, deserialized): fastest when the pin fits, and
    the right call on a real cluster where the working set spreads across
    executors. Set ``spark.dnp.pinStorage=DISK_ONLY`` (session conf) or
    ``DNP_PIN_STORAGE=DISK_ONLY`` (env) for memory-constrained runs —
    local mode conflates driver and executor heap, and at 1000x fixture
    scale the deserialized in-memory pins plus the aggregation working set
    exceed the default 8 GB session unless the pins go straight to disk
    (measured: SCALE_RESULTS_r7.json needed a 64 GB driver without this).
    Small dimension pins (centroids, boundary offsets) deliberately do not
    consult this knob."""
    name = None
    try:
        name = spark.conf.get("spark.dnp.pinStorage", None)
    except Exception:
        pass
    name = name or os.environ.get("DNP_PIN_STORAGE")
    if not name:
        return None
    from pyspark import StorageLevel

    level = getattr(StorageLevel, name.upper(), None)
    if level is None:
        raise ValueError(f"unknown spark.dnp.pinStorage level: {name!r}")
    return level


def get_spark(
    app_name: str = "detector-network-processor-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus)))
    builder = SparkSession.builder.master(f"local[{cpus}]")
    if warehouse_dir is not None:
        # Bucketed catalog tables land under the warehouse dir; callers that
        # promise users a destination (materialize --bucket-by-station --out)
        # must pin it BEFORE session creation — it is fixed afterwards.
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    return (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size rather than max parallelism
        # when coalescing — the documented recommendation; at cluster scale
        # it keeps post-shuffle partitions near 64 MB instead of exploding
        # task counts, and on tiny inputs it collapses empty tasks.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # single-host local mode has no data locality to wait for
        .config("spark.locality.wait", "0s")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
