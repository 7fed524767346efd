"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32), but the
configuration is written the way a 1000-executor cluster job would be:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow on (vectorized pandas interchange for the few Pandas-UDF
operators), broadcast threshold tuned so dimension tables
(date_dim = 7,670 rows, control tables = a handful of rows) always take
the broadcast-hash path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "nlu-dw-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``spark.sql.shuffle.partitions`` is sized for the local test scale;
    on a real cluster you would leave AQE's
    ``spark.sql.adaptive.coalescePartitions`` to right-size post-shuffle
    partitions from a high initial number instead.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(DEFAULT_SHUFFLE_PARTITIONS))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §3.1: prefer a shuffled-hash join over sort-merge — but
        # via AQE's RUNTIME rewrite, not the plan-time preference.
        # preferSortMergeJoin=false was measured first and rejected:
        # it trusts size ESTIMATES, and at the 10x stress scale it
        # built q200's co-order self-join as SHJ anyway (35 s vs 11 s,
        # one session OOM'd the 8g heap).  The AQE threshold converts
        # SMJ->SHJ only when every post-shuffle partition's MEASURED
        # size fits 16 MB — worst-case concurrent build memory is
        # 16 MB x task slots, bounded at any data scale — and keeps
        # the local wins (winnow pair join −11%, minhash −9%).
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # TIMESTAMP(NANOS) parquet (events.ts) is unreadable by default;
        # read as long and convert with timestamp_micros(ts div 1000)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
