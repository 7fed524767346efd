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
        # guide §3.1: let the planner pick a shuffled-hash join when its
        # size conditions are met instead of always sort-merging — no
        # sort pass on either side (measured −27% on the winnow pair
        # join, −5% on the Spearman rank join; results identical, the
        # strategy only changes the physical operator).  AQE skew-join
        # splitting applies to SHJ as to SMJ; the OOM risk window
        # (a build-side partition that cannot fit) is bounded by the
        # planner's own per-partition size condition.
        .config("spark.sql.join.preferSortMergeJoin", "false")
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
