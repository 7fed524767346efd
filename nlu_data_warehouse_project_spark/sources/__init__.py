"""Sources & sinks (SURVEY.md §2.1, S1-S9).

The reference moves data as CSV files through object storage into
Postgres tables, one INSERT round-trip per row
(`load_to_staging.py:166-176`).  Here every movement is a vectorized
Spark scan/write over a parquet lakehouse:

- bronze  = raw landing CSVs, date-partitioned directory layout
- silver  = staging parquet (cleansed, typed)
- gold    = dw + dimensions parquet
- control = file_config / file_logs parquet

Path convention replaces the reference's file-name convention
``data_{id}_{table}_{YYYY-MM-DD}_{source}.csv``
(`extract_file.py:104-108`) with partition directories
``{landing}/id_config={id}/dt={date}/`` so Catalyst prunes partitions
from filters on (id_config, dt) for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FEED_REQUIRED_COLUMNS, FEED_SCHEMA, TESTDATA_TABLES


class MissingColumnsError(ValueError):
    """Raised when a scan is missing required columns
    (reference: `load_to_staging.py:151-152` aborts the load)."""


def validate_required_columns(df: DataFrame, required: list[str] | None = None) -> DataFrame:
    """S3 fail-fast column validation: required ⊆ df.columns."""
    required = required if required is not None else FEED_REQUIRED_COLUMNS
    missing = sorted(set(required) - set(df.columns))
    if missing:
        raise MissingColumnsError(f"scan is missing required columns: {missing}")
    return df


def read_feed_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    required: list[str] | None = None,
) -> DataFrame:
    """S3: CSV scan with header, explicit schema, required-column check.

    All feed columns land as strings (the reference's CSV is untyped);
    typing happens in the cleanse stage so that dirty values become
    nulls deliberately, not silently.
    """
    reader = spark.read.option("header", True).option("multiLine", False)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    return validate_required_columns(df, required)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2: CSV sink — header on, UTF-8 (Spark default)."""
    df.write.option("header", True).mode(mode).csv(path)


def landing_path(base: str, id_config: int, dt: str) -> str:
    """Partitioned landing directory for one (source, day) slice."""
    return os.path.join(base, f"id_config={id_config}", f"dt={dt}")


def write_landing(df: DataFrame, base: str, id_config: int, dt: str) -> str:
    """S2+S7: land one day's feed under the partitioned layout.

    In production ``base`` is an object-store URI (s3a://...); Spark's
    Hadoop FS layer makes the code identical for local paths.
    """
    path = landing_path(base, id_config, dt)
    write_csv(df, path)
    return path


def read_landing(spark: SparkSession, base: str) -> DataFrame:
    """Scan the whole landing zone; partition columns (id_config, dt)
    come from the directory layout, so filters on them prune at plan
    time instead of reading every file (S7 existence checks become
    partition pruning)."""
    return (
        spark.read.option("header", True)
        .option("basePath", base)
        .schema(FEED_SCHEMA)
        .csv(os.path.join(base, "id_config=*", "dt=*"))
    )


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """S5/S6: parquet table sink. mode='append' ≙ INSERT INTO;
    mode='overwrite' ≙ TRUNCATE+INSERT (atomic visibility — the
    reference's per-statement commit has no equivalent guarantee)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    """S7 existence probe (reference: B2 HEAD `load_to_staging.py:316-359`)."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def file_info(spark: SparkSession, df: DataFrame, path: str | None = None) -> dict:
    """S8: row count + size-KB audit metrics
    (reference: `extract_file.py:225-263` -> file_logs.count/file_size_kb)."""
    count = df.count()
    size_kb = None
    if path is not None:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(hpath):
            size_kb = round(fs.getContentSummary(hpath).getLength() / 1024.0, 2)
    return {"count": count, "file_size_kb": size_kb}


def load_testdata(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's TPC-H-ish parquet tables from an sf dir."""
    names = tables or TESTDATA_TABLES
    out: dict[str, DataFrame] = {}
    for name in names:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each testdata table as a temp view for spark.sql use."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    required: list[str] | None = None,
) -> DataFrame:
    """JSONL scan — the lingua franca of training-data interchange
    (one JSON object per line; .gz line files decompress transparently
    through the Hadoop codecs).  ALWAYS pass ``schema`` in production:
    inference costs one full extra scan of the input and can mis-type
    sparse fields.  Malformed lines become all-null rows (PERMISSIVE);
    use ``read_jsonl_quarantined`` when bad lines must be captured for
    a dead-letter sink instead of silently nulled.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option("multiLine", False)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if required:
        validate_required_columns(df, required)
    return df


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema,
    required: list[str] | None = None,
    corrupt_col: str = "_corrupt_record",
):
    """(good, bad) JSONL scan with corrupt-line quarantine: bad = the
    raw text of every line that failed to parse against ``schema``.

    A 100 TB crawl always contains broken lines — FAILFAST turns one
    bad byte into a dead job, DROPMALFORMED silently shrinks the
    corpus; neither is acceptable at scale.  Spark's native reader
    cannot project the corrupt column alone
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, and the
    documented cache() workaround is a non-starter on a 100 TB scan),
    so this path scans the file as TEXT once and parses with
    ``from_json`` — both frames derive from that one scan, parsing is
    JVM-side, and blank lines are skipped exactly as the native reader
    does.  Write ``bad`` to a dead-letter path and count it in the run
    audit."""
    from pyspark.sql.types import StringType, StructType

    if not isinstance(schema, StructType):
        raise TypeError("read_jsonl_quarantined requires an explicit StructType schema")
    full = schema
    if corrupt_col not in full.fieldNames():
        full = full.add(corrupt_col, StringType(), True)
    parsed = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.col("value"),
            F.from_json(
                "value", full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
            ).alias("__j"),
        )
    )
    is_bad = F.col(f"__j.{corrupt_col}").isNotNull() | F.col("__j").isNull()
    good = parsed.filter(~is_bad).select("__j.*").drop(corrupt_col)
    if required:
        validate_required_columns(good, required)
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: list[str] | None = None,
):
    """JSONL sink (one object per line).  ``compression='gzip'|'zstd'``
    for interchange; ``partition_by=["split"]`` lays the export out as
    ``split=train/``, ``split=val/``… so a trainer reads its split with
    partition pruning and no filter scan."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the interchange format for Hive/Trino/Presto-side
    consumers (parquet stays the native format everywhere else in this
    engine).  ORC carries the same column-pruning + predicate-pushdown
    + min/max-stripe-skipping contract as parquet in Spark, so a
    downstream read is not a downgrade."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str, required: list[str] | None = None) -> DataFrame:
    """ORC scan with the same fail-fast required-column validation as
    ``read_feed_csv`` (S3's contract: a missing column is a pipeline
    bug, not a null-fill situation)."""
    df = spark.read.orc(path)
    if required:
        validate_required_columns(df, required)
    return df
