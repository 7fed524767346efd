"""StructType schema registry for every table in the reference data
model (SURVEY.md §1.1; DDL cited from the project report docx §9,
xlines 848-964).

The reference fixes schemas by Postgres DDL and trusts CSV header rows
at ingest (`load_to_staging.py:151-152`).  Here the same schemas are
first-class StructTypes: readers validate against them and fail fast
when required columns are missing.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw scrape feed (extract_file.py:84-95): 10 string columns ------------
FEED_COLUMNS = [
    "sku",
    "product_name",
    "price",
    "brand",
    "material",
    "shape",
    "dimension",
    "origin",
    "quantity_available",
    "product_url",
]

FEED_SCHEMA = T.StructType([T.StructField(c, T.StringType(), True) for c in FEED_COLUMNS])

# columns a feed file MUST have (load_to_staging.py:151-152)
FEED_REQUIRED_COLUMNS = ["product_name", "sku"]

# the 10 descriptive attribute columns tracked by SCD2 change detection
# (load_to_dw.py:271-281)
SCD2_ATTR_COLUMNS = [
    "sku",
    "product_name",
    "price",
    "brand",
    "material",
    "shape",
    "dimension",
    "origin",
    "quantity_available",
    "product_url",
]

# --- staging table `matkinh_daily` (docx xlines 850-868) --------------------
STAGING_SCHEMA = T.StructType(
    [
        T.StructField("surrogate_key", T.LongType(), False),
        T.StructField("natural_key", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("price", T.IntegerType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("material", T.StringType(), True),
        T.StructField("shape", T.StringType(), True),
        T.StructField("dimension", T.StringType(), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("quantity_available", T.IntegerType(), True),
        T.StructField("product_url", T.StringType(), True),
        T.StructField("id_config", T.IntegerType(), True),
        T.StructField("dt_extract", T.DateType(), True),
        T.StructField("dt_load", T.DateType(), True),
    ]
)

# --- SCD2 warehouse table `dw` (docx xlines 870-891) ------------------------
# staging columns + dt_load_to_dw, dt_last_update (open = 9999-12-31),
# dt_dim (FK -> date_dim.id)
DW_SCHEMA = T.StructType(
    list(STAGING_SCHEMA.fields)
    + [
        T.StructField("dt_load_to_dw", T.DateType(), True),
        T.StructField("dt_last_update", T.DateType(), True),
        T.StructField("dt_dim", T.IntegerType(), True),
    ]
)

# SCD2 open-row sentinel (load_to_dw.py:200,268)
SCD2_OPEN_SENTINEL = "9999-12-31"

# null-repair sentinels (load_to_staging.py:204-216)
NULL_REPAIR_STRING = "N/A"
NULL_REPAIR_NUMBER = -1

# --- date dimension (docx xlines 941-964; content in date_dim.csv) ----------
DATE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("full_date", T.DateType(), False),
        T.StructField("day_of_month", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("day_name", T.StringType(), False),
        T.StructField("month_name", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("start_of_week", T.StringType(), False),
        T.StructField("day_of_week", T.IntegerType(), False),
        T.StructField("day_of_year", T.IntegerType(), False),
        T.StructField("iso_week", T.IntegerType(), False),
        T.StructField("iso_week_year", T.StringType(), False),
        T.StructField("start_of_iso_week", T.DateType(), False),
        T.StructField("iso_week_alt", T.IntegerType(), False),
        T.StructField("iso_week_year_alt", T.StringType(), False),
        T.StructField("start_of_iso_alt", T.DateType(), False),
        T.StructField("quarter", T.StringType(), False),
        T.StructField("quarter_num", T.IntegerType(), False),
        T.StructField("holiday_flag", T.StringType(), False),
        T.StructField("is_weekend", T.StringType(), False),
    ]
)

# --- control plane (docx xlines 893-920) ------------------------------------
FILE_CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("source_file_location", T.StringType(), True),
        T.StructField("destination_table_staging", T.StringType(), True),
        T.StructField("destination_table_dw", T.StringType(), True),
        T.StructField("bucket_name", T.StringType(), True),
        T.StructField("folder_b2_name", T.StringType(), True),
        T.StructField("bucket_id", T.StringType(), True),
    ]
)

FILE_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("id_config", T.IntegerType(), False),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("time", T.DateType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("count", T.IntegerType(), True),
        T.StructField("file_size_kb", T.IntegerType(), True),
        T.StructField("dt_update", T.TimestampType(), True),
    ]
)

# run-state vocabulary (docx xlines 92-110; transitions in SURVEY.md §2.7 T3).
# The reference collapses every failure to EF, which forces a dw failure
# to retry from extract and re-append the staging slice (duplicate
# natural_keys into the merge).  The engine adds per-stage failure
# statuses SF/DF so each stage retries from itself.
STATUS_RUNNING = "RUNNING"
STATUS_EXTRACT_SUCCESS = "ES"
STATUS_EXTRACT_FAILED = "EF"
STATUS_STAGING_FAILED = "SF"
STATUS_DW_FAILED = "DF"
STATUS_LOAD_STAGING_SUCCESS = "LS"
STATUS_LOAD_DW_SUCCESS = "LWS"
ALL_STATUSES = [
    STATUS_RUNNING,
    STATUS_EXTRACT_SUCCESS,
    STATUS_EXTRACT_FAILED,
    STATUS_STAGING_FAILED,
    STATUS_DW_FAILED,
    STATUS_LOAD_STAGING_SUCCESS,
    STATUS_LOAD_DW_SUCCESS,
]

# --- driver-provided TPC-H-ish test tables (TESTDATA.md) --------------------
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
