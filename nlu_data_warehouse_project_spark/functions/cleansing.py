"""Cleanse / standardize expressions (SURVEY.md §2.6 C1-C7 and §2.2
P1/P2).

The reference does this parsing client-side in Python while scraping
(`extract_file.py:39-95,140-144`) and derives the natural key at load
time (`load_to_staging.py:167-172`).  Here each rule is a pure Spark
column expression, applied at bronze->silver so the feed semantics are
identical whether the input came from the scraper, a landed CSV, or a
test fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_price(col: Column | str) -> Column:
    """C1: currency strip (reference `extract_file.py:47-52`).

    ``"7,900,000₫ / 1 chiếc "`` -> 7900000 (int).  Steps: take the text
    before '/', trim, drop currency glyph + thousands separators, cast.
    Empty/garbage -> null (repaired downstream by F1).
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.trim(F.split(c, "/").getItem(0)), "[₫,]", "")
    return F.when(stripped.rlike("^-?[0-9]+$"), stripped.cast("int")).otherwise(F.lit(None).cast("int"))


def extract_keyword_field(desc: Column | str, keyword: str, first_token_only: bool = False) -> Column:
    """C2: keyword field extraction from a product-description blob
    (reference `extract_file.py:62-76`): text after ``{keyword}:`` up to
    the next bullet '•', trimmed; optionally first whitespace token only
    (the reference does this for origin)."""
    d = F.col(desc) if isinstance(desc, str) else desc
    val = F.trim(F.regexp_extract(d, keyword + r":\s*([^•]*)", 1))
    if first_token_only:
        val = F.split(val, r"\s+").getItem(0)
    return F.when(val == "", F.lit(None).cast("string")).otherwise(val)


def digits_only(col: Column | str, default: str = "0") -> Column:
    """C3: digit filter for quantity (reference `extract_file.py:78-83`):
    keep digits, default when none remain."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_replace(c.cast("string"), "[^0-9]", "")
    return F.when((digits.isNull()) | (digits == ""), F.lit(default)).otherwise(digits).cast("int")


def normalize_description(col: Column | str) -> Column:
    """C4: ensure '• ' precedes 'Thông tin'
    (reference `format_description_text`, `extract_file.py:140-144`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(•\s*)?Thông tin", "• Thông tin")


def natural_key(product_name: Column | str = "product_name", sku: Column | str = "sku") -> Column:
    """C5/P1: natural key = product_name-sku
    (reference `load_to_staging.py:167-172`).  concat_ws skips nulls the
    way the reference's f-string renders them as '' — both sides pinned
    by tests."""
    p = F.col(product_name) if isinstance(product_name, str) else product_name
    s = F.col(sku) if isinstance(sku, str) else sku
    return F.concat_ws("-", p, s)


def trimmed(col: Column | str) -> Column:
    """C6: pervasive .strip() (reference `extract_file.py:44,48,66-76`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c)


def source_domain(url: Column | str) -> Column:
    """C7: domain from a URL — ``url.split("//")[1].split("/")[0]``
    (reference `extract_file.py:104-108`, used in landing file names)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.split(F.split(c, "//").getItem(1), "/").getItem(0)


def with_audit_columns(df: DataFrame, id_config: int, dt_extract: str, dt_load: str) -> DataFrame:
    """P2: append run-slice audit literals to every row
    (reference `load_to_staging.py:155,175`)."""
    return (
        df.withColumn("id_config", F.lit(id_config).cast("int"))
        .withColumn("dt_extract", F.to_date(F.lit(dt_extract)))
        .withColumn("dt_load", F.to_date(F.lit(dt_load)))
    )


def cleanse_feed(df: DataFrame) -> DataFrame:
    """bronze->silver standardization of the 10-column feed: trim all
    strings, parse price (C1) and quantity (C3), derive natural_key
    (P1).  One narrow projection — no shuffle, fully codegen'd."""
    str_cols = ["sku", "product_name", "brand", "material", "shape", "dimension", "origin", "product_url"]
    out = df
    for c in str_cols:
        if c in out.columns:
            out = out.withColumn(c, trimmed(c))
    out = out.withColumn("price", clean_price("price"))
    out = out.withColumn("quantity_available", digits_only("quantity_available"))
    return out.withColumn("natural_key", natural_key())
