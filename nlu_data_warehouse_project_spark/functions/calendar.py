"""Native date-dimension generator (SURVEY.md §2.6 D1-D14).

The reference ships the calendar pre-built (`date_dim.csv`, 7,671 rows,
2005-01-01 -> 2026-01-01) and loads it row-at-a-time
(`insert_date_dim.py:57-109` — which crashes as written; the CSV is the
ground truth).  This module *generates* the same 20 columns natively:
``sequence() + explode`` then pure column expressions — no data
movement, no shuffle (ids are arithmetic on the date, not row_number).

Column semantics are pinned by the CSV content, which diverges from the
DDL's column names (docx xlines 941-964) in three places:

- ``day_of_month`` (col 3) actually holds the *cumulative day index*
  since the calendar start (equals ``id``),
- ``month`` (col 4) holds the *cumulative month index* (Jan 2005 = 1,
  Jan 2026 = 253),
- ``day_of_week`` (col 9) actually holds the day of month (1-31).

The "main" week triple (cols 11-13) is a Sunday-start week numbering
where ``Y-W01`` begins on the first Sunday STRICTLY AFTER Jan 1 of Y
(verified against the 2006-01-01 and 2012-01-01 rollovers, where Jan 1
is itself a Sunday yet belongs to W53 of the prior year).  The "alt"
triple (cols 14-16) is true ISO-8601 (Monday start).  ``quarter_num``
is a cumulative quarter index (1..85), not 1-4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_START = "2005-01-01"
DEFAULT_END = "2026-01-01"


def _sunday_week_start(d: Column) -> Column:
    """Previous-or-same Sunday (dayofweek: Sunday=1)."""
    return F.date_sub(d, F.dayofweek(d) - 1)


def _w01_anchor(y: Column) -> Column:
    """First Sunday strictly after Jan 1 of year y — the start of that
    year's W01 in the reference's Sunday-start numbering."""
    return F.next_day(F.make_date(y, F.lit(1), F.lit(1)), "Sunday")


def build_date_dim(
    spark: SparkSession,
    start: str = DEFAULT_START,
    end: str = DEFAULT_END,
    holidays: list[str] | None = None,
) -> DataFrame:
    """D1-D12: generate the calendar dimension for [start, end].

    ``id`` stays dense 1..N (dw.dt_dim stores it) — computed as date
    arithmetic, so generation is embarrassingly parallel.
    """
    holidays = holidays or []
    start_c = F.to_date(F.lit(start))

    days = spark.range(1).select(
        F.explode(F.sequence(start_c, F.to_date(F.lit(end)), F.expr("interval 1 day"))).alias("full_date")
    )

    d = F.col("full_date")
    sunday_start = _sunday_week_start(d)
    y0 = F.year(sunday_start)
    anchor0 = _w01_anchor(y0)
    in_year = sunday_start >= anchor0
    week_year_num = F.when(in_year, y0).otherwise(y0 - 1)
    anchor = F.when(in_year, anchor0).otherwise(_w01_anchor(y0 - 1))
    sunday_week = (F.datediff(sunday_start, anchor) / 7 + 1).cast("int")

    iso_week = F.weekofyear(d)
    iso_start = F.date_trunc("week", d).cast("date")
    # the reference labels the ISO triple with the calendar year of the
    # week's Monday (so Monday 2007-12-31, ISO week 1, is "2007-W01") —
    # NOT the ISO week-based year; pinned by date_dim.csv rows 1095-1101
    iso_label_year = F.year(iso_start)

    out = (
        days.withColumn("id", (F.datediff(d, start_c) + 1).cast("int"))
        .withColumn("day_of_month", (F.datediff(d, start_c) + 1).cast("int"))
        .withColumn(
            "month",
            ((F.year(d) - F.year(start_c)) * 12 + F.month(d) - F.month(start_c) + 1).cast("int"),
        )
        .withColumn("day_name", F.date_format(d, "EEEE"))
        .withColumn("month_name", F.date_format(d, "MMMM"))
        .withColumn("year", F.year(d).cast("int"))
        .withColumn("start_of_week", F.date_format(d, "yyyy-MMM"))
        .withColumn("day_of_week", F.dayofmonth(d).cast("int"))
        .withColumn("day_of_year", F.dayofyear(d).cast("int"))
        .withColumn("iso_week", sunday_week)
        .withColumn(
            "iso_week_year",
            F.concat(week_year_num.cast("string"), F.lit("-W"), F.lpad(sunday_week.cast("string"), 2, "0")),
        )
        .withColumn("start_of_iso_week", sunday_start)
        .withColumn("iso_week_alt", iso_week.cast("int"))
        .withColumn(
            "iso_week_year_alt",
            F.concat(iso_label_year.cast("string"), F.lit("-W"), F.lpad(iso_week.cast("string"), 2, "0")),
        )
        .withColumn("start_of_iso_alt", iso_start)
        .withColumn(
            "quarter",
            F.concat(F.year(d).cast("string"), F.lit("-Q"), F.lpad(F.quarter(d).cast("string"), 2, "0")),
        )
        .withColumn(
            "quarter_num",
            ((F.year(d) - F.year(start_c)) * 4 + F.quarter(d) - F.quarter(start_c) + 1).cast("int"),
        )
        .withColumn(
            "holiday_flag",
            F.when(d.isin([F.to_date(F.lit(h)) for h in holidays] if holidays else [F.lit(None)]), "Holiday").otherwise(
                "Non-Holiday"
            )
            if holidays
            else F.lit("Non-Holiday"),
        )
        .withColumn("is_weekend", F.when(F.dayofweek(d).isin(1, 7), "Weekend").otherwise("Weekday"))
    )
    cols = [
        "id",
        "full_date",
        "day_of_month",
        "month",
        "day_name",
        "month_name",
        "year",
        "start_of_week",
        "day_of_week",
        "day_of_year",
        "iso_week",
        "iso_week_year",
        "start_of_iso_week",
        "iso_week_alt",
        "iso_week_year_alt",
        "start_of_iso_alt",
        "quarter",
        "quarter_num",
        "holiday_flag",
        "is_weekend",
    ]
    return out.select(*cols)
