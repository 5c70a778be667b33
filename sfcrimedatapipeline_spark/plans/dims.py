"""Dimension builders — generators + staged-derived dims (SURVEY §2.3, §2.7).

``generate_dim_time`` is golden-tested row-for-row against the one piece
of ground truth the reference ships (/root/reference/data/dimTime.csv,
86,400 rows). ``generate_dim_date`` implements the DDL at
/root/reference/dags/ELT.py:121-145 with the documented conventions
(the seed CSV is missing from the checkout) — each inferred convention
is isolated in a small expression so a later ground-truth source can
correct it without touching callers.

The three staging-derived dims reproduce DISTINCT + ROW_NUMBER
(dags/ELT.py:185-200, 205-219, 224-243) including Postgres NULLS-LAST
ordering and the NULL→false normalization of ``Filed Online``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.keys import surrogate_key

SECONDS_PER_DAY = 86_400


def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def _hour12(h24: Column) -> Column:
    # verified against dimTime.csv: 0→12, 12→12, 13→1, 23→11
    return F.when(h24 % 12 == 0, F.lit(12)).otherwise(h24 % 12)


def _time_of_day(h24: Column) -> Column:
    # bucket boundaries verified against dimTime.csv (SURVEY §2.7)
    return (
        F.when(h24 < 6, "Night")
        .when(h24 < 12, "Morning")
        .when(h24 < 13, "Noon")
        .when(h24 < 17, "Afternoon")
        .when(h24 < 20, "Evening")
        .otherwise("Night")
    )


def generate_dim_time(spark: SparkSession) -> DataFrame:
    """One row per second of day; matches data/dimTime.csv exactly.

    Pure narrow plan over ``spark.range`` — no shuffle, no UDFs; the
    whole table stays inside one whole-stage-codegen span.
    """
    sod = F.col("id")  # second of day, 0..86399
    h = (sod / 3600).cast("int")
    m = ((sod % 3600) / 60).cast("int")
    s = (sod % 60).cast("int")
    ampm = F.when(h < 12, "AM").otherwise("PM")
    return spark.range(SECONDS_PER_DAY).select(
        (h * 10000 + m * 100 + s).cast("int").alias("TimeID"),
        h.cast("short").alias("Hour24"),
        _hour12(h).cast("short").alias("Hour12"),
        m.cast("short").alias("Minute"),
        s.cast("short").alias("Second"),
        ampm.alias("AMPM"),
        F.concat_ws(":", h.cast("string"), _pad2(m), _pad2(s)).alias("FullTime24"),
        F.concat(
            F.concat_ws(":", _hour12(h).cast("string"), _pad2(m), _pad2(s)),
            F.lit(" "),
            ampm,
        ).alias("FullTime12"),
        _time_of_day(h).alias("TimeOfDay"),
    )


def _holiday_name(d: Column) -> Column:
    """US holiday lookup (SURVEY §2.7 — list is an inference; the
    reference's dimDate.csv is missing). Fixed-date + floating rules."""
    mo, dom, dow = F.month(d), F.dayofmonth(d), F.dayofweek(d)  # dow: 1=Sun..7=Sat
    return (
        F.when((mo == 1) & (dom == 1), "New Year's Day")
        .when((mo == 1) & (dow == 2) & dom.between(15, 21), "Martin Luther King Jr. Day")
        .when((mo == 2) & (dow == 2) & dom.between(15, 21), "Presidents' Day")
        .when((mo == 5) & (dow == 2) & (dom >= 25), "Memorial Day")
        .when((mo == 6) & (dom == 19), "Juneteenth")
        .when((mo == 7) & (dom == 4), "Independence Day")
        .when((mo == 9) & (dow == 2) & (dom <= 7), "Labor Day")
        .when((mo == 10) & (dow == 2) & dom.between(8, 14), "Columbus Day")
        .when((mo == 11) & (dom == 11), "Veterans Day")
        .when((mo == 11) & (dow == 5) & dom.between(22, 28), "Thanksgiving")
        .when((mo == 12) & (dom == 25), "Christmas Day")
    )


def _season(d: Column) -> Column:
    # meteorological seasons (convention documented in SURVEY §2.7)
    mo = F.month(d)
    return (
        F.when(mo.isin(12, 1, 2), "Winter")
        .when(mo.isin(3, 4, 5), "Spring")
        .when(mo.isin(6, 7, 8), "Summer")
        .otherwise("Fall")
    )


def generate_dim_date(
    spark: SparkSession, start: str = "2018-01-01", end: str = "2024-12-31"
) -> DataFrame:
    """Calendar dimension per the DDL at dags/ELT.py:121-145.

    Documented conventions (CSV missing — SURVEY §7.4.6): DateID is a
    ``yyyyMMdd`` int; DayNumberOfWeek uses Spark's ``dayofweek``
    (1=Sunday..7=Saturday); weeks begin Sunday; SameDayPreviousYear is
    minus one calendar year; WeekNumberOfMonth is ceil(day/7).
    """
    n_days = F.datediff(F.lit(end).cast("date"), F.lit(start).cast("date"))
    d = F.col("FullDate")
    dow = F.dayofweek(d)
    holiday = _holiday_name(d)
    quarter = F.quarter(d)
    days = spark.range(1).select(
        F.explode(F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))).alias(
            "FullDate"
        )
    )
    del n_days
    return days.select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("DateID"),
        d,
        F.date_format(d, "EEEE").alias("DayNameOfWeek"),
        F.date_format(d, "E").alias("DayNameOfWeekShort"),
        F.dayofmonth(d).cast("short").alias("DayNumberOfMonth"),
        dow.cast("short").alias("DayNumberOfWeek"),
        F.dayofyear(d).cast("short").alias("DayNumberOfYear"),
        holiday.alias("HolidayName"),
        holiday.isNotNull().alias("isHoliday"),
        dow.between(2, 6).alias("isWeekday"),
        dow.isin(1, 7).alias("isWeekend"),
        F.date_format(d, "MMMM").alias("MonthName"),
        F.date_format(d, "MMM").alias("MonthNameShort"),
        F.month(d).cast("short").alias("MonthNumberOfYear"),
        (d == F.last_day(d)).alias("isEndOfMonth"),
        quarter.cast("short").alias("CalendarQuarterNumber"),
        F.element_at(
            F.lit(["First", "Second", "Third", "Fourth"]), quarter
        ).alias("CalendarQuarterName"),
        F.concat(F.lit("Q"), quarter.cast("string")).alias("CalendarQuarterShortName"),
        (d - F.expr("INTERVAL 1 YEAR")).cast("date").alias("SameDayPreviousYear"),
        _season(d).alias("Season"),
        F.date_sub(d, dow - F.lit(1)).alias("WeekBeginDate"),
        F.ceil(F.dayofmonth(d) / 7).cast("short").alias("WeekNumberOfMonth"),
        F.weekofyear(d).cast("short").alias("WeekNumberOfYear"),
        F.year(d).cast("short").alias("CalenderYear"),  # [sic] reference typo preserved
    )


def build_dim_location(staging: DataFrame) -> DataFrame:
    """DISTINCT(district, neighborhood) + ROW_NUMBER (dags/ELT.py:185-200).

    Projection precedes the dedup (mirrors the reference's subquery) so
    the distinct shuffles only the two key columns; the partition-less
    window then runs on dim-cardinality data only.
    """
    deduped = (
        staging.select(
            F.col("Police District").alias("PoliceDistrict"),
            F.col("Analysis Neighborhood").alias("AnalysisNeighborhood"),
        )
        .distinct()
    )
    return surrogate_key(deduped, ["PoliceDistrict", "AnalysisNeighborhood"], "LocationID")


def build_dim_incident(staging: DataFrame) -> DataFrame:
    """DISTINCT(category, subcategory, resolution) + ROW_NUMBER
    (dags/ELT.py:205-219). NULL keys are kept as their own group —
    DISTINCT groups NULLs together in both Postgres and Spark."""
    deduped = (
        staging.select(
            F.col("Incident Category").alias("IncidentCategory"),
            F.col("Incident Subcategory").alias("IncidentSubcategory"),
            F.col("Resolution").alias("Resolution"),
        )
        .distinct()
    )
    return surrogate_key(
        deduped, ["IncidentCategory", "IncidentSubcategory", "Resolution"], "IncidentID"
    )


def build_dim_report_type(staging: DataFrame) -> DataFrame:
    """DISTINCT(desc, code, filed_online) + NULL→false + ROW_NUMBER
    (dags/ELT.py:224-243). The CASE runs *after* the DISTINCT in the
    reference, so dedup sees the raw NULLs — order preserved here."""
    deduped = (
        staging.select(
            F.col("Report Type Description").alias("ReportType"),
            F.col("Report Type Code").alias("ReportTypeCode"),
            F.col("Filed Online").alias("FiledOnlineRaw"),
        )
        .distinct()
    )
    keyed = surrogate_key(
        deduped, ["ReportType", "ReportTypeCode", "FiledOnlineRaw"], "ReportTypeID"
    )
    return keyed.select(
        "ReportTypeID",
        "ReportType",
        "ReportTypeCode",
        F.coalesce(F.col("FiledOnlineRaw"), F.lit(False)).alias("FiledOnline"),
    )
