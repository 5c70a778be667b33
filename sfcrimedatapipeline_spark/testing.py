"""Deterministic synthetic staging data for tests (FIXTURES.md §1).

Pure Spark column expressions over ``spark.range`` — no Python RNG, no
UDFs — so the fixture is reproducible across runs/partitionings and
scales to any row count. Null rates and cardinalities follow
FIXTURES.md, chosen to exercise the load-bearing semantics: NULL join
keys (J5/J6), NULLS-LAST surrogate ordering (W1), and the
``Filed Online`` true-or-NULL pattern (P2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.schemas import STAGING_SCHEMA

_DISTRICTS = [
    "Bayview", "Central", "Ingleside", "Mission", "Northern",
    "Park", "Richmond", "Southern", "Taraval", "Tenderloin", "Out of SF",
]
_CATEGORIES = [
    "Larceny Theft", "Assault", "Burglary", "Fraud", "Robbery",
    "Vandalism", "Drug Offense", "Missing Person", "Vehicle Theft", "Arson",
]
_RESOLUTIONS = ["Open or Active", "Cite or Arrest Adult", "Unfounded", "Exceptional Adult"]
_REPORT_TYPES = [
    ("II", "Initial"),
    ("IS", "Initial Supplement"),
    ("VI", "Vehicle Initial"),
    ("VS", "Vehicle Supplement"),
    ("CI", "Coplogic Initial"),
]


def _h(seed: int) -> Column:
    """Deterministic per-row uniform non-negative long."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed)))


def _pick(seed: int, values: list[str]) -> Column:
    return F.element_at(F.lit(values), (_h(seed) % len(values) + 1).cast("int"))


def _nullify(col: Column, seed: int, pct: int) -> Column:
    return F.when(_h(seed) % 100 < pct, F.lit(None)).otherwise(col)


def synthetic_staging(spark: SparkSession, n_rows: int = 5000) -> DataFrame:
    """Build an ``n_rows`` staging DataFrame matching STAGING_SCHEMA."""
    base = spark.range(n_rows)
    incident_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2018-01-01 00:00:00")) + _h(1) % (6 * 365 * 86400)
    )
    report_ts = F.timestamp_seconds(F.unix_timestamp(incident_ts) + _h(2) % (72 * 3600))
    rt_idx = (_h(3) % len(_REPORT_TYPES)).cast("int")
    category = _nullify(_pick(4, _CATEGORIES), 5, 2)
    df = base.select(
        incident_ts.alias("Incident Datetime"),
        F.to_date(incident_ts).alias("Incident Date"),
        F.date_format(incident_ts, "H:mm:ss").alias("Incident Time"),
        F.year(incident_ts).alias("Incident Year"),
        F.date_format(incident_ts, "EEEE").alias("Incident Day of Week"),
        report_ts.alias("Report Datetime"),
        F.col("id").alias("Row ID"),
        F.col("id").cast("int").alias("Incident ID"),
        (F.lit(100000000) + F.col("id")).alias("Incident Number"),
        _nullify((_h(6) % 90000000).cast("int"), 7, 15).alias("CAD Number"),
        F.element_at(F.lit([c for c, _ in _REPORT_TYPES]), rt_idx + 1).alias(
            "Report Type Code"
        ),
        F.element_at(F.lit([d for _, d in _REPORT_TYPES]), rt_idx + 1).alias(
            "Report Type Description"
        ),
        # true-or-NULL only, never explicit false (FIXTURES.md) — the
        # feed leaves the field empty unless filed online
        F.when(rt_idx == 4, F.lit(True)).otherwise(F.lit(None).cast("boolean")).alias(
            "Filed Online"
        ),
        (_h(8) % 90000 + 10000).cast("int").alias("Incident Code"),
        category.alias("Incident Category"),
        _nullify(
            F.concat(F.coalesce(category, F.lit("None")), F.lit(" - sub "), (_h(9) % 2).cast("string")),
            10,
            2,
        ).alias("Incident Subcategory"),
        F.concat(F.lit("desc "), (_h(11) % 400).cast("string")).alias(
            "Incident Description"
        ),
        _pick(12, _RESOLUTIONS).alias("Resolution"),
        _nullify(
            F.concat(
                (_h(13) % 50).cast("string"), F.lit("TH ST \\ "), (_h(14) % 30).cast("string"), F.lit("TH AVE")
            ),
            15,
            5,
        ).alias("Intersection"),
        _nullify((_h(16) % 90000000 + 10000000).cast("decimal(38,18)"), 17, 5).alias("CNN"),
        _pick(18, _DISTRICTS).alias("Police District"),
        _nullify(
            F.concat(F.lit("Neighborhood "), (_h(19) % 41).cast("string")), 20, 8
        ).alias("Analysis Neighborhood"),
        _nullify((_h(21) % 11 + 1).cast("int"), 22, 8).alias("Supervisor District"),
        _nullify(F.lit(37.70) + (_h(23) % 13000) / 100000.0, 24, 5).alias("Latitude"),
        _nullify(F.lit(-122.51) + (_h(25) % 15000) / 100000.0, 24, 5).alias("Longitude"),
        _nullify(F.lit("POINT (-122.4 37.7)"), 24, 5).alias("Point"),
        _nullify((_h(26) % 117 + 1).cast("int"), 27, 10).alias("Neighborhoods"),
        _nullify(F.lit(1).cast("short"), 28, 95).alias("ESNCAG - Boundary File"),
        _nullify(F.lit(1).cast("short"), 29, 90).alias(
            "Central Market/Tenderloin Boundary Polygon - Updated"
        ),
        _nullify(F.lit(1).cast("short"), 30, 92).alias(
            "Civic Center Harm Reduction Project Boundary"
        ),
        _nullify((_h(31) % 5 + 1).cast("short"), 32, 85).alias(
            "HSOC Zones as of 2018-06-05"
        ),
        _nullify(F.lit(1).cast("short"), 33, 95).alias(
            "Invest In Neighborhoods (IIN) Areas"
        ),
        _nullify((_h(34) % 11 + 1).cast("short"), 35, 5).alias(
            "Current Supervisor Districts"
        ),
        _nullify((_h(36) % 10 + 1).cast("short"), 37, 5).alias(
            "Current Police Districts"
        ),
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in STAGING_SCHEMA.fields]
    return df
