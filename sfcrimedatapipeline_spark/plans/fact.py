"""FactCrime build — the 7-left-join fan-in (SURVEY §2.4 J1–J7).

Faithful to the single INSERT..SELECT at /root/reference/dags/ELT.py:264-289:

- All joins are LEFT and use plain ``==`` (never ``eqNullSafe``): SQL
  ``=`` on a NULL key never matches, so staging rows with NULL category/
  neighborhood get NULL FKs even though the dims contain the NULL-keyed
  row. Using ``<=>`` here would silently diverge from the reference.
- **Bug-compatible default**: the reference assigns ``ReportTimeID``
  from ``t1`` (the *incident* time, dags/ELT.py:270) while the ``t2``
  report-time join (dags/ELT.py:282) is computed but dead. Default
  output reproduces this; ``fix_report_time_id=True`` emits the
  evidently-intended ``t2.TimeID`` instead.

Physical strategy: every dim side is explicitly ``broadcast()`` — they
are dimension-cardinality (DimTime 86,400 rows ≈ 4 MB is the largest) —
so the fact side never shuffles regardless of the broadcast-threshold
config. The dead t2 join is only added when the fix flag asks for it
(Catalyst would not prune a left join whose output is unused only if it
could prove uniqueness; pruning it ourselves is both faithful and free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fact_crime(
    staging_with_id: DataFrame,
    dim_date: DataFrame,
    dim_time: DataFrame,
    dim_location: DataFrame,
    dim_incident: DataFrame,
    dim_report_type: DataFrame,
    fix_report_time_id: bool = False,
) -> DataFrame:
    """7-key left-join fan-in producing one fact row per staging row.

    ``staging_with_id`` must carry the load-order ``id`` column
    (see ``operators.keys.load_order_id`` — the SERIAL at dags/ELT.py:100).
    """
    s = staging_with_id.alias("s")
    d1 = F.broadcast(dim_date.alias("d1"))
    t1 = F.broadcast(dim_time.alias("t1"))
    d2 = F.broadcast(dim_date.alias("d2"))
    i = F.broadcast(dim_incident.alias("i"))
    loc = F.broadcast(dim_location.alias("l"))
    r = F.broadcast(dim_report_type.alias("r"))

    joined = (
        s.join(d1, F.col("s.`Incident Date`") == F.col("d1.FullDate"), "left")  # J1
        .join(t1, F.col("s.`Incident Time`") == F.col("t1.FullTime24"), "left")  # J2
        .join(  # J3: same dim aliased twice, expression key (::DATE cast)
            d2,
            F.to_date(F.col("s.`Report Datetime`")) == F.col("d2.FullDate"),
            "left",
        )
        .join(  # J5: composite 3-key, plain == (NULL keys never match)
            i,
            (F.col("s.`Incident Category`") == F.col("i.IncidentCategory"))
            & (F.col("s.`Incident Subcategory`") == F.col("i.IncidentSubcategory"))
            & (F.col("s.Resolution") == F.col("i.Resolution")),
            "left",
        )
        .join(  # J6: composite 2-key
            loc,
            (F.col("s.`Police District`") == F.col("l.PoliceDistrict"))
            & (F.col("s.`Analysis Neighborhood`") == F.col("l.AnalysisNeighborhood")),
            "left",
        )
        .join(  # J7: composite 2-key (FiledOnline intentionally not a key)
            r,
            (F.col("s.`Report Type Description`") == F.col("r.ReportType"))
            & (F.col("s.`Report Type Code`") == F.col("r.ReportTypeCode")),
            "left",
        )
    )

    if fix_report_time_id:
        # J4 made live: join report time to DimTime ("H:mm:ss", hour unpadded)
        t2 = F.broadcast(dim_time.alias("t2"))
        joined = joined.join(
            t2,
            F.date_format(F.col("s.`Report Datetime`"), "H:mm:ss")
            == F.col("t2.FullTime24"),
            "left",
        )
        report_time_id = F.col("t2.TimeID")
    else:
        report_time_id = F.col("t1.TimeID")  # bug-compatible (dags/ELT.py:270)

    return joined.select(
        F.col("s.id").alias("CrimeID"),
        F.col("d1.DateID").alias("IncidentDateID"),
        F.col("t1.TimeID").alias("IncidentTimeID"),
        F.col("d2.DateID").alias("ReportDateID"),
        report_time_id.alias("ReportTimeID"),
        F.col("l.LocationID").alias("LocationID"),
        F.col("i.IncidentID").alias("IncidentID"),
        F.col("r.ReportTypeID").alias("ReportTypeID"),
        F.col("s.`Incident Description`").alias("IncidentDescription"),
        F.col("s.Intersection").alias("Intersection"),
        F.col("s.Latitude").alias("Latitude"),
        F.col("s.Longitude").alias("Longitude"),
    )


def serve_initial_reports(
    fact: DataFrame,
    dim_date: DataFrame,
    dim_time: DataFrame,
    dim_location: DataFrame,
    dim_incident: DataFrame,
    dim_report_type: DataFrame,
) -> DataFrame:
    """The analytics/serve query (J8 + P5 + A3; dags/ELT.py:308-333).

    5-way inner star join on surrogate keys, IN-list filter on report
    type, 14-column projection, plus the pandas month-bucket post-step
    (``dt.to_period("M")``) expressed as ``date_format('yyyy-MM')``.
    All dims broadcast; the filter on the DimReportType side prunes the
    fact rows during the broadcast-hash probe.
    """
    f = fact.alias("f")
    idate = F.broadcast(dim_date.alias("idate"))
    itime = F.broadcast(dim_time.alias("itime"))
    loc = F.broadcast(dim_location.alias("l"))
    i = F.broadcast(dim_incident.alias("i"))
    r = F.broadcast(
        dim_report_type.filter(
            F.col("ReportType").isin("Coplogic Initial", "Initial", "Vehicle Initial")
        ).alias("r")
    )
    return (
        f.join(idate, F.col("f.IncidentDateID") == F.col("idate.DateID"))
        .join(itime, F.col("f.IncidentTimeID") == F.col("itime.TimeID"))
        .join(loc, F.col("f.LocationID") == F.col("l.LocationID"))
        .join(i, F.col("f.IncidentID") == F.col("i.IncidentID"))
        .join(r, F.col("f.ReportTypeID") == F.col("r.ReportTypeID"))
        .select(
            F.col("f.IncidentDescription"),
            F.col("f.Intersection"),
            F.col("f.Latitude"),
            F.col("f.Longitude"),
            F.col("idate.FullDate").alias("IncidentFullDate"),
            F.col("idate.HolidayName").alias("IncidentHolidayName"),
            F.col("idate.isWeekend").alias("IncidentisWeekend"),
            F.col("itime.FullTime12").alias("IncidentFullTime12"),
            F.col("itime.TimeOfDay").alias("IncidentTimeOfDay"),
            F.col("l.PoliceDistrict"),
            F.col("l.AnalysisNeighborhood"),
            F.col("i.IncidentCategory"),
            F.col("i.IncidentSubcategory"),
            F.col("r.ReportType"),
            F.date_format(F.col("idate.FullDate"), "yyyy-MM").alias("yearMonth"),
        )
    )
