"""Explicit StructType schemas for every table in the star schema.

Derived from the reference DDL (types at /root/reference/dags/ELT.py:47-81
for Staging, :121-145 for DimDate, :161-170 for DimTime, :185-200 /
:205-219 / :224-243 for the derived dims, :248-261 for FactCrime).
Schema inference is never used: it would mis-type the TIME columns, the
``Filed Online`` boolean (never explicitly false in the feed), and the
CHAR(2) report-type codes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: 34-column staging feed, positional match with the pipe-delimited CSV
#: (reference: dags/ELT.py:47-81; COPY options at :92-98 — header row,
#: ``NULL ''`` → our reader uses nullValue='').
STAGING_SCHEMA = StructType(
    [
        _f("Incident Datetime", TimestampType()),
        _f("Incident Date", DateType()),
        _f("Incident Time", StringType()),  # Postgres TIME → "H:mm:ss" string (SURVEY §1.2)
        _f("Incident Year", IntegerType()),
        _f("Incident Day of Week", StringType()),
        _f("Report Datetime", TimestampType()),
        _f("Row ID", LongType()),
        _f("Incident ID", IntegerType()),
        _f("Incident Number", LongType()),
        _f("CAD Number", IntegerType()),
        _f("Report Type Code", StringType()),
        _f("Report Type Description", StringType()),
        _f("Filed Online", BooleanType()),
        _f("Incident Code", IntegerType()),
        _f("Incident Category", StringType()),
        _f("Incident Subcategory", StringType()),
        _f("Incident Description", StringType()),
        _f("Resolution", StringType()),
        _f("Intersection", StringType()),
        _f("CNN", DecimalType(38, 18)),
        _f("Police District", StringType()),
        _f("Analysis Neighborhood", StringType()),
        _f("Supervisor District", IntegerType()),
        _f("Latitude", DoubleType()),
        _f("Longitude", DoubleType()),
        _f("Point", StringType()),
        _f("Neighborhoods", IntegerType()),
        _f("ESNCAG - Boundary File", ShortType()),
        _f("Central Market/Tenderloin Boundary Polygon - Updated", ShortType()),
        _f("Civic Center Harm Reduction Project Boundary", ShortType()),
        _f("HSOC Zones as of 2018-06-05", ShortType()),
        _f("Invest In Neighborhoods (IIN) Areas", ShortType()),
        _f("Current Supervisor Districts", ShortType()),
        _f("Current Police Districts", ShortType()),
    ]
)

#: DimTime: 9 columns, one row per second of day (reference DDL
#: dags/ELT.py:161-170; semantics verified against data/dimTime.csv).
DIM_TIME_SCHEMA = StructType(
    [
        _f("TimeID", IntegerType(), False),  # HHMMSS int encoding
        _f("Hour24", ShortType(), False),
        _f("Hour12", ShortType(), False),
        _f("Minute", ShortType(), False),
        _f("Second", ShortType(), False),
        _f("AMPM", StringType(), False),
        _f("FullTime24", StringType(), False),  # "H:mm:ss", hour not zero-padded
        _f("FullTime12", StringType(), False),  # "h:mm:ss AM"
        _f("TimeOfDay", StringType(), False),
    ]
)

#: DimDate: 24 columns (reference DDL dags/ELT.py:121-145; the seed CSV is
#: missing from the checkout, so generation conventions are documented in
#: SURVEY §2.7; "CalenderYear" typo preserved from the reference).
DIM_DATE_SCHEMA = StructType(
    [
        _f("DateID", IntegerType(), False),  # yyyyMMdd int (by analogy with TimeID)
        _f("FullDate", DateType(), False),
        _f("DayNameOfWeek", StringType(), False),
        _f("DayNameOfWeekShort", StringType(), False),
        _f("DayNumberOfMonth", ShortType(), False),
        _f("DayNumberOfWeek", ShortType(), False),
        _f("DayNumberOfYear", ShortType(), False),
        _f("HolidayName", StringType(), True),
        _f("isHoliday", BooleanType(), False),
        _f("isWeekday", BooleanType(), False),
        _f("isWeekend", BooleanType(), False),
        _f("MonthName", StringType(), False),
        _f("MonthNameShort", StringType(), False),
        _f("MonthNumberOfYear", ShortType(), False),
        _f("isEndOfMonth", BooleanType(), False),
        _f("CalendarQuarterNumber", ShortType(), False),
        _f("CalendarQuarterName", StringType(), False),
        _f("CalendarQuarterShortName", StringType(), False),
        _f("SameDayPreviousYear", DateType(), False),
        _f("Season", StringType(), False),
        _f("WeekBeginDate", DateType(), False),
        _f("WeekNumberOfMonth", ShortType(), False),
        _f("WeekNumberOfYear", ShortType(), False),
        _f("CalenderYear", ShortType(), False),
    ]
)

#: Derived dims (reference: dags/ELT.py:185-200, 205-219, 224-243).
DIM_LOCATION_SCHEMA = StructType(
    [
        _f("LocationID", IntegerType(), False),
        _f("PoliceDistrict", StringType()),
        _f("AnalysisNeighborhood", StringType()),
    ]
)

DIM_INCIDENT_SCHEMA = StructType(
    [
        _f("IncidentID", IntegerType(), False),
        _f("IncidentCategory", StringType()),
        _f("IncidentSubcategory", StringType()),
        _f("Resolution", StringType()),
    ]
)

DIM_REPORT_TYPE_SCHEMA = StructType(
    [
        _f("ReportTypeID", IntegerType(), False),
        _f("ReportType", StringType()),
        _f("ReportTypeCode", StringType()),
        _f("FiledOnline", BooleanType(), False),
    ]
)

#: FactCrime: 12 columns (reference: dags/ELT.py:248-261).
FACT_CRIME_SCHEMA = StructType(
    [
        _f("CrimeID", LongType(), False),  # load-order id of the staging row
        _f("IncidentDateID", IntegerType()),
        _f("IncidentTimeID", IntegerType()),
        _f("ReportDateID", IntegerType()),
        _f("ReportTimeID", IntegerType()),
        _f("LocationID", IntegerType()),
        _f("IncidentID", IntegerType()),
        _f("ReportTypeID", IntegerType()),
        _f("IncidentDescription", StringType()),
        _f("Intersection", StringType()),
        _f("Latitude", DoubleType()),
        _f("Longitude", DoubleType()),
    ]
)
