"""Golden test: generate_dim_time must equal the reference's shipped
data/dimTime.csv row-for-row — the only ground truth the reference
ships (SURVEY §5.2.2). Pins the TimeID HHMMSS encoding, Hour12/AMPM
boundaries, unpadded-hour string formats, and TimeOfDay buckets."""

from __future__ import annotations

import csv
import os

import pytest

from sfcrimedatapipeline_spark.plans.dims import generate_dim_time

GOLDEN = "/root/reference/data/dimTime.csv"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference CSV not present")
def test_dim_time_matches_reference_csv(spark):
    generated = generate_dim_time(spark).orderBy("TimeID").collect()
    assert len(generated) == 86400

    with open(GOLDEN, newline="") as fh:
        reader = csv.DictReader(fh)
        for i, (want, got) in enumerate(zip(reader, generated)):
            assert int(want["TimeID"]) == got["TimeID"], i
            assert int(want["Hour24"]) == got["Hour24"], i
            assert int(want["Hour12"]) == got["Hour12"], i
            assert int(want["Minute"]) == got["Minute"], i
            assert int(want["Second"]) == got["Second"], i
            assert want["AMPM"] == got["AMPM"], i
            assert want["FullTime24"] == got["FullTime24"], i
            assert want["FullTime12"] == got["FullTime12"], i
            assert want["TimeOfDay"] == got["TimeOfDay"], i


def test_time_of_day_bucket_counts(spark):
    # verified counts from SURVEY §2.7
    counts = {
        r["TimeOfDay"]: r["n"]
        for r in generate_dim_time(spark).groupBy("TimeOfDay").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {
        "Night": 36000,
        "Morning": 21600,
        "Noon": 3600,
        "Afternoon": 14400,
        "Evening": 10800,
    }
