"""Versioned-table contract: snapshot isolation, time travel,
rollback-as-metadata, crash-survivor handling, and vacuum safety."""

from __future__ import annotations

import json
import os

from sfcrimedatapipeline_spark.sources import versioned as V


def _df(spark, vals):
    return spark.createDataFrame([(i, f"v{i}") for i in vals], "id long, s string")


def test_time_travel_and_latest(spark, tmp_path):
    p = str(tmp_path / "t")
    v1 = V.write_version(_df(spark, range(5)), p, note="initial")
    v2 = V.write_version(_df(spark, range(100, 103)), p, note="refresh")
    assert (v1, v2) == (1, 2)
    assert V.read_version(spark, p).count() == 3            # latest
    assert V.read_version(spark, p, 1).count() == 5          # time travel
    assert sorted(r["id"] for r in V.read_version(spark, p, 2).collect()) == [
        100, 101, 102,
    ]
    assert [h["note"] for h in V.history(p)] == ["initial", "refresh"]


def test_rollback_is_metadata_only_and_appends_history(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_version(_df(spark, range(4)), p)
    V.write_version(_df(spark, range(9)), p, note="bad load")
    v3 = V.rollback(p, 1)
    assert v3 == 3
    assert V.read_version(spark, p).count() == 4
    # no new data files were written: v3 references v1's files
    assert V.read_manifest(p, 3)["files"] == V.read_manifest(p, 1)["files"]
    assert len(V.history(p)) == 3  # bad version stays inspectable
    assert V.read_version(spark, p, 2).count() == 9


def test_crash_survivor_manifest_is_skipped_not_clobbered(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_version(_df(spark, range(3)), p)
    # simulate a crash between manifest write and _latest update:
    # v2 manifest exists, pointer still says 1
    m = dict(V.read_manifest(p, 1), version=2, note="crashed commit")
    V._atomic_write(V._manifest_path(p, 2), json.dumps(m))
    assert V.latest_version(p) == 2  # manifest is the commit
    v3 = V.write_version(_df(spark, range(7)), p)
    assert v3 == 3  # next writer never reuses the survivor's number
    assert V.read_version(spark, p).count() == 7


def test_vacuum_reclaims_only_unreferenced_groups(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_version(_df(spark, range(2)), p)
    V.write_version(_df(spark, range(3)), p)
    V.rollback(p, 1)  # v3 references v1's files
    removed = V.vacuum(p, keep_versions=2)  # keep v2, v3
    # v1's group is shared with v3 -> retained; v2's group is its own
    assert removed == []  # v2 is within keep window
    removed = V.vacuum(p, keep_versions=1)  # keep only v3
    assert len(removed) == 1  # v2's group reclaimed, v1's survives via v3
    assert V.read_version(spark, p).count() == 2  # latest still readable
    assert V.read_version(spark, p, 1).count() == 2  # shared files intact
