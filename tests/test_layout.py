"""Storage-layout operators: z-value math, the data-skipping effect of
z-order clustering on parquet footer stats, and small-file compaction."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.layout import (
    compact_parquet_dir,
    zorder_value,
    zorder_write,
)
from sfcrimedatapipeline_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    # x bits -> even positions, y bits -> odd: x=0b11 -> 0b101, y=0b01 -> 0b010
    assert df.select(zorder_value(["x", "y"]).alias("z")).first()["z"] == 0b111


def _file_stats(path, col):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_zorder_write_tightens_file_stats(spark, tmp_path):
    # 64×64 uniform grid, 16 files: each file is a contiguous z-interval
    # = a ~16×16 quadtree block, so a point predicate on EITHER axis
    # overlaps only the ~4 files of that axis strip. A layout sorted by
    # one column alone would leave all 16 files overlapping for the
    # other column — that asymmetry is what z-order removes.
    n = 64
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    n_files = 16
    zpath = str(tmp_path / "zordered")
    zorder_write(grid, zpath, ["x", "y"], n_files=n_files)

    assert spark.read.parquet(zpath).count() == n * n  # data intact

    probe = n // 2 + 1
    for col in ("x", "y"):
        stats = _file_stats(zpath, col)
        assert len(stats) == n_files
        overlapping = sum(1 for lo, hi in stats if lo <= probe <= hi)
        assert overlapping <= n_files // 2, (col, probe, stats)


def test_compact_parquet_dir_reduces_files_preserves_rows(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events").select("event_id", "user_id")
    path = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 64

    before = ev.count()
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert n == 1 and len(files) == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    assert after.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_range_layout_prunes_time_predicates(spark, tmp_path):
    """Range layout: a time-range predicate must touch only the files
    whose footer [min,max] overlaps it — verified from the parquet
    footers themselves, the same stats the scan's row-group skipping
    reads."""
    import pyarrow.parquet as pq

    from sfcrimedatapipeline_spark.operators.layout import range_layout_write
    from sfcrimedatapipeline_spark.sources.tables import read_table

    # session pins TIMESTAMP_MICROS output (INT96 carries no stats);
    # assert that engine-wide choice is in force, then exercise it
    assert (
        spark.conf.get("spark.sql.parquet.outputTimestampType")
        == "TIMESTAMP_MICROS"
    )
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "ev_range")
    range_layout_write(ev, out, ["ts"], n_files=8)

    import glob

    spans = []
    for f in sorted(glob.glob(out + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            idx = [c for c in range(row_group.num_columns)
                   if row_group.column(c).path_in_schema == "ts"][0]
            st = row_group.column(idx).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min); maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4  # stats present on the populated files
    spans.sort()
    # files cover DISJOINT ranges (allowing boundary ties)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # a one-span predicate overlaps few files
    lo, hi = spans[3]
    overlapping = sum(1 for s_lo, s_hi in spans if s_lo <= hi and s_hi >= lo)
    assert overlapping <= 3


def test_compaction_plan_bins_are_contiguous_and_near_target(spark):
    """Plan invariants: every byte lands in exactly one bin; bins are
    contiguous runs of the path order (no interleaving); each bin
    except the last reaches the target once its straddling file is
    counted, and overshoot is bounded by one file."""
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.layout import (
        compaction_plan,
        compaction_summary,
    )

    target = 1000
    files = spark.range(200).select(
        F.format_string("part-%05d", F.col("id")).alias("path"),
        ((F.col("id") * 37) % 300 + 1).cast("long").alias("bytes"),
    )
    plan = compaction_plan(files, "path", "bytes", target).cache()
    assert plan.count() == 200
    total = files.agg(F.sum("bytes")).first()[0]

    rows = sorted(plan.collect(), key=lambda r: r["path"])
    max_file = max(r["bytes"] for r in rows)
    # contiguity: bin ids are non-decreasing along the path order
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)

    summary = {r["bin_id"]: r for r in compaction_summary(plan, "path", "bytes").collect()}
    assert sum(r["bin_bytes"] for r in summary.values()) == total
    last_bin = max(summary)
    for b, r in summary.items():
        assert r["bin_bytes"] < target + max_file
        if b != last_bin:
            # the NEXT file started a new bin, so this bin's exclusive
            # cumsum already crossed its right edge minus one file
            assert r["bin_bytes"] + max_file >= target
    plan.unpersist()
