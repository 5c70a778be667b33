"""Stream-stream join semantics: the windowed self-join emits exactly
the batch pair set, and the horizon bounds are honored."""

from __future__ import annotations

import datetime as dt
import tempfile

from sfcrimedatapipeline_spark.streaming.events import (
    click_purchase_within,
    run_stream_to_memory,
    write_time_sliced_stream_dir,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, float(v), None) for i, (ts, uid, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_horizon_bounds_inclusive_exclusive(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = _events(
        spark,
        [
            (t0, 1, "click", 0),
            (t0, 1, "purchase", 10),                            # same instant: matches
            (t0 + dt.timedelta(minutes=59, seconds=59), 1, "purchase", 20),  # inside
            (t0 + dt.timedelta(hours=1), 1, "purchase", 30),    # boundary: excluded
            (t0 - dt.timedelta(seconds=1), 1, "purchase", 40),  # before click: excluded
            (t0 + dt.timedelta(minutes=30), 2, "purchase", 50), # other user: excluded
        ],
    )
    got = sorted(
        r["purchase_value"] for r in click_purchase_within(ev).collect()
    )
    assert got == [10.0, 20.0]


def test_streaming_emits_exact_batch_pair_set(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for u in range(3):
        for k in range(40):
            ts = t0 + dt.timedelta(minutes=17 * k + u)
            rows.append((ts, u, "click" if k % 3 else "purchase", k))
    ev = _events(spark, rows)
    batch = {
        (r["click_id"], r["purchase_id"])
        for r in click_purchase_within(ev).collect()
    }
    stream_dir = write_time_sliced_stream_dir(
        ev, tempfile.mkdtemp(prefix="ssj_test_"), n_slices=3
    )
    streamed = run_stream_to_memory(
        spark,
        stream_dir,
        click_purchase_within,
        query_name="ssj_parity_test",
        output_mode="append",
    )
    got = {(r["click_id"], r["purchase_id"]) for r in streamed.collect()}
    assert got == batch and len(batch) > 0
