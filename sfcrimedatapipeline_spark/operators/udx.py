"""User-defined execution surfaces: a grouped-aggregate pandas UDAF and
a Python UDTF — the two extension points a user reaches for when an
aggregation or a row-expansion genuinely cannot be expressed with
built-in expressions.

Both are demonstrated on semantics that DO have SQL twins, precisely so
the driver's DuckDB hash gate can prove the custom-code path computes
the exact same result as the relational formulation.

Scale notes
-----------
``weighted_mean_by`` is ``groupBy().applyInPandas`` — Arrow-batched,
one shuffle on the group key, numpy int64 accumulation inside each
group (exact, order-independent — float sums would make the hash
depend on row order). Skew caveat from the project playbook applies:
applyInPandas groups can't be split by AQE, so group cardinality must
be bounded (here: grouping keys are low-cardinality flags).

``SplitSentences`` is a Python UDTF (Spark 4, arrow-optimized when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is set). For plain
delimiter splits the JVM path (``posexplode(split(...))`` — see
tpch.f3_explode_pos) is strictly faster; the UDTF exists for expansions
that need imperative Python per row, and the oracle-gated query proves
the plumbing end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

#: output schema of weighted_mean_by
_WMEAN_SCHEMA = "group_key string, n_items long, sum_qty long, wavg_price double"


def weighted_mean_by(df: DataFrame, key: str, price: str, weight: str) -> DataFrame:
    """Per-``key`` weighted mean of ``price`` weighted by ``weight``,
    as a pandas grouped-map UDAF with exact integer-cents accumulation.

    ``price`` is a 2-decimal money double; ``weight`` an integral
    double. Accumulation is int64 cents × int64 weight — exact and
    order-independent, so the result is bit-identical to the SQL twin
    ``(sum(cents*w)/sum(w))/100`` regardless of partitioning.
    """

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        # floor(x*100 + 0.5): engine-portable nearest-cent (no tie-mode
        # dependence; the .5 boundary is unreachable from 2-dec doubles)
        cents = np.floor(pdf[price].to_numpy() * 100.0 + 0.5).astype(np.int64)
        w = pdf[weight].to_numpy().astype(np.int64)
        wsum = int((cents * w).sum())
        sum_qty = int(w.sum())
        return pd.DataFrame(
            {
                "group_key": [pdf[key].iloc[0]],
                "n_items": [len(pdf)],
                "sum_qty": [sum_qty],
                "wavg_price": [(wsum / sum_qty) / 100.0],
            }
        )

    return df.select(key, price, weight).groupBy(key).applyInPandas(agg, _WMEAN_SCHEMA)


@udtf(returnType="sent_idx int, sentence string")
class SplitSentences:
    """UDTF: expand one document into ``'. '``-delimited sentence rows
    with 0-based positions (Python ``str.split`` keeps empty segments,
    matching DuckDB's ``string_split``)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s


def md5_prefix_udf():
    """Vectorized (Arrow-batched) SCALAR pandas UDF: first 8 hex digits
    of md5 as a BIGINT — the same portable-hash formula as
    ``corpus.deterministic_uniform``, here exercised through the third
    Python execution surface (scalar pandas UDF, next to the grouped
    UDAF and the UDTF). Integer-exact, so the whole Arrow round trip is
    oracle-checkable with no tolerance.

    The per-batch work is a Python map over ~10k-row Arrow batches —
    deliberately: this surface exists for logic the JVM cannot express;
    for md5 itself the JVM ``F.md5`` is the production path
    (dedup_exact uses it) and this UDF is the parity-checked harness.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def md5_prefix(s: pd.Series) -> pd.Series:
        # NULL in → NULL out, matching JVM F.md5 and the SQL oracle
        # (str(None) would silently hash the literal 'None' — ADVICE r4);
        # na_action skips every pandas missing flavor (None/NaN/NA)
        return s.map(
            lambda t: int(hashlib.md5(str(t).encode()).hexdigest()[:8], 16),
            na_action="ignore",
        )

    return md5_prefix


_COGROUP_SCHEMA = (
    "user_id long, n_clicks long, n_purchases long, n_purchases_after_first_click long"
)


def cogroup_click_purchase(events: DataFrame) -> DataFrame:
    """Two-sided pandas CO-GROUP (``groupBy().cogroup().applyInPandas``)
    — the last of the Arrow execution surfaces (scalar UDF, grouped-agg
    UDAF, grouped map, mapInPandas, stateful map, and this): clicks and
    purchases are co-partitioned per user and handed to Python as a
    pair of aligned frames, the shape custom cross-stream reconciliation
    logic needs when it can't be expressed as a join.

    Counts are exact integers (timestamp comparisons, no float), so the
    whole surface sits under the value-hash gate; either side may be
    empty for a user — both appear in the output.

    Scale posture, stated honestly: cogroup pays a per-GROUP Python
    round trip (~4 ms/group measured — 6.3 s for 1500 users at sf0.1),
    which amortizes only when groups are large or the per-group logic
    is genuinely imperative. THIS particular metric is expressible
    relationally (the oracle proves it), so a production pipeline
    would use the join form; the operator exists for the cases that
    aren't, and the gate certifies the surface's correctness, not a
    recommendation to route joins through Python.
    """
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )

    def align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        user = left["user_id"].iloc[0] if len(left) else right["user_id"].iloc[0]
        after = 0
        if len(left) and len(right):
            after = int((right["ts"] > left["ts"].min()).sum())
        return pd.DataFrame(
            {
                "user_id": [user],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "n_purchases_after_first_click": [after],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(align, _COGROUP_SCHEMA)
    )


def nfc_normalize_udf():
    """Arrow-batched scalar pandas UDF: Unicode NFC normalization —
    composes decomposed sequences (e + U+0301 → é) so that visually
    identical strings fingerprint identically. The canonical pre-pass
    for every hash-based dedup path on multilingual corpora (the NFC
    caveat documented in dedup.fuzzy_dup_pairs' unicode_mode).

    Spark has no built-in Unicode normalizer, so this is a legitimate
    Python-surface op, not a demo: ``unicodedata.normalize`` implements
    the same Unicode spec as DuckDB's ``nfc_normalize``, so outputs are
    bit-identical and the surface is fully hash-gateable. NULL in →
    NULL out.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFC", t), na_action="ignore")

    return nfc


def with_nfc_normalized(df, text_col: str = "text"):
    """``nfc_text`` + ``nfc_changed`` columns via :func:`nfc_normalize_udf`."""
    from pyspark.sql import functions as F

    nfc = nfc_normalize_udf()
    out = df.withColumn("nfc_text", nfc(F.col(text_col)))
    return out.withColumn(
        "nfc_changed",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("boolean")).otherwise(
            F.col("nfc_text") != F.col(text_col)
        ),
    )


def arrow_batch_cents(df, value_col: str = "value", id_col: str = "event_id"):
    """``mapInArrow`` — the FIFTH Python execution surface: the
    transform receives raw ``pyarrow.RecordBatch`` objects (no pandas
    materialization at all — cheaper than mapInPandas when the logic
    is already columnar). Computes exact integer cents per row with
    pyarrow compute kernels; NULL-safe by Arrow semantics.

    Production guidance unchanged: floor(x*100+0.5) is one Catalyst
    expression — this surface exists for columnar logic the JVM lacks
    (custom Arrow kernels, zero-copy interop), and the harness proves
    the round trip is bit-exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            ids = batch.column(0)
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(pc.cast(batch.column(1), pa.float64()),
                                            pa.scalar(100.0)),
                                pa.scalar(0.5))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays([ids, cents], ["event_id", "cents"])

    return df.select(id_col, value_col).mapInArrow(
        batches, "event_id long, cents long"
    )
