"""Extract + serve endpoints (SURVEY §2.1 S1/S6/S7).

The reference's pipeline tail is ``pd.read_sql`` into pandas followed by
a Google-Sheets write (/root/reference/dags/ELT.py:330-358), and its
head is a streamed HTTP download (/root/reference/dags/ELT.py:22-36).
Engine equivalents:

- S1 ``fetch``: chunked streaming download to a local file — stdlib
  ``urllib`` (8 KiB chunks like the reference), driver-side by design:
  the reference's extract is a single-file feed, not a distributed
  scan; the engine proper starts at the CSV (SURVEY §2.1).
- S6 ``to_pandas``: the DataFrame→pandas bridge (Arrow-accelerated —
  the session enables ``spark.sql.execution.arrow.pyspark.enabled``).
  This is a DRIVER-MEMORY materialization: serve-sized results only,
  never a fact table.
- S7 ``export_csv``: the neutral export sink standing in for the
  Sheets client (a pygsheets call over ``to_pandas`` output is the
  identical integration, out of engine scope). ``coalesce(1)`` mirrors
  the single-sheet target; leave ``single_file=False`` for
  cluster-sized exports.
"""

from __future__ import annotations

import shutil
import urllib.request

import pandas as pd
from pyspark.sql import DataFrame

#: the reference streams in 8192-byte chunks (dags/ELT.py:34)
FETCH_CHUNK_SIZE = 8192


def fetch(url: str, local_path: str, chunk_size: int = FETCH_CHUNK_SIZE) -> str:
    """S1: stream ``url`` to ``local_path`` in fixed-size chunks
    (bounded memory regardless of feed size — dags/ELT.py:22-36).
    Supports any urllib scheme (https, file) — no third-party client."""
    with urllib.request.urlopen(url) as src, open(local_path, "wb") as dst:  # noqa: S310
        shutil.copyfileobj(src, dst, length=chunk_size)
    return local_path


def to_pandas(df: DataFrame) -> pd.DataFrame:
    """S6: result-set → pandas bridge (``pd.read_sql`` at
    dags/ELT.py:330). Arrow batch transfer; driver-sized results only."""
    return df.toPandas()


def export_csv(
    df: DataFrame, path: str, single_file: bool = True, header: bool = True
) -> None:
    """S7: neutral serve sink (the Sheets write at dags/ELT.py:346-358
    modulo the Google client). ``single_file`` coalesces to one part
    file — the single-sheet shape; disable for cluster-sized exports."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).csv(path)
