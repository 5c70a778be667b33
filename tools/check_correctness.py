"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified). Exit 0 iff everything matches.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, sorted(cols)


def main() -> int:
    import __spark_entry__ as e
    from sfcrimedatapipeline_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = sdf.columns
        dt = time.time() - t0
        spark.catalog.clearCache()  # drop operator-persisted frames between queries
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(spark_rows):7d} rows  ({dt:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"✗ {name:28s} ORACLE ERROR: {ex}")
            continue
        sh, scols = frame_hash(spark_cols, spark_rows)
        dh, dcols = frame_hash(duck_cols, duck_rows)
        ok = len(spark_rows) == len(duck_rows) and scols == dcols and sh == dh
        mark = "✓" if ok else "✗"
        if not ok:
            failures.append(name)
        print(
            f"{mark} {name:28s} spark={len(spark_rows):7d} duck={len(duck_rows):7d} "
            f"cols={'=' if scols == dcols else f'{scols} vs {dcols}'} "
            f"hash={'=' if sh == dh else f'{sh} vs {dh}'} ({dt:.1f}s)"
        )
        if not ok and len(spark_rows) == len(duck_rows) and scols == dcols:
            # show first differing row pair for debugging
            order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            s_lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in spark_rows)
            dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            d_lines = sorted("|".join(norm_cell(r[i]) for i in dorder) for r in duck_rows)
            for a, b in zip(s_lines, d_lines):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
    print(("FAIL: " + ", ".join(failures)) if failures else "ALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
