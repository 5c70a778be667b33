"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column
names, column DTYPES, and an order-insensitive value hash (columns
sorted by name, rows sorted, exact value reprs — no float smoothing).

Type sensitivity is the point: round 1 proved the driver's hash
distinguishes Spark's widened aggregate types (sum(decimal(18,2)) →
decimal(28,2)) from DuckDB's (→ DECIMAL(38,2)) even when every value
matches, so this replica hashes the canonicalized dtype of every
column alongside the values — a local ALL MATCH must predict a driver
pass (VERDICT.md round 1, "What's wrong" #1).

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

#: DuckDB type-name → Spark dtype-string canonicalization. Anything not
#: listed maps through lowercase unchanged (decimal(p,s), bigint,
#: double, timestamp, date, boolean all agree modulo case).
_DUCK_CANON = {"integer": "int", "varchar": "string"}


def canon_type(t: str) -> str:
    t = t.lower()
    return _DUCK_CANON.get(t, t)


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        return repr(v)  # shortest round-trip — exact, no :.9g smoothing
    return str(v)  # Decimal str() keeps scale: Decimal('1.10') -> '1.10'


def frame_hash(
    cols: list[str], dtypes: list[str], rows: list[tuple]
) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    typed_cols = [f"{cols[i]}:{canon_type(dtypes[i])}" for i in order]
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256(("|".join(typed_cols) + "\n" + "\n".join(lines)).encode())
    return h.hexdigest()[:16], typed_cols


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
        spark_types = [t for _, t in sdf.dtypes]
        dt = time.time() - t0
        spark.catalog.clearCache()  # drop operator-persisted frames between queries
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(spark_rows):7d} rows  ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"✗ {name:28s} ORACLE ERROR: {ex}")
            continue
        sh, scols = frame_hash(spark_cols, spark_types, spark_rows)
        dh, dcols = frame_hash(duck_cols, duck_types, duck_rows)
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
