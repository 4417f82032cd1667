"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01; compare row
count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalar / Decimal-ish
        try:
            return norm_cell(v.item())
        except Exception:
            pass
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return norm_cell(float(v))
    except Exception:
        pass
    return str(v)


def to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from documentai_ocr_spark.session import get_spark

    spark = get_spark(app_name="check-queries", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(spark_rows)} (rows-only) [{el:.1f}s]")
            if not spark_rows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok = True
        if len(spark_rows) != len(duck_rows):
            print(
                f"FAIL {name}: row count spark={len(spark_rows)} "
                f"duck={len(duck_rows)}"
            )
            ok = False
        if sorted(c.lower() for c in spark_cols) != sorted(
            c.lower() for c in duck_cols
        ):
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            ok = False
        if ok:
            ms_s = to_multiset(spark_rows, [c.lower() for c in spark_cols])
            ms_d = to_multiset(duck_rows, [c.lower() for c in duck_cols])
            if ms_s != ms_d:
                diff = [
                    (a, b) for a, b in zip(ms_s, ms_d) if a != b
                ][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS {name}: rows={len(spark_rows)} [{el:.1f}s]")
            if not spark_rows:
                print(f"WARN {name}: zero rows (trivially equal)")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
