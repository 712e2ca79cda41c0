"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() in DuckDB at sf0.01,
compare row count + column names + order-insensitive values.

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "hex") and isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tlgs_spark.entry_queries import QUERIES, resolve_sql
    from tlgs_spark.session import get_spark

    spark = get_spark(app_name="check_entry", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_nosql = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = spec["fn"](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        # spec["sql"] may be a GENERATOR (data-derived literals, e.g.
        # fitted IVF centroids) — resolve it against this sf_dir the
        # same way __spark_entry__.oracle_sql() does for the driver
        sql = resolve_sql(spec["sql"], sf_dir)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            n_nosql += 1
            continue
        try:
            rel = con.sql(sql)
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sv = frame_key([c.lower() for c in s_cols], s_rows)
        dc, dv = frame_key(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sv) != len(dv):
            print(f"FAIL {name}: rows {len(sv)} vs {len(dv)}")
            n_fail += 1
            continue
        if sv != dv:
            diffs = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at {len([1 for a,b in zip(sv,dv) if a!=b])} rows; first:")
            for i in diffs:
                print(f"   spark {sv[i]}")
                print(f"   duck  {dv[i]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sv)} rows")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_nosql} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
