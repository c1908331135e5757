"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given sf dir, compares row count, column names, and order-insensitive
values (floats must already be rounded by both sides).

    python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(sql)
            o_cols = [c for c in res.columns]
            o_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        ok_cols = sorted(s_cols) == sorted(o_cols)
        s_can, o_can = canon(s_rows, s_cols), canon(o_rows, o_cols)
        ok = ok_cols and s_can == o_can
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: spark={len(s_rows)} oracle={len(o_rows)} "
              f"cols={'ok' if ok_cols else f'{s_cols} vs {o_cols}'} "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            n_fail += 1
            if ok_cols:
                s_only = [r for r in s_can if r not in set(o_can)][:3]
                o_only = [r for r in o_can if r not in set(s_can)][:3]
                print(f"  spark-only: {s_only}")
                print(f"  oracle-only: {o_only}")
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
