"""Driver-strict oracle differential: run every registered query on Spark
and its DuckDB twin, compare value *renderings* (str of each cell), which is
what the round-1 driver hashed. Catches int-vs-float and Decimal-vs-double
render mismatches that a numeric-tolerance compare would wave through.

Usage: python scripts/strict_oracle_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from whale_sightings_spark.plans.queries import oracle_sql, queries
from whale_sightings_spark.schemas import TESTDATA_TABLES
from whale_sightings_spark.session import get_spark


def _render(v) -> str:
    if v is None:
        return "\x00NULL"
    return str(v)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_render(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("strict-oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_sql = queries(), oracle_sql()
    bad = {}
    detail = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name not in os_sql:
                print(f"{name}: NO-ORACLE rows={len(s_rows)}")
                detail[name] = {"status": "no-oracle", "rows": len(s_rows)}
                continue
            d = con.execute(os_sql[name])
            d_cols = sorted(c[0] for c in d.description)
            d_rows = _norm([c[0] for c in d.description], d.fetchall())
            status = []
            if s_cols != d_cols:
                status.append(f"cols {s_cols} != {d_cols}")
            if len(s_rows) != len(d_rows):
                status.append(f"rows {len(s_rows)} != {len(d_rows)}")
            elif s_rows != d_rows:
                n_diff = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
                first = next((a, b) for a, b in zip(s_rows, d_rows) if a != b)
                status.append(f"values differ in {n_diff}/{len(s_rows)} rows; first: spark={first[0]} oracle={first[1]}")
            if len(s_rows) == 0:
                status.append("VACUOUS (0 rows)")
            if status:
                bad[name] = status
                detail[name] = {"status": "MISMATCH", "detail": status}
                print(f"{name}: MISMATCH: {'; '.join(status)}")
            else:
                detail[name] = {"status": "ok", "rows": len(s_rows)}
                print(f"{name}: ok rows={len(s_rows)}")
        except Exception as e:  # noqa: BLE001
            bad[name] = [f"error: {e}"]
            detail[name] = {"status": "ERROR", "detail": str(e)[:300]}
            print(f"{name}: ERROR: {e}")
    print(json.dumps({"bad": sorted(bad)}, indent=0))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(detail),
                    "n_bad": len(bad),
                    "bad": sorted(bad),
                    "queries": detail,
                },
                f,
                indent=1,
            )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
