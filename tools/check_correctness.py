"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists,
the matching SQL on DuckDB over the same parquet fixtures; compares
row count, column names, and an order-insensitive value hash with
doubles rounded to 12 significant digits (FIXTURES.md determinism
rules).  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

_args = sys.argv[1:]
OUT = None
if "--out" in _args:
    i = _args.index("--out")
    OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2 :]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):  # datetime/date — compare at µs
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    from go_mapreduce_spark.session import get_spark
    from go_mapreduce_spark.queries import QUERIES, ORACLE_SQL

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    record: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            record[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {type(e).__name__}",
            }
            continue
        if name not in ORACLE_SQL:
            print(f"ok   {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            ores = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            record[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb error: {type(e).__name__}",
            }
            continue
        problems = []
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = None
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not schema_match:
            problems.append(f"columns spark={scols} oracle={ocols}")
        if not problems:
            ss, oo = row_set(scols, srows), row_set(ocols, orows)
            hash_match = ss == oo
            if not hash_match:
                diff = [(a, b) for a, b in zip(ss, oo) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        record[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": bool(hash_match) if hash_match is not None else False,
            "spark_rows": len(srows), "oracle_rows": len(orows),
            "err": "; ".join(problems) or None,
        }
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    if OUT:
        import json

        with open(OUT, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {OUT} ({len(record)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
