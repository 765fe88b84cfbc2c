"""Ad-hoc SQL entry point over the fixture star schema.

The "switch from the reference" usability surface: the reference's
only entry point was a compiled (Map, Reduce) pair per binary
(reference wc.go:46-70 — changing the query means recompiling the
worker); here any ANSI SQL runs against the registered tables with
the full Catalyst pipeline (pushdown, pruning, AQE) underneath.

    python -m go_mapreduce_spark.sqlcli \
        --sf-dir /root/testdata/sf0.01 \
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1 ORDER BY 1"

Prints TSV to stdout (header first); use --limit to cap rows
(default 1000, 0 = unlimited), --explain to print the physical plan
instead of rows.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", help="ANSI SQL over the fixture tables")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--limit", type=int, default=1000, help="max rows printed; 0 = all")
    p.add_argument("--explain", action="store_true", help="print the plan, not rows")
    args = p.parse_args(argv)

    from go_mapreduce_spark.session import get_spark
    from go_mapreduce_spark.sources.registry import register_temp_views

    spark = get_spark("sqlcli", cpus=args.cpus, shuffle_partitions=args.cpus)
    register_temp_views(spark, args.sf_dir)
    df = spark.sql(args.query)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.limit:
        df = df.limit(args.limit)
    cols = df.columns
    print("\t".join(cols))
    for row in df.toLocalIterator():
        print("\t".join("" if v is None else str(v) for v in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
