"""Write `.explain("formatted")` for named queries to stdout or a file.

Usage: python tools/explain_query.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt per query (plan shape is
scale-invariant; dumped at sf0.001 unless SPARK_GRAFT_SF_DIR says
otherwise).  Used for the per-round plans/rNN before/after evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from go_mapreduce_spark.queries import QUERIES
    from go_mapreduce_spark.session import get_spark

    spark = get_spark("explain", cpus=8, shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
