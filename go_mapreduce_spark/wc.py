"""Word-count CLI — the reference's example app surface (wc.go:46-70).

The reference dispatches on argv[1]: sequential | master | worker |
submit.  On Spark the master/worker/submit runtime modes are the
cluster manager's job, so the CLI keeps:

    python -m go_mapreduce_spark.wc sequential <file> [out_dir]
        — the RDD parity shim end-to-end (Split→Map→Shuffle→Reduce→
          Merge→sorted TSV), NMap=5/NReduce=3 like wc.go:54-56
    python -m go_mapreduce_spark.wc dataframe <file> [out_dir]
        — the same query DataFrame-first (the performant path)

Both write the reference's output format: a single globally
key-sorted ``word\\tcount`` TSV (mapreduce/mapreduce.go:260-263).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    if len(argv) < 3 or argv[1] not in ("sequential", "dataframe"):
        print(__doc__)
        return 2
    mode, path = argv[1], argv[2]
    out = argv[3] if len(argv) > 3 else path + ".wc_out"

    from go_mapreduce_spark.session import get_spark

    spark = get_spark(f"wc-{mode}")
    if mode == "sequential":
        from go_mapreduce_spark.mapreduce import word_count, write_merged_tsv

        write_merged_tsv(word_count(spark, path, n_map=5, n_reduce=3), out)
    else:
        from go_mapreduce_spark.functions.tokenize import word_counts
        from go_mapreduce_spark.sources.sinks import write_sorted_tsv

        df = word_counts(spark.read.text(path).withColumnRenamed("value", "text"))
        write_sorted_tsv(
            df.select(F.col("word"), F.col("cnt").cast("string")), out, ["word"],
            single_file=True,
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
