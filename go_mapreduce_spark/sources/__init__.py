from go_mapreduce_spark.sources.registry import TABLES, load_table, load_tables, register_temp_views  # noqa: F401
