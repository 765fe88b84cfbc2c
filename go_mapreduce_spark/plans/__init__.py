from go_mapreduce_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)
