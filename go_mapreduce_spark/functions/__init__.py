from go_mapreduce_spark.functions.tokenize import tokens, word_counts  # noqa: F401
from go_mapreduce_spark.functions.numeric import dsum, dsum_expr, davg  # noqa: F401
from go_mapreduce_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
