from mit_map_reduce_spark.streaming import queries  # noqa: F401
