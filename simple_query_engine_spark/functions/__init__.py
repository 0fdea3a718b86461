from simple_query_engine_spark.functions.joins import salted_join

__all__ = ["salted_join"]
