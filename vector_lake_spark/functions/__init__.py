from vector_lake_spark.functions import text, vectors  # noqa: F401
