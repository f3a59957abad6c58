from vector_lake_spark.streaming.events import (  # noqa: F401
    stream_sessionize,
    stream_tumbling_agg,
)
