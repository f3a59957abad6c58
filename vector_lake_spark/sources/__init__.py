from vector_lake_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_events,
    load_table,
    register_views,
)
