from vector_lake_spark.sources.tables import (  # noqa: F401
    TABLES,
    clear_table_metadata_cache,
    load_events,
    load_table,
    normalize_event_ts,
    register_views,
    table_rows,
    table_schema,
)
