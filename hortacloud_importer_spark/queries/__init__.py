"""Query modules — importing this package populates the registry."""

from hortacloud_importer_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    dedup,
    filters,
    flagship,
    functions,
    joins,
    multimodal,
    scans,
    sets,
    similarity,
    sinks,
    sql_surface,
    streaming_duals,
    streaming_live,
    text,
    volume,
    windows,
)
