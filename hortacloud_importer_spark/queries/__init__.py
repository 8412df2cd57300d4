"""Query modules — importing this package populates the registry."""

from hortacloud_importer_spark.queries import (  # noqa: F401
    aggregates,
    filters,
    flagship,
    functions,
    joins,
    scans,
    sets,
    streaming_duals,
    windows,
)
