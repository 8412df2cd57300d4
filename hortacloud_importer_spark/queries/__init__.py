"""Query modules — importing this package populates the registry."""

from hortacloud_importer_spark.queries import flagship  # noqa: F401
