"""Structured Streaming operators (SURVEY.md §2.I)."""

from hortacloud_importer_spark.streaming.cascade import (  # noqa: F401
    MipmapCascade,
    streaming_cascade,
)
from hortacloud_importer_spark.streaming.windows import (  # noqa: F401
    idempotent_foreach_batch,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
