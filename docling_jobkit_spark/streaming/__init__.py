from docling_jobkit_spark.streaming.pipeline import (  # noqa: F401
    stream_extract,
    start_file_stream,
    stream_dedup_exact,
    stream_dedup_fuzzy,
    stream_hourly_rollup,
)
from docling_jobkit_spark.streaming.stateful import (  # noqa: F401
    stream_sessions,
    batch_sessions,
)
