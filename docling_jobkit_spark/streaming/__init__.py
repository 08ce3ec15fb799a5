from docling_jobkit_spark.streaming.pipeline import (  # noqa: F401
    stream_extract,
    start_file_stream,
    stream_dedup_exact,
    stream_dedup_fuzzy,
    stream_hll_distinct,
    stream_hourly_rollup,
    stream_logh_quantiles,
    stream_cms_counts,
    stream_ingest,
    read_hll_state,
    read_logh_state,
    read_cms_state,
)
from docling_jobkit_spark.streaming.stateful import (  # noqa: F401
    stream_sessions,
    batch_sessions,
)
