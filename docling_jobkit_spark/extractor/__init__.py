from docling_jobkit_spark.extractor.extract import (  # noqa: F401
    ExtractResult,
    Span,
    extract,
    extract_page_range,
    split_pages,
    PAGE_BREAK,
    PAGE_JOIN,
)
from docling_jobkit_spark.extractor.errors import (  # noqa: F401
    FailureInfo,
    classify_failure,
)
