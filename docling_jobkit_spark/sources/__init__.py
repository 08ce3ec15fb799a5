from docling_jobkit_spark.sources.readers import (  # noqa: F401
    read_table,
    scan_binary_files,
    union_sources,
    pages_from_documents,
    JUNK_FILE_PATTERN,
)
