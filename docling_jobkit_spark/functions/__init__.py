from docling_jobkit_spark.functions.scalar import (  # noqa: F401
    url_hash_key,
    stable_hash64,
    token_count,
    tokens,
    normalized_text,
    fingerprint,
)
