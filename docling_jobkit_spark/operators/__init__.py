from docling_jobkit_spark.operators.extract_op import (  # noqa: F401
    RESULT_SCHEMA,
    extract_documents,
)
from docling_jobkit_spark.operators.admission import admission_split  # noqa: F401
from docling_jobkit_spark.operators.partitioning import (  # noqa: F401
    with_url_bucket,
    salted_repartition,
)
from docling_jobkit_spark.operators.slices import (  # noqa: F401
    split_slices,
    reassemble_slices,
    extract_documents_sliced,
)
from docling_jobkit_spark.operators.chunker import (  # noqa: F401
    chunk_documents,
    char_chunks,
)
from docling_jobkit_spark.operators.dedup import (  # noqa: F401
    exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
    with_minhash,
    with_simhash,
)
from docling_jobkit_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    ann_topk,
)
from docling_jobkit_spark.operators.textstats import (  # noqa: F401
    lang_id,
    quality_features,
    with_fingerprint,
    with_lang_id,
)
from docling_jobkit_spark.operators.multimodal import (  # noqa: F401
    extract_media_metadata,
    media_metadata_relational,
)
