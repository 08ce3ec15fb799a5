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
    explode_slices,
    reassemble_slices,
    extract_documents_sliced,
)
