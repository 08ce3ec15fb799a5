"""docling_jobkit_spark — a PySpark-native document-extraction engine.

A from-scratch rebuild of the capabilities of docling-project/docling-jobkit
(reference surveyed in /root/repo/SURVEY.md) on Apache Spark:

- the job/queue orchestration layer (asyncio / mp.Pool / Ray+Redis in the
  reference) is replaced by Spark's scheduler;
- the per-document conversion map (``convert/manager.py`` in the reference)
  is re-expressed as an Arrow-batched ``mapInPandas`` operator over a table
  of ``(url, warc_ts, html, text, lang)`` rows;
- durable exactly-once result state (``ray/redis_helper.py:950-1078``) is
  re-expressed as an atomic parquet-manifest commit + anti-join resume.

Everything here derives from public knowledge only: the PySpark API and the
reference repo's observable behavior.
"""

__version__ = "0.1.0"

from docling_jobkit_spark.session import get_spark  # noqa: F401
