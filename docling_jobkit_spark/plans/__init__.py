from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig  # noqa: F401
