from meilisync_spark.streaming.pipeline import run_cdc_pipeline, read_event_stream  # noqa: F401
