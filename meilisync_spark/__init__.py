"""meilisync_spark — a PySpark-native CDC/analytics engine.

Re-expresses the capabilities of the reference CDC pipeline
(long2ice/meilisync, see SURVEY.md) as an idiomatic Spark engine:

- batch snapshot sync (projection/rename + type normalization),
- CDC event normalization, pk compaction (last-wins) and MERGE-style
  apply into a keyed "index" table,
- consistency check and shadow-refresh-with-atomic-swap,
- a Structured Streaming shell wiring the same batch operators via
  ``foreachBatch`` + checkpointing,
- large-scale training-data extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal column plumbing.

Everything is DataFrame-first: operators are pure functions
``DataFrame -> DataFrame`` so Catalyst plans them (pushdown, pruning,
broadcast, AQE); Python stays out of the hot path.
"""

__version__ = "0.1.0"

from meilisync_spark.session import get_spark, tune  # noqa: F401
