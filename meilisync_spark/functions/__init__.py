from meilisync_spark.functions.hashing import portable_hash64, duck_hash64  # noqa: F401
from meilisync_spark.functions.vectors import dot_product, l2_norm, cosine  # noqa: F401
