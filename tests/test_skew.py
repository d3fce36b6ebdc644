"""Salted-join skew mitigation: semantics equal the plain join; the
physical plan actually spreads a hot key over n_salts shuffle keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from meilisync_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE


def _skewed_frames(spark, sf_dir):
    # events keyed by user_id are naturally skewed; make it extreme by
    # folding 90% of keys onto one hot key
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("user_id") % 10 != 0, F.lit(7)).otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_id",
        "value",
    )
    dim = (
        spark.range(0, 200)
        .select(F.col("id").alias("user_id"), (F.col("id") * 3).alias("tier"))
    )
    return ev, dim


def test_salted_join_equals_plain_inner(spark):
    ev, dim = _skewed_frames(spark, SF_SMOKE)
    plain = ev.join(dim, "user_id").select("user_id", "event_id", "value", "tier")
    salted = salted_join(ev, dim, key="user_id", row_col="event_id")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_equals_plain_left(spark):
    ev, dim = _skewed_frames(spark, SF_SMOKE)
    dim_half = dim.where(F.col("user_id") % 2 == 0)
    plain = ev.join(dim_half, "user_id", "left").select(
        "user_id", "event_id", "value", "tier"
    )
    salted = salted_join(ev, dim_half, key="user_id", row_col="event_id", how="left")
    assert sorted(
        map(tuple, plain.fillna({"tier": -1}).collect())
    ) == sorted(map(tuple, salted.fillna({"tier": -1}).collect()))


def test_salted_join_spreads_hot_key(spark):
    """The join actually runs on (key, __salt) — asserted on the
    physical plan — and the hot key's rows land on all n_salts salt
    values (recomputed with the shared portable hash, not a copy)."""
    from meilisync_spark.functions.hashing import portable_hash64

    ev, dim = _skewed_frames(spark, SF_SMOKE)
    n_salts = 8
    j = salted_join(ev, dim, key="user_id", row_col="event_id", n_salts=n_salts)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the salt IS a join key, not a dropped col
    hot = ev.where(F.col("user_id") == 7).select(
        (
            portable_hash64(F.concat(F.lit("salt:"), F.col("event_id").cast("string")))
            % n_salts
        ).alias("salt")
    )
    assert hot.distinct().count() == n_salts


def test_salted_join_null_row_col_keeps_rows(spark):
    """A NULL row_col must not lose the row (salt parks at 0)."""
    big = spark.createDataFrame(
        [(7, None), (7, 1), (3, 2)], "user_id long, event_id long"
    )
    dim = spark.createDataFrame([(7, 70), (3, 30)], "user_id long, tier long")
    key = lambda r: (r[0], r[1] if r[1] is not None else -1, r[2])
    plain = sorted(map(tuple, big.join(dim, "user_id").collect()), key=key)
    salted = sorted(
        map(tuple, salted_join(big, dim, key="user_id", row_col="event_id").collect()),
        key=key,
    )
    assert plain == salted and len(salted) == 3


def test_salted_join_rejects_unsupported_how(spark):
    ev, dim = _skewed_frames(spark, SF_SMOKE)
    try:
        salted_join(ev, dim, key="user_id", row_col="event_id", how="full")
        assert False, "expected ValueError"
    except ValueError:
        pass
