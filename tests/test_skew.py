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
    """Every salt value actually receives rows of the hot key — the
    hot key's rows leave on n_salts distinct shuffle keys, which is
    the whole point of the transform."""
    ev, dim = _skewed_frames(spark, SF_SMOKE)
    n_salts = 8
    salt = ev.select(
        (
            F.conv(
                F.substring(
                    F.sha2(F.concat(F.lit("salt:"), F.col("event_id").cast("string")), 256),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % n_salts
        ).alias("salt")
    ).where(F.lit(True))
    n_distinct = salt.distinct().count()
    assert n_distinct == n_salts


def test_salted_join_rejects_unsupported_how(spark):
    ev, dim = _skewed_frames(spark, SF_SMOKE)
    try:
        salted_join(ev, dim, key="user_id", row_col="event_id", how="full")
        assert False, "expected ValueError"
    except ValueError:
        pass
