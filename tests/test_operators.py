"""Unit tests for composite operators on synthetic frames: the OR-join
decomposition (incl. the reference's golden null-artist case) and the
as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.joins import asof_join, left_join_or


def test_left_join_or_equals_direct_or_join(spark):
    left = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "y")],
        ["lid", "lname", "lloc"],
    )
    right = spark.createDataFrame(
        [(10, "a", "y"), (11, "q", "y"), (12, "c", "w"), (13, None, "v")],
        ["rid", "rname", "rloc"],
    )
    cond1 = F.col("lname") == F.col("rname")
    cond2 = F.col("lloc") == F.col("rloc")
    direct = left.join(right, cond1 | cond2, "left")  # the BNLJ plan
    rewritten = left_join_or(left, right, cond1, cond2)
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, rewritten.collect())) == sorted(map(key, direct.collect()))


def test_left_join_or_keeps_unmatched_with_nulls(spark):
    # the reference's golden case: 3 of 4 songplays rows end with
    # artist_id = null because neither name nor location matched
    left = spark.createDataFrame([(1, "nomatch", "nowhere")], ["lid", "lname", "lloc"])
    right = spark.createDataFrame([(10, "a", "y")], ["rid", "rname", "rloc"])
    out = left_join_or(
        left, right, F.col("lname") == F.col("rname"), F.col("lloc") == F.col("rloc")
    ).collect()
    assert len(out) == 1 and out[0].rid is None


def test_left_join_or_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    try:
        left_join_or(df, df, F.lit(True), F.lit(True))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        ["sym", "t", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", 5, 99.0), ("A", 15, 100.5), ("A", 20, 100.9), ("B", 20, 49.0)],
        ["sym", "qt", "bid"],
    )
    out = {
        (r.sym, r.t): r.bid
        for r in asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt").collect()
    }
    assert out[("A", 10)] == 99.0      # latest quote at/before t=10
    assert out[("A", 20)] == 100.9     # equal-timestamp quote counts (<=)
    assert out[("B", 15)] is None      # no quote yet
