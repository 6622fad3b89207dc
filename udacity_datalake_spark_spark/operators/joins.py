"""Composite join operators.

``left_join_or`` is the scale-safe rewrite of the reference's J2
(reference etl.py:147-151): a LEFT JOIN whose predicate is an OR of two
equi-conditions.  Spark must execute that predicate as a
BroadcastNestedLoopJoin — O(n·m) and a guaranteed 100 TB failure.  The
rewrite decomposes it into hash-joinable pieces with identical semantics
(proven against the direct OR-join oracle in the driver's correctness gate
and tests/test_operators.py):

    matched₁   = left ⋈ right ON cond1                      (hash join)
    matched₂   = left ⋈ right ON cond2 AND NOT cond1        (hash join)
    unmatched  = left ▷ cond1 ▷ cond2 (two anti joins)      (hash joins)
    result     = matched₁ ∪ matched₂ ∪ unmatched(nulls)

Every (left,right) pair satisfying cond1 OR cond2 appears exactly once:
matched₁ takes pairs where cond1 holds, matched₂ pairs where only cond2
holds (NULL cond1 coalesced to false), and the double anti-join keeps left
rows with no partner under either condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from udacity_datalake_spark_spark.scratch import spersist


def left_join_or(left: DataFrame, right: DataFrame, cond1: Column, cond2: Column) -> DataFrame:
    """Semantics of ``left.join(right, cond1 | cond2, 'left')`` without the
    nested-loop join.  ``left`` and ``right`` must have disjoint column
    names (as in the reference pipeline post-aliasing)."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column names must be disjoint, got overlap: {overlap}")

    not_cond1 = ~F.coalesce(cond1, F.lit(False))
    matched1 = left.join(right, cond1, "inner")
    matched2 = left.join(right, cond2 & not_cond1, "inner")
    unmatched = left.join(right, cond1, "left_anti").join(right, cond2, "left_anti")
    return matched1.unionByName(matched2).unionByName(unmatched, allowMissingColumns=True)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right row
    with ``right_ts <= left_ts`` within the same ``on`` key group.

    Single-shuffle union+window implementation (no range-explosion
    cross join): tag both sides, sort by (key, ts, side) and carry the
    last-seen right payload forward with ``last(..., ignorenulls=True)``.
    Scales as one Exchange + one in-partition sort.
    """
    payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    combined = lhs.unionByName(rhs, allowMissingColumns=True)

    from pyspark.sql.window import Window

    # right rows (__side=0) sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload_cols:
        combined = combined.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return combined.where(F.col("__side") == 1).drop("__side", "__ts", right_ts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: identical semantics to
    ``fact.join(dim, key, how)`` but a hot key's rows spread over
    ``n_salt`` shuffle partitions instead of landing on one straggler task.

    The fact side gets a deterministic salt derived from its full row hash;
    the dim side is replicated n_salt× (explode of a literal range), so
    every (key, salt) pair finds its dim partner.  Use when a key holds
    >~1 GB of fact rows and AQE's skew split isn't available (e.g., the
    join feeds a co-partitioned downstream op).  Cost: dim shuffle volume
    ×n_salt — keep for genuinely skewed fact⋈dim joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    fact_cols = [c for c in fact.columns if c != key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn("__salt", F.explode(F.array([F.lit(i) for i in range(n_salt)])))
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def hot_key_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    sample_fraction: float = 0.01,
    hot_fraction: float = 0.001,
    seed: int = 42,
) -> DataFrame:
    """Skew join that salts ONLY detected hot keys — the production form
    of ``salted_join``.

    ``salted_join`` replicates the whole dim ``n_salt``× and re-hashes
    every fact row; fine when most keys are hot, wasteful when (as in
    real skew) a handful of keys hold most rows.  This variant:

    1. samples the fact side (one cheap scan, no shuffle — sampling is a
       per-partition filter) and collects keys above ``hot_fraction`` of
       the sampled rows — by construction ≤ 1/hot_fraction keys, so the
       collected set is always driver/broadcast-safe;
    2. joins cold fact rows against the dim untouched (plain hash join,
       AQE free to broadcast);
    3. salts only hot fact rows, replicating only the ≤1/hot_fraction
       matching dim rows ``n_salt``×;
    4. unions the two results — exactly the rows of
       ``fact.join(dim, key, how)`` (property-tested).

    Use over AQE skew-split when the join output must stay co-partitioned
    for a downstream op, or when one key exceeds a single task's memory
    even after AQE's split (AQE splits a partition, not a key).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_salted_join supports inner/left, got {how!r}")
    sampled = fact.select(key).sample(fraction=sample_fraction, seed=seed)
    # persist the (tiny) per-key sample counts: the threshold needs the
    # sampled TOTAL before the hot list can be filtered, i.e. two actions
    # — without the persist each action re-scans and re-shuffles the fact
    # sample, doubling detection cost (round-5 BENCH drift bisect: the
    # double pass was the dominant q109 term)
    counts = sampled.groupBy(key).agg(F.count(F.lit(1)).alias("__n")).transform(spersist)
    total = counts.agg(F.sum("__n")).first()[0] or 0
    hot = [
        r[key]
        for r in counts.where(F.col("__n") >= F.lit(max(1.0, total * hot_fraction))).collect()
    ]
    counts.unpersist()
    if not hot:
        return fact.join(dim, key, how)

    is_hot = F.col(key).isin(hot)
    cold = fact.where(~is_hot | F.col(key).isNull()).join(dim, key, how)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    f_hot = fact.where(is_hot).withColumn("__salt", salt)
    d_hot = dim.where(F.col(key).isin(hot)).withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    hot_joined = f_hot.join(d_hot, [key, "__salt"], how).drop("__salt")
    return cold.unionByName(hot_joined)


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 5000.0,
) -> DataFrame:
    """Range join fact.value ∈ [band.lo, band.hi) as an equi-join.

    A naive non-equi range join plans as BroadcastNestedLoopJoin — O(n·m)
    and only viable while the band table is broadcast-small.  This rewrite
    buckets the value axis: each band explodes into the fixed-width
    buckets it overlaps, the fact side computes its single bucket, and the
    join runs as a hash equi-join on bucket with the exact range predicate
    as a residual filter.  Scales to arbitrarily many bands/fact rows with
    one shuffle.  Bands may overlap (a fact row then matches every
    covering band, same as the naive join).
    """
    b = F.floor(F.col(value_col) / F.lit(bucket_width))
    f = fact.withColumn("__bucket", b.cast("long"))
    exploded = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket edge
                # does not overlap the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)
                ).cast("long"),
            )
        ),
    )
    return (
        f.join(exploded, "__bucket", "inner")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Event-to-event interval join: pairs where the right event lands in
    ``[left_ts, left_ts + upper]`` for the same key.  Column names on the
    two sides must be disjoint (rename before calling) — that keeps the
    self-join unambiguous in both batch and streaming mode.

    On streaming inputs this is Spark's watermarked stream-stream join:
    the time-range condition bounds each side's state to the watermark
    horizon, so state is reclaimed instead of growing without bound —
    the property that makes the join runnable on an unbounded 100 TB/day
    stream.  On batch inputs the same condition plans as an equi-join on
    the key with the range as a residual filter (never a nested loop).
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)
