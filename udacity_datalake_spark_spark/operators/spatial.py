"""Grid-bucketed spatial self-join: all point pairs within Euclidean
distance ``d`` without forming points².

Same bucket-join family as MinHash bands (text) and IVF cells
(vectors): a uniform grid of pitch d turns radius search into an
equi-join on cell keys.  Each point gets one home cell; the probe side
explodes to its 3×3 neighborhood; any pair within d shares a
neighborhood cell, and because home cells are unique per point each
unordered pair is produced EXACTLY once (probe a covers b's home cell;
the a_id < b_id filter kills the mirror match) — no dedup pass.

At 100 TB: cell population is bounded by point density (pitch = search
radius), the only shuffle is keyed by cell, and hot cells (urban cores)
fall out of AQE skew splitting.  Used by q218; property-tested against
the brute-force quadratic join in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_self_join(pts: DataFrame, d: int) -> DataFrame:
    """All pairs (a_id < b_id) of ``pts`` (columns id, x, y — integer
    coordinates) with squared Euclidean distance ≤ d².  Returns columns
    ``a_id, b_id, d2`` (exact integer squared distance)."""
    home = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / d).alias("cx"),
        F.floor(F.col("y") / d).alias("cy"),
    )
    offsets = F.array([F.lit(o) for o in (-1, 0, 1)])
    probe = (
        home.withColumn("ox", F.explode(offsets))
        .withColumn("oy", F.explode(offsets))
        .select(
            F.col("id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay"),
            (F.col("cx") + F.col("ox")).alias("cx"),
            (F.col("cy") + F.col("oy")).alias("cy"),
        )
    )
    cand = probe.join(home, ["cx", "cy"]).where(F.col("a_id") < F.col("id"))
    dx, dy = F.col("ax") - F.col("x"), F.col("ay") - F.col("y")
    d2 = dx * dx + dy * dy
    return (
        cand.withColumn("d2", d2)
        .where(F.col("d2") <= d * d)
        .select("a_id", F.col("id").alias("b_id"), "d2")
    )
