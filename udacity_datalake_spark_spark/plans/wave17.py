"""Wave 17: grid-bucketed spatial self-join, multivariate OLS via normal
equations, and inter-rater agreement (Cohen's kappa) — three families
the surface lacked: 2-D proximity search, multi-feature regression, and
labeler-agreement auditing (the quality-control step when two annotation
rules or model versions disagree on the same corpus).

The spatial join is the wave's scale pattern: like MinHash bands for
text or IVF cells for vectors, a 2-D grid turns "all pairs within
distance d" into an equi-join on cell keys (9-cell neighborhood), with
the exact distance check running on candidates only — never points².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.numeric import dec
from udacity_datalake_spark_spark.operators.spatial import grid_radius_self_join
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

# Deterministic synthetic coordinates: micro-unit ints in [0, 1e6) from
# multiplicative hashing of the customer key — identical pure-integer
# arithmetic in both engines (the q80/q101 trick), no RNG.
_XMULT, _YMULT, _YOFF, _UNIT = 2654435761, 1500450271, 784923, 1_000_000
_CELL = 50_000  # grid pitch = distance threshold → 9-cell neighborhood
_D2 = _CELL * _CELL  # squared threshold, exact int64


@query(
    "q218_grid_spatial_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               CAST((CAST(c_custkey AS HUGEINT) * {_XMULT}) % {_UNIT} AS BIGINT) AS x,
               CAST(((CAST(c_custkey AS HUGEINT) + {_YOFF}) * {_YMULT}) % {_UNIT} AS BIGINT) AS y
        FROM customer
    )
    SELECT count(*) AS n_pairs,
           CAST(sum((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                AS BIGINT) AS sum_sq_dist
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_D2}
    """,
)
def q218_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within Euclidean distance d in a synthetic 2-D
    layout (deterministic hash coordinates) — the proximity self-join
    behind store-siting, delivery clustering, and geo dedup.

    The engine side never forms points²: each point lands in one grid
    cell of pitch d, the left side explodes to its 3×3 neighborhood, and
    candidates come from an EQUI-join of neighborhood keys against home
    cells — any pair within d shares a neighborhood, and since home
    cells are unique per point each pair is matched exactly once (no
    dedup pass).  The exact integer distance check then filters
    candidates.  At 100 TB this is the standard spatial-bin play: cell
    population is bounded by density, the shuffle is keyed by cell, and
    skewed hot cells fall out of AQE skew splitting.  The oracle is the
    brute-force O(n²) DuckDB twin — feasible at the check SF, which is
    exactly why the candidate structure is the engine's job, not the
    oracle's."""
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey"])
    # Widen to DECIMAL(38,0) before the multiply: c_custkey * _XMULT exceeds
    # int64 once c_custkey ≳ 3.5e9 (SF ≳ 23k) — Spark would wrap silently
    # while the DuckDB oracle (HUGEINT) errors.  The % _UNIT result is < 1e6
    # so the cast back to BIGINT is always exact.
    wide = F.col("c_custkey").cast("decimal(38,0)")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((wide * _XMULT) % _UNIT).cast("bigint").alias("x"),
        (((wide + _YOFF) * _YMULT) % _UNIT).cast("bigint").alias("y"),
    )
    pairs = grid_radius_self_join(pts, _CELL)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("d2").alias("sum_sq_dist")
    )


@query(
    "q219_ols_two_feature",
    oracle="""
    WITH s AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem
    ),
    d AS (
        SELECT *,
               n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det
        FROM s
    )
    SELECT n,
           round((sy * (s11 * s22 - s12 * s12)
                  - s1 * (s1y * s22 - s12 * s2y)
                  + s2 * (s1y * s12 - s11 * s2y)) / det, 6) AS intercept,
           round((n * (s1y * s22 - s12 * s2y)
                  - sy * (s1 * s22 - s12 * s2)
                  + s2 * (s1 * s2y - s1y * s2)) / det, 6) AS beta_qty,
           round((n * (s11 * s2y - s1y * s12)
                  - s1 * (s1 * s2y - s1y * s2)
                  + sy * (s1 * s12 - s11 * s2)) / det, 6) AS beta_disc,
           round(1 - (syy
                      - ((sy * (s11 * s22 - s12 * s12)
                          - s1 * (s1y * s22 - s12 * s2y)
                          + s2 * (s1y * s12 - s11 * s2y)) / det) * sy
                      - ((n * (s1y * s22 - s12 * s2y)
                          - sy * (s1 * s22 - s12 * s2)
                          + s2 * (s1 * s2y - s1y * s2)) / det) * s1y
                      - ((n * (s11 * s2y - s1y * s12)
                          - s1 * (s1 * s2y - s1y * s2)
                          + sy * (s1 * s12 - s11 * s2)) / det) * s2y)
                     / (syy - sy * sy / n), 6) AS r_squared
    FROM d
    """,
)
def q219_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (extendedprice ~ quantity + discount) solved by
    Cramer's rule on the 3×3 normal equations — multivariate regression
    as ONE distributed aggregate, no iterative solver, no driver matrix
    library.

    q128/q171's discipline at higher rank: the ten power sums accumulate
    in DECIMAL (associative, bit-stable under any partitioning), and the
    determinant closed form evaluates once in double with expression
    structure mirrored verbatim in the oracle, so the doubles are
    IEEE-identical.  At 100 TB this stays a single map-side-combined
    pass; rank-k regression grows the sums quadratically in features,
    not in rows."""
    li = read_table(
        spark, sf_dir, "lineitem", columns=["l_quantity", "l_discount", "l_extendedprice"]
    )
    x1, x2, y = dec("l_quantity"), dec("l_discount"), dec("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        F.sum(x2 * x2).cast("double").alias("s22"),
        F.sum(x1 * x2).cast("double").alias("s12"),
        F.sum(x1 * y).cast("double").alias("s1y"),
        F.sum(x2 * y).cast("double").alias("s2y"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    ) / det
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    return s.select(
        "n",
        F.round(b0, 6).alias("intercept"),
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(1 - sse / sst, 6).alias("r_squared"),
    )


@query(
    "q220_cohens_kappa",
    oracle="""
    WITH rated AS (
        SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    m AS (
        SELECT count(*) AS n,
               CAST(sum(a * b) AS BIGINT) AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
               CAST(sum((1 - a) * b) AS BIGINT) AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM rated
    )
    SELECT n, n11, n10, n01, n00,
           round((n11 + n00) / CAST(n AS DOUBLE), 6) AS observed_agreement,
           round(((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                   + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                  / n) / n, 6) AS expected_agreement,
           round(((n11 + n00) / CAST(n AS DOUBLE)
                  - ((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                      + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n) / n)
                 / (1 - ((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                          + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n) / n),
                 6) AS kappa
    FROM m
    """,
)
def q220_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two document-quality raters (a char-length
    rule vs a token-count rule): chance-corrected agreement — the
    standard audit when two labeling heuristics, annotators, or model
    versions judge the same corpus and raw agreement overstates
    consensus.

    The 2×2 confusion matrix is one exact integer aggregate over the
    corpus (both rater bits evaluate in codegen); p_o, p_e, and kappa
    derive from the four counts in identically-structured double
    expressions on both engines."""
    d = read_table(spark, sf_dir, "documents", columns=["n_chars", "text"])
    rated = d.select(
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) >= 50, 1).otherwise(0).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    m = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).alias("n11"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")) / n.cast("double")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / n / n
    return m.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )
