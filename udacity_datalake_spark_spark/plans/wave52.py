"""Wave 52: incremental near-dup probing (new batch vs a prebuilt LSH
index), a GDPR-style erasure cascade audit, and quality-based canonical
selection over near-dup clusters — with the connected-components step
oracle-checked against a recursive-CTE SQL twin.

Reference parity note: the reference (etl.py, /root/reference) has no
dedup or governance surface; these extend q46/q182 (LSH / incremental
dedup), q157 (referential integrity) and q95 (dedup pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.dedup import (
    incremental_lsh_probe,
    ngram_jaccard_pairs,
)
from udacity_datalake_spark_spark.operators.graph import connected_components
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: Shared CTE fragment: exact 3-gram shingle Jaccard edges ≥ 0.6 over
#: documents (same pair rule as textops._JACCARD_ORACLE, named to avoid
#: CTE collisions per the engine convention).
_NEARDUP_EDGES_SQL = """
    nd_t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    nd_sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                         i -> array_to_string(arr[i:i+2], ' ')))) AS shingle
           FROM nd_t WHERE len(arr) >= 3),
    nd_sz AS (SELECT doc_id, count(*) AS sz FROM nd_sh GROUP BY doc_id),
    nd_pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
              FROM nd_sh a JOIN nd_sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    nd_edges AS (
        SELECT p.d1, p.d2,
               CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) AS jaccard
        FROM nd_pr p
        JOIN nd_sz sa ON p.d1 = sa.doc_id
        JOIN nd_sz sb ON p.d2 = sb.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.6
    )
"""


@query(
    "q325_incremental_lsh_probe",
    oracle=f"""
    WITH {_NEARDUP_EDGES_SQL}
    SELECT CASE WHEN d1 % 10 = 7 THEN d1 ELSE d2 END AS new_id,
           CASE WHEN d1 % 10 = 7 THEN d2 ELSE d1 END AS base_id,
           jaccard
    FROM nd_edges
    WHERE (d1 % 10 = 7) <> (d2 % 10 = 7)
    """,
)
def q325_incremental_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingest: the 'tonight's batch' (doc_id % 10 =
    7) probes the base corpus's MinHash-LSH band index — only new×base
    band collisions become candidates (never base×base: the base index
    is prebuilt and static), verified with the exact-Jaccard array
    kernel.  The oracle is the exact cross-split pair computation;
    banding recall at 32 bands × 4 rows is ≈1 for the corpus's planted
    J≈0.98 pairs, so outputs coincide (q46's argument, restricted to
    the cut).

    Scale shape: per nightly batch the engine signs/bands ONLY the new
    documents and joins the (bucketed, materialized) base band table —
    work is O(|new| + collisions), independent of corpus size.  q182 is
    the exact-fingerprint incremental twin."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    new = d.where(F.col("doc_id") % 10 == 7)
    base = d.where(F.col("doc_id") % 10 != 7)
    return incremental_lsh_probe(base, new, "doc_id", "text", n=3, threshold=0.6)


@query(
    "q326_erasure_audit",
    oracle="""
    WITH erase_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
    erase_o AS (
        SELECT o_orderkey FROM orders o
        JOIN erase_c e ON e.c_custkey = o.o_custkey
    ),
    stats AS (
        SELECT 'customer' AS table_name,
               (SELECT count(*) FROM customer) AS n_rows,
               (SELECT count(*) FROM erase_c) AS n_erased
        UNION ALL
        SELECT 'orders',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM erase_o)
        UNION ALL
        SELECT 'lineitem',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l
                JOIN erase_o e ON e.o_orderkey = l.l_orderkey)
    )
    SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_erased AS BIGINT) AS n_erased,
           CAST(n_rows - n_erased AS BIGINT) AS n_remaining,
           TRUE AS no_orphans_after
    FROM stats
    """,
)
def q326_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style erasure cascade audit: deleting the flagged customers
    (c_custkey % 101 = 0 stands in for the deletion-request list) must
    cascade through orders to lineitems; the report prices the cascade
    per table and PROVES referential closure — after the simulated
    delete, no remaining order references an erased customer and no
    remaining lineitem references an erased order (computed for real,
    oracle expects TRUE).

    Scale shape: the deletion list is dimension-sized (broadcast
    semi/anti joins); each fact table is scanned once; at 100 TB this
    is exactly the anti-join + rewrite job an erasure pipeline runs,
    and the orphan check is the post-delete validation gate."""
    c = read_table(spark, sf_dir, "customer", columns=["c_custkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    erase_c = c.where(F.col("c_custkey") % 101 == 0)
    erase_o = o.join(
        F.broadcast(erase_c), o.o_custkey == erase_c.c_custkey
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    remaining_o = o.join(
        F.broadcast(erase_c), o.o_custkey == erase_c.c_custkey, "left_anti"
    )
    remaining_li = li.join(F.broadcast(erase_o), "l_orderkey", "left_anti")
    orphan_o = remaining_o.join(
        F.broadcast(erase_c), remaining_o.o_custkey == erase_c.c_custkey
    ).count()
    orphan_li = remaining_li.join(F.broadcast(erase_o), "l_orderkey").count()
    no_orphans = orphan_o == 0 and orphan_li == 0

    def row(name: str, total: DataFrame, erased: DataFrame) -> DataFrame:
        return total.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            F.broadcast(erased.agg(F.count(F.lit(1)).alias("n_erased")))
        ).select(
            F.lit(name).alias("table_name"),
            F.col("n_rows").cast("long"),
            F.col("n_erased").cast("long"),
            (F.col("n_rows") - F.col("n_erased")).cast("long").alias("n_remaining"),
            F.lit(no_orphans).alias("no_orphans_after"),
        )

    erased_li = li.join(F.broadcast(erase_o), "l_orderkey")
    return (
        row("customer", c, erase_c)
        .unionByName(row("orders", o, erase_o))
        .unionByName(row("lineitem", li, erased_li))
    )


@query(
    "q327_canonical_selection",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_EDGES_SQL},
    und AS (SELECT d1 AS a, d2 AS b FROM nd_edges
            UNION ALL SELECT d2, d1 FROM nd_edges),
    nodes AS (SELECT DISTINCT a AS n FROM und),
    reach(node, label) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    members AS (
        SELECT c.component, c.node AS doc_id, d.n_chars,
               row_number() OVER (
                   PARTITION BY c.component
                   ORDER BY d.n_chars DESC, c.node) AS rk
        FROM comp c JOIN documents d ON d.doc_id = c.node
    )
    SELECT component,
           CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS canonical_id,
           count(*) AS n_members,
           CAST(sum(doc_id) AS BIGINT) AS member_id_sum,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS dropped_chars
    FROM members
    GROUP BY component
    """,
)
def q327_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based canonical selection over near-dup clusters: exact
    Jaccard pairs cluster via connected components, and each cluster
    keeps its LONGEST member (ties → smallest doc_id) instead of q95's
    min-id policy — the curation variant that preserves the most
    content per duplicate group.  The oracle derives the SAME
    components with a recursive-CTE min-label closure, so the
    distributed CC operator is value-checked against plain SQL here —
    not just against its own property tests.

    Scale shape: pair generation is the prefix-filtered exact path
    (q45); CC takes the union-find fast path at this edge count and the
    MR-CC rounds above it; canonical choice is one window over
    cluster-sized partitions."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    comp = connected_components(pairs, src="d1", dst="d2")
    members = comp.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.col("n_chars").desc(), F.col("node")
            )
        ),
    )
    return members.groupBy("component").agg(
        F.max(F.when(F.col("rk") == 1, F.col("node"))).cast("long").alias(
            "canonical_id"
        ),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("node").cast("long").alias("member_id_sum"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("dropped_chars"),
    )
