"""Wave 78: tokenizer training, graph core decomposition, and basket
rules — three classics the surface did not yet cover: distributed BPE
merge-table training (Sennrich et al. 2016, the tokenizer-training step
of every LLM data pipeline), bounded-round k-core peeling (Seidman
1983; the dense-subgraph screen), and association-rule mining
(confidence/lift over the q373 frequent-pair machinery).

Reference parity note: the reference (/root/reference/etl.py) has no
mining surface; these extend the text family (q59 BPE estimate, q363
Heaps), the graph family (q212/q217/q319/q390/q404), and basket mining
(q209/q373).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_EDGES_SQL,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist

BPE_ROUNDS = 6
KCORE_K = 4
KCORE_ROUNDS = 8


def bpe_merge_table(
    words: DataFrame, rounds: int = BPE_ROUNDS
) -> list[tuple[int, str, str, int]]:
    """Train a BPE merge table over a ``(w, freq)`` word-frequency frame:
    per round, count adjacent symbol pairs weighted by word frequency,
    take the most frequent (count DESC, then lexicographic — a total
    order, so the table is deterministic), and merge it greedily
    left-to-right in every word.

    This is the CLASSIC scale trick of BPE training: after one corpus
    pass builds the word-frequency table, every merge round runs on the
    VOCABULARY (bounded by distinct words), never on the corpus — at
    100 TB the corpus is touched once and the iteration cost is
    O(vocab · rounds).  Each round is one exploded-pair aggregate plus a
    map-side fold; the chosen pair is ONE bounded driver scalar (the
    same contract as connected_components' convergence probe), and the
    vocabulary frame is localCheckpoint'ed per round so the lambda plan
    does not deepen (the q390 lesson).

    Symbols are pipe-joined ('c|h|a|r' → 'ch|a|r'), mirroring the
    DuckDB oracle's representation; corpus tokens are [a-z0-9]+ so '|'
    and '^' (the fold sentinel) never collide with data.
    """
    vocab = words.select(
        F.array_join(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
            "|",
        ).alias("syms"),
        F.col("freq"),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        # single-symbol words contribute no pairs — and MUST be dropped
        # before the transform: Spark's sequence(0, size-2) DESCENDS
        # ([0, -1]) when size is 1, indexing out of bounds under ANSI
        arr = vocab.select(F.split("syms", "[|]").alias("sl"), "freq").where(
            F.size("sl") >= 2
        )
        # materialize the split BEFORE the adjacent-pair lambda — an
        # inlined re-split is O(symbols²) per word (round-4 lesson)
        pairs = arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(sl) - 2),"
                    " i -> struct(sl[i] AS s1, sl[i+1] AS s2))"
                )
            ).alias("p"),
            "freq",
        ).select("p.s1", "p.s2", "freq")
        top = (
            pairs.groupBy("s1", "s2")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), "s1", "s2")
            .first()
        )
        if top is None:
            break
        s1, s2, c = top.s1, top.s2, int(top.c)
        merges.append((r, s1, s2, c))
        l1 = len(s1)
        # greedy left-to-right merge as a string fold with a '^'
        # sentinel; the suffix compare is length-anchored (no LIKE
        # metacharacter hazards), identical to the oracle's list_reduce
        merged = F.aggregate(
            F.split("syms", "[|]"),
            F.lit("^"),
            lambda acc, x: F.when(
                acc.endswith(F.lit("|" + s1)) & (x == F.lit(s2)),
                F.concat(
                    acc.substr(F.lit(1), F.length(acc) - F.lit(l1 + 1)),
                    F.lit("|" + s1 + s2),
                ),
            ).otherwise(F.concat(acc, F.lit("|"), x)),
        )
        vocab = vocab.select(
            merged.substr(F.lit(3), F.length(merged) - F.lit(2)).alias("syms"),
            "freq",
        ).localCheckpoint()
    return merges


def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    ctes = [
        """
    w0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w
    ),
    v1 AS MATERIALIZED (
        SELECT array_to_string(
                   list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)),
                   '|') AS syms,
               freq
        FROM w0
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""
    p{r} AS (
        SELECT sl[i + 1] AS s1, sl[i + 2] AS s2, freq
        FROM (SELECT string_split(syms, '|') AS sl, freq,
                     unnest(range(len(string_split(syms, '|')) - 1)) AS i
              FROM v{r})
    ),
    m{r} AS MATERIALIZED (
        SELECT s1, s2, CAST(sum(freq) AS BIGINT) AS c
        FROM p{r} GROUP BY s1, s2
        ORDER BY c DESC, s1, s2 LIMIT 1
    ),
    v{r + 1} AS MATERIALIZED (
        SELECT substr(list_reduce(['^'] || string_split(syms, '|'),
                   (acc, x) -> CASE
                       WHEN substr(acc, len(acc) - len(s1)) = '|' || s1
                            AND x = s2
                       THEN substr(acc, 1, len(acc) - len(s1) - 1)
                            || '|' || s1 || s2
                       ELSE acc || '|' || x END), 3) AS syms,
               freq
        FROM v{r}, m{r}
    )"""
        )
    unions = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, s1 AS left_sym,"
        f" s2 AS right_sym, c AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH" + ",".join(ctes) + f"\n    SELECT * FROM ({unions}) ORDER BY rank"
    )


@query("q409_bpe_merge_training", oracle=_bpe_oracle())
def q409_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 6 BPE merges over the corpus's word-frequency
    table (see ``bpe_merge_table`` for the algorithm and the
    vocabulary-bounded 100 TB shape).  Output is the merge table itself
    — (rank, left_sym, right_sym, pair_count) — which downstream
    tokenization (q59's estimator family) would consume.  The DuckDB
    twin unrolls the same six rounds with the same total-order
    tie-break and the same greedy left-to-right fold, so the table is
    bit-exact across engines."""
    d = read_table(spark, sf_dir, "documents", columns=["text"])
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = bpe_merge_table(words, rounds=BPE_ROUNDS)
    return spark.createDataFrame(
        merges, "rank long, left_sym string, right_sym string, pair_count long"
    ).orderBy("rank")


def kcore(
    edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Synchronous k-core peel over an undirected (u < w) edge list:
    each round drops every node of degree < k and every edge touching a
    dropped node; ``rounds`` is FIXED (not converge-and-stop) so the
    DuckDB twin can unroll the identical schedule — on graphs where the
    peel converges earlier, the extra rounds are no-ops on both sides,
    and tests assert convergence within the budget.

    Scale shape: each round is one endpoint-grain aggregate plus two
    semi-joins against the (node-sized, shrinking) keeper set — the
    same per-round cost as one connected-components step; the edge
    frame localCheckpoints per round so lineage stays flat.  A round
    that removes no edge is a FIXPOINT (degrees, hence keepers, cannot
    change again), so the loop breaks early — the fixed-round oracle
    stays bit-identical because its extra unrolled rounds are no-ops
    past convergence, and the per-round edge count is one bounded
    scalar on the already-checkpointed frame.  Returns
    (node, core_degree) for the surviving subgraph."""
    e = edges.localCheckpoint()
    n_edges = e.count()
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("w").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        keep = deg.where(F.col("dg") >= k).select("x")
        e = (
            e.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "w"), "w", "left_semi")
            .select("u", "w")
            .localCheckpoint()
        )
        n_next = e.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    ctes = [f"e0 AS MATERIALIZED (SELECT u, w FROM edges)"]
    for r in range(rounds):
        ctes.append(
            f"""
    d{r} AS (SELECT x, count(*) AS dg
             FROM (SELECT u AS x FROM e{r} UNION ALL SELECT w FROM e{r})
             GROUP BY x),
    k{r} AS MATERIALIZED (SELECT x FROM d{r} WHERE dg >= {k}),
    e{r + 1} AS MATERIALIZED (
        SELECT u, w FROM e{r}
        WHERE u IN (SELECT x FROM k{r}) AND w IN (SELECT x FROM k{r}))"""
        )
    return f"""
    WITH {COSUPPLY_EDGES_SQL.strip().rstrip()},
    {",".join(ctes)}
    SELECT x AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT u AS x FROM e{rounds} UNION ALL SELECT w FROM e{rounds})
    GROUP BY x
    """


@query("q410_kcore_decomposition", oracle=_kcore_oracle())
def q410_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the supplier co-supply graph (the q212/q217 edge
    rule): the maximal subgraph where every supplier co-supplies with
    at least KCORE_K other core suppliers — the dense-collaboration
    screen (fraud rings, tight supplier cliques, community seeds) that
    plain degree filtering gets wrong because degrees must be
    recomputed INSIDE the surviving subgraph.  Synchronous peel, fixed
    8 rounds (see ``kcore``); the unit test asserts the peel converges
    well within the budget."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    return kcore(edges, k=KCORE_K, rounds=KCORE_ROUNDS)


@query(
    "q411_association_rules",
    oracle="""
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS MATERIALIZED (SELECT count(DISTINCT o) AS n FROM items),
    isup AS MATERIALIZED (
        SELECT b, CAST(count(*) AS BIGINT) AS sup FROM items GROUP BY b
    ),
    psup AS MATERIALIZED (
        SELECT a.b AS b1, c.b AS b2, CAST(count(*) AS BIGINT) AS sup
        FROM items a JOIN items c ON c.o = a.o AND a.b < c.b
        GROUP BY 1, 2
        HAVING count(*) * 200 >= (SELECT n FROM nb)
    ),
    rules AS (
        SELECT b1 AS antecedent, b2 AS consequent, p.sup AS pair_support,
               sa.sup AS ante_support,
               round(p.sup / CAST(sa.sup AS DOUBLE), 6) AS confidence,
               round((p.sup * CAST((SELECT n FROM nb) AS DOUBLE))
                     / (sa.sup * CAST(sc.sup AS DOUBLE)), 6) AS lift
        FROM psup p
        JOIN isup sa ON sa.b = p.b1
        JOIN isup sc ON sc.b = p.b2
        UNION ALL
        SELECT b2, b1, p.sup, sc.sup,
               round(p.sup / CAST(sc.sup AS DOUBLE), 6),
               round((p.sup * CAST((SELECT n FROM nb) AS DOUBLE))
                     / (sa.sup * CAST(sc.sup AS DOUBLE)), 6)
        FROM psup p
        JOIN isup sa ON sa.b = p.b1
        JOIN isup sc ON sc.b = p.b2
    )
    SELECT antecedent, consequent, pair_support, ante_support,
           confidence, lift
    FROM rules
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 50
    """,
)
def q411_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over order brand baskets: confidence
    = sup(ab)/sup(a) and lift = n·sup(ab)/(sup(a)·sup(b)) for every
    frequent pair (the q373 threshold), both directions, top-50 by lift
    with a total-order tie-break — the recommendation/affinity classic
    one level below q373's triples.

    Scale shape: the pair pass is the same prefix-bounded self-join the
    basket family uses; item supports are one hash aggregate; the rule
    join runs on the (small) frequent-pair frame against the
    (brand-bounded) support table — broadcast-sized.  Ratios divide
    exact BIGINT supports in double and round to 6dp on both engines,
    so ordering and values are bit-stable."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pt = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    items = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .transform(spersist)
    )
    n = items.select("o").distinct().count()
    isup = items.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("sup"))
    a = items.select("o", F.col("b").alias("b1"))
    c = items.select("o", F.col("b").alias("b2"))
    psup = (
        a.join(c, "o")
        .where(F.col("b1") < F.col("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .where(F.col("sup") * 200 >= n)
    )
    j = (
        psup.join(
            F.broadcast(isup.select(F.col("b").alias("b1"), F.col("sup").alias("sup_a"))),
            "b1",
        )
        .join(
            F.broadcast(isup.select(F.col("b").alias("b2"), F.col("sup").alias("sup_c"))),
            "b2",
        )
    )
    lift = F.round(
        (F.col("sup") * F.lit(float(n))) / (F.col("sup_a") * F.col("sup_c").cast("double")),
        6,
    )
    fwd = j.select(
        F.col("b1").alias("antecedent"),
        F.col("b2").alias("consequent"),
        F.col("sup").alias("pair_support"),
        F.col("sup_a").alias("ante_support"),
        F.round(F.col("sup") / F.col("sup_a").cast("double"), 6).alias("confidence"),
        lift.alias("lift"),
    )
    rev = j.select(
        F.col("b2").alias("antecedent"),
        F.col("b1").alias("consequent"),
        F.col("sup").alias("pair_support"),
        F.col("sup_c").alias("ante_support"),
        F.round(F.col("sup") / F.col("sup_c").cast("double"), 6).alias("confidence"),
        lift.alias("lift"),
    )
    return (
        fwd.unionByName(rev)
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(50)
    )
