"""Wave 23: embedding-space label evaluation (kNN classifier accuracy),
recommender training-pair generation (hash negative sampling), tokenizer
OOV audit, and graph degree assortativity — the ML-adjacent data ops a
training pipeline runs between curation and model training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.similarity import cosine_topk
from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.plans.wave15 import (
    COSUPPLY_DEG_SQL,
    COSUPPLY_EDGES_SQL,
    cosupply_degrees,
    cosupply_edges,
)
from udacity_datalake_spark_spark.sources.readers import read_table
from udacity_datalake_spark_spark.scratch import spersist


@query(
    "q238_knn_label_eval",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS true_label
               FROM embeddings WHERE vec_id < 50),
    scored AS (
        SELECT q.qid, q.true_label, e.vec_id AS nid, e.label AS nlabel,
               round(
                 list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE)))))
               , 6) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.qid
    ),
    topk AS (
        SELECT qid, true_label, nlabel,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored
    ),
    votes AS (
        SELECT qid, true_label, nlabel, count(*) AS v
        FROM topk WHERE rank <= 10 GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT qid, true_label, nlabel AS predicted,
               row_number() OVER (PARTITION BY qid ORDER BY v DESC, nlabel) AS r
        FROM votes
    )
    SELECT true_label, count(*) AS n_queries,
           CAST(sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred WHERE r = 1
    GROUP BY true_label
    """,
)
def q238_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier evaluation in embedding space: predict each query
    vector's label by 10-nearest-neighbor majority vote (cosine,
    exact) and report per-class accuracy — the "are these embeddings
    any good" sanity check before they drive dedup or retrieval.

    Reuses the q48 exact kernel (broadcast queries, codegen cosine,
    rounded-score + id-tiebreak ranking); votes aggregate at
    (query, label) grain and the argmax window partitions per query.
    The query set is a FIXED absolute count, so the oracle's quadratic
    scoring stays bounded at any corpus SF while the corpus side scans
    once — exactly the engine's scale posture."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    topk = cosine_topk(emb, queries, k=10)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    votes = (
        topk.join(
            labels.select(F.col("vec_id").alias("nid"), F.col("label").alias("nlabel")),
            "nid",
        )
        .groupBy("qid", "nlabel")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("v").desc(), F.col("nlabel"))
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("qid", F.col("nlabel").alias("predicted"))
    )
    truth = queries.select(F.col("vec_id").alias("qid"), F.col("label").alias("true_label"))
    hit = F.when(F.col("predicted") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.join(truth, "qid")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(hit).alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)).cast("double"), 6).alias("accuracy"),
        )
    )


@query(
    "q239_negative_sampling",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS custkey, p.p_type AS ptype
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
    ),
    types AS (SELECT DISTINCT p_type AS ptype FROM part),
    custs AS (SELECT DISTINCT custkey FROM pos),
    candidates AS (
        SELECT c.custkey, t.ptype
        FROM custs c CROSS JOIN types t
        WHERE NOT EXISTS (SELECT 1 FROM pos
                          WHERE pos.custkey = c.custkey AND pos.ptype = t.ptype)
    ),
    negs AS (
        SELECT custkey, ptype,
               row_number() OVER (
                   PARTITION BY custkey
                   ORDER BY md5(CAST(custkey AS VARCHAR) || ':' || ptype), ptype
               ) AS r
        FROM candidates
    )
    SELECT custkey, ptype, 1 AS label FROM pos
    UNION ALL
    SELECT custkey, ptype, 0 AS label FROM negs WHERE r <= 2
    """,
)
def q239_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair generation for a recommender: every observed
    (customer, part-type) purchase as a positive, plus ≤2 DETERMINISTIC
    hash-sampled negatives per customer drawn from the types the
    customer never bought — the negative-sampling step every implicit-
    feedback model needs, without RNG.

    Positives reduce to distinct pairs via broadcast dim joins;
    candidate negatives are customer × type-dimension (type side is
    broadcast-small) minus positives via an anti-join; the "random"
    pick is an md5 ordering per customer (q64's cross-engine hash
    idiom), so the sample is reproducible at any scale and identical
    in the oracle."""
    li = read_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    o = read_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    p = read_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    pos = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("custkey"), F.col("p_type").alias("ptype"))
        .distinct()
    )
    types = p.select(F.col("p_type").alias("ptype")).distinct()
    custs = pos.select("custkey").distinct()
    candidates = custs.crossJoin(F.broadcast(types)).join(
        pos, ["custkey", "ptype"], "left_anti"
    )
    hkey = F.md5(F.concat(F.col("custkey").cast("string"), F.lit(":"), F.col("ptype")))
    w = Window.partitionBy("custkey").orderBy(hkey, "ptype")
    negs = (
        candidates.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 2)
        .select("custkey", "ptype", F.lit(0).alias("label"))
    )
    return pos.select("custkey", "ptype", F.lit(1).alias("label")).unionAll(negs)


@query(
    "q240_oov_rate",
    oracle="""
    WITH labeled AS (
        SELECT source, string_split(text, ' ') AS arr,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        FROM documents
    ),
    train_tok AS (SELECT unnest(arr) AS token FROM labeled WHERE h < 'cd'),
    vocab AS (SELECT token FROM train_tok GROUP BY token HAVING count(*) >= 5),
    test_tok AS (SELECT source, unnest(arr) AS token FROM labeled WHERE h >= 'e6')
    SELECT source, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS oov_rate
    FROM test_tok t LEFT JOIN vocab v USING (token)
    GROUP BY source
    """,
)
def q240_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer out-of-vocabulary audit: build the min-count-5 vocab on
    the TRAIN split only (q64's md5 rule) and measure per-source OOV
    token share on the TEST split — the leakage-safe version of q120's
    vocab construction, and the number that predicts how a tokenizer
    trained on this corpus treats held-out data.

    Vocabulary is token-keyed (map-combined count + filter, vocabulary-
    sized); the OOV probe is one token-keyed left join; shares are
    exact integer counts with one rounded double per source."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    labeled = d.select(
        "source",
        F.split("text", " ").alias("arr"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("h"),
    )
    train_tok = labeled.where(F.col("h") < "cd").select(
        F.explode("arr").alias("token")
    )
    vocab = (
        train_tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 5)
        .select("token")
        .withColumn("__in", F.lit(1))
    )
    test_tok = labeled.where(F.col("h") >= "e6").select(
        "source", F.explode("arr").alias("token")
    )
    oov = F.when(F.col("__in").isNull(), 1).otherwise(0)
    return (
        test_tok.join(vocab, "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
            F.round(F.sum(oov) / F.count(F.lit(1)).cast("double"), 6).alias("oov_rate"),
        )
    )


@query(
    "q241_degree_assortativity",
    oracle=f"""
    WITH {COSUPPLY_EDGES_SQL},
    {COSUPPLY_DEG_SQL},
    both_dirs AS (
        SELECT u AS a, w AS b FROM edges UNION ALL SELECT w, u FROM edges
    ),
    dpairs AS (
        SELECT da.d AS dx, db.d AS dy
        FROM both_dirs j JOIN deg da ON j.a = da.x JOIN deg db ON j.b = db.x
    ),
    s AS (
        SELECT count(*) AS n,
               CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
               CAST(sum(dx * dx) AS DOUBLE) AS sxx,
               CAST(sum(dy * dy) AS DOUBLE) AS syy,
               CAST(sum(dx * dy) AS DOUBLE) AS sxy
        FROM dpairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS assortativity
    FROM s
    """,
)
def q241_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-supply graph: Pearson correlation
    of endpoint degrees over all (directed) edges — positive means hubs
    link to hubs (skew compounds under joins), negative means
    hub-to-leaf structure.  The one-number companion to q230's CCDF and
    q231's tail exponent.

    Degrees are graph-sized; the edge list symmetrizes (both
    directions) so the statistic is orientation-free; power sums are
    exact int64 and the correlation evaluates once in double."""
    edges = cosupply_edges(spark, sf_dir).transform(spersist)
    deg = cosupply_degrees(edges)
    both = edges.select(F.col("u").alias("a"), F.col("w").alias("b")).unionAll(
        edges.select(F.col("w").alias("a"), F.col("u").alias("b"))
    )
    pairs = (
        both.join(deg.select(F.col("x").alias("a"), F.col("d").alias("dx")), "a")
        .join(deg.select(F.col("x").alias("b"), F.col("d").alias("dy")), "b")
        .select("dx", "dy")
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        (n / 2).cast("long").alias("n_edges"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("assortativity"),
    )
