"""Skew-adversarial bench twin: the uniform synthetic corpus hides the
failure mode 100 TB production data actually has — Zipf token
distributions, duplicate-heavy spam sources, and hot join keys.  This
script regenerates the skew-sensitive tables adversarially, times the
skew-exposed headliners at two scales, and reports the same
slope-vs-10×-data measurement bench.py records on uniform data.

Skewed fixture (per scale, built in a temp dir; all other tables
symlink to the real /root/testdata sf dir):

- ``documents``: Zipf(1.4) tokens over a 2000-term vocabulary (a few
  hot shingles appear in most docs — the worst case for shingle-keyed
  candidate joins), one "spam" source holding 30% of the corpus as
  near-duplicates of 20 master docs (duplicate-heavy CC components),
  doc lengths Zipf-distributed too (one 100×-median giant).
- ``lineitem``: the real table plus one hot order inflated to ~10% of
  all rows (hot-key join fan-out for q38/q109).
- ``orders``: unchanged rows (the hot key already exists there).

Measured queries: q95/q195 (LSH dedup + curation pipelines: candidate
generation must not blow up on hot shingles), q38/q109 (salted join /
hot-key skew join: the inflated order stresses the very thing they
exist for), q45 (PPJoin prefix filter under hot shingles), q301
(impact-pruned lexical top-k under Zipf postings).

Round 5 adds the embedding path: ``embeddings`` is regenerated as a
CLUSTERED corpus with one tight mega-cluster holding 30% of vectors
(one direction cone → one LSH bucket per table, one IVF cell) — the
adversarial shape for bucketed ANN.  q48 (brute force — skew-neutral
baseline), q49 (hyperplane LSH), q56 (embedding near-dup), q60 (IVF)
are sloped on it; ``operators.similarity.lsh_bucket_stats`` plus the
``max_bucket_rows`` sub-split guard cover the blowup the slope would
expose (tests/test_llm_ops.py).

Output: one JSON line {"metric": "skew_slopes", "slopes": {...},
"flagged_ge20x": [...], "small_secs": {...}, "big_secs": {...}} —
recorded as a table in SCALE.md.

Usage: python scripts/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SKEW_QUERIES = [
    "q38_salted_join",
    "q45_ngram_jaccard",
    "q95_dedup_corpus",
    "q109_hot_key_skew_join",
    "q195_curation_pipeline",
    "q301_sparse_cosine_topk",
    # embedding path (clustered + mega-cluster fixture)
    "q48_embedding_topk",
    "q49_ann_lsh",
    "q56_embedding_near_dup",
    "q60_ann_ivf",
]

VOCAB = 2000
ZIPF_A = 1.4


def _zipf_probs(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def build_skewed_documents(n_docs: int, seed: int = 7, exact_spam: bool = False):
    """Rows (doc_id, text, lang, source, n_chars) with Zipf tokens and a
    duplicate-heavy spam source.  ``exact_spam=True`` makes the spam 30%
    EXACT copies of the 20 masters — the identical-signature mega-group
    regime no hash can sub-split (the collapse_exact guard's target)."""
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(VOCAB, ZIPF_A)
    vocab = np.array([f"tok{i}" for i in range(VOCAB)])
    # Zipf-distributed doc lengths: median ~60 tokens, one giant ~100×
    lengths = np.minimum((60 * rng.pareto(1.3, n_docs) + 20).astype(int), 6000)
    lengths[0] = 6000  # the planted giant
    n_spam = int(0.3 * n_docs)
    masters = [
        " ".join(rng.choice(vocab, size=int(lengths[i]), p=probs)) for i in range(20)
    ]
    rows = []
    for i in range(n_docs):
        if i < n_docs - n_spam:
            text = " ".join(rng.choice(vocab, size=int(lengths[i]), p=probs))
            source = f"src{i % 4}"
        else:
            # near-duplicate of a master: one token appended → Jaccard ≈ 1
            # (or a byte-exact copy in the exact_spam regime)
            m = masters[i % 20]
            text = m if exact_spam else m + f" tail{i % 7}"
            source = "spam"
        rows.append((i, text, "en" if i % 5 else "de", source, len(text)))
    return rows


def build_clustered_embeddings(n_vecs: int, dim: int = 64, seed: int = 11):
    """Rows (vec_id, embedding, label): 30% of vectors in ONE tight
    direction cone (sigma 0.02 — same hyperplane sign pattern, same IVF
    cell), the rest over 7 looser clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((8, dim))
    centers /= np.sqrt((centers * centers).sum(axis=1, keepdims=True))
    n_mega = int(0.3 * n_vecs)
    rows = []
    for i in range(n_vecs):
        if i < n_mega:
            c, sigma = centers[0], 0.02
        else:
            c, sigma = centers[1 + i % 7], 0.3
        v = (c + sigma * rng.standard_normal(dim)).astype("float32")
        rows.append((i, [float(x) for x in v], int(i >= n_mega)))
    return rows


def build_fixture(spark, base_sf_dir: str, out_dir: str, n_docs: int) -> None:
    """Skewed documents + hot-key lineitem + clustered embeddings in
    out_dir; symlink the rest."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.createDataFrame(
        build_skewed_documents(n_docs),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    li = spark.read.parquet(f"{base_sf_dir}/lineitem.parquet")
    hot = li.agg(F.min("l_orderkey").alias("k")).first().k
    n = li.count()
    hot_rows = (
        li.limit(max(1, n // 200))
        .withColumn("l_orderkey", F.lit(hot).cast("long"))
        .crossJoin(spark.range(20).select(F.col("id").alias("__rep")))
        .drop("__rep")
    )  # ~10% of all rows under ONE key
    li.unionByName(hot_rows).coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    n_vecs = 4 * n_docs  # 2000 @ small, 20000 @ big — 10x like the rest
    spark.createDataFrame(
        build_clustered_embeddings(n_vecs),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for t in os.listdir(base_sf_dir):
        dst = os.path.join(out_dir, t)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf_dir, t), dst)


def main() -> None:
    from udacity_datalake_spark_spark.plans import QUERIES
    from udacity_datalake_spark_spark.session import get_session

    spark = get_session(app_name="skew-bench")
    tmp = tempfile.mkdtemp(prefix="skewfix-")
    small, big = f"{tmp}/small", f"{tmp}/big"
    build_fixture(spark, "/root/testdata/sf0.01", small, 500)
    build_fixture(spark, "/root/testdata/sf0.1", big, 5000)

    def run(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in SKEW_QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            out[name] = round(best, 4)
        return out

    run(small)  # warm-up: JIT + codegen on the same plan shapes
    small_secs = run(small)
    big_secs = run(big)
    slopes = {
        n: round(big_secs[n] / small_secs[n], 2) if small_secs[n] > 0 else 0.0
        for n in SKEW_QUERIES
    }
    print(
        json.dumps(
            {
                "metric": "skew_slopes",
                "slopes": slopes,
                "flagged_ge20x": [n for n, s in slopes.items() if s >= 20.0],
                "small_secs": small_secs,
                "big_secs": big_secs,
            }
        )
    )

    # Round-6: MinHash occupancy-guard evidence on the identical-heavy
    # corpus (30% byte-exact copies of 20 masters).  Time the q95 dedup
    # shape guard-OFF vs collapse_exact at both scales: OFF fans each
    # identical group quadratically in EVERY band; collapse emits
    # linear star edges, so its slope stays ~data-linear.
    from pyspark.sql import functions as F
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components

    def dedup_secs(sf_dir: str, collapse: bool) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            d = spark.read.parquet(f"{sf_dir}/documents.parquet")
            edges = minhash_lsh_pairs(
                d, "doc_id", "text", n=3, threshold=0.6, collapse_exact=collapse
            )
            labels = connected_components(edges, src="d1", dst="d2")
            losers = labels.where(F.col("node") != F.col("component")).select(
                F.col("node").alias("loser")
            )
            d.join(
                F.broadcast(losers), F.col("doc_id") == F.col("loser"), "left_anti"
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 4)

    small_x, big_x = f"{tmp}/small_exact", f"{tmp}/big_exact"
    for out_dir, base, n_docs in (
        (small_x, "/root/testdata/sf0.01", 500),
        (big_x, "/root/testdata/sf0.1", 5000),
    ):
        os.makedirs(out_dir, exist_ok=True)
        spark.createDataFrame(
            build_skewed_documents(n_docs, exact_spam=True),
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(4).write.mode("overwrite").parquet(
            f"{out_dir}/documents.parquet"
        )
    guard = {}
    for mode, collapse in (("guard_off", False), ("collapse_exact", True)):
        dedup_secs(small_x, collapse)  # warm
        s, b = dedup_secs(small_x, collapse), dedup_secs(big_x, collapse)
        guard[mode] = {
            "small_secs": s,
            "big_secs": b,
            "slope": round(b / s, 2) if s > 0 else 0.0,
        }
    print(json.dumps({"metric": "minhash_guard_identical_corpus", **guard}))
    spark.stop()


if __name__ == "__main__":
    main()
