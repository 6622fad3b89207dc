"""Oracle-checkable invariant frames for approximate / engine-defined
operators (the q103 pattern).

Approximate operators (LSH ANN, IVF ANN, SimHash banding, perceptual-hash
banding) produce outputs no SQL engine can recompute — the hash bit
patterns are engine-specific and the result sets are approximate by
construction.  Rather than settling for the driver's weaker rows-only
check, each such query is restructured to emit ONE row of invariants that
a DuckDB oracle CAN pin:

- a data-derived count the oracle computes from the base table (so a
  dropped/duplicated input surfaces as a value mismatch);
- structural booleans computed from the REAL output frame (radius bounds,
  canonical id ordering, pair distinctness, rank contiguity) that the
  oracle pins to TRUE;
- an in-frame recall bound against the exact twin (brute-force cosine /
  expected identical-payload pairs) — the accuracy contract;
- a determinism signature: two independent runs must produce an identical
  multiset (order-insensitive xxhash64 content sum).

The raw pair/top-k frames stay available through the underlying operators
(`operators.similarity`, `operators.dedup`, `operators.multimodal`) and
keep their planted-pair recall unit tests.

Everything here is bounded: each invariant is one aggregate over the
operator's (already small) output, combined by broadcast cross-joins of
single-row frames — the scalar-attach idiom, no driver collect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.functions.arrays import cosine_similarity
from udacity_datalake_spark_spark.scratch import spersist


def _content_signature(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive multiset signature: (Σ xxhash64(row), count).
    Two frames with equal signatures are (with overwhelming probability)
    the same multiset — the determinism check for re-runs."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    # widen before summing: Σ of 64-bit hashes overflows long under ANSI
    return df.agg(
        F.sum(h.cast("decimal(38,0)")).alias("__hs"),
        F.count(F.lit(1)).cast("long").alias("__hn"),
    )


def ann_invariants(
    corpus: DataFrame,
    queries: DataFrame,
    run_fn: Callable[[], DataFrame],
    exact: DataFrame,
    k: int,
    recall_floor: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row invariant frame for an approximate top-k (qid, nid, sim,
    rank) search, oracle-pinned against ``count(queries)``:

    - ``n_queries``: the oracle-computable input count;
    - ``per_query_at_most_k`` / ``ranks_contiguous``: output structure;
    - ``sims_are_exact_cosines``: every emitted sim equals the rounded
      exact cosine recomputed from the stored vectors (the re-rank step
      cannot drift from the scoring contract);
    - ``recall_ge_floor``: |approx ∩ exact top-k| ≥ floor·|exact|;
    - ``deterministic``: a second independent run is multiset-identical.
    """
    # persist: five independent aggregates below consume the approx frame
    approx = run_fn().transform(spersist)
    structure = (
        approx.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("rank").alias("__rmin"),
            F.max("rank").alias("__rmax"),
        )
        .agg(
            F.coalesce(F.min(F.col("__n") <= k), F.lit(True)).alias("__at_most_k"),
            F.coalesce(
                F.min((F.col("__rmin") == 1) & (F.col("__rmax") == F.col("__n"))),
                F.lit(True),
            ).alias("__ranks_ok"),
        )
    )
    qv = corpus.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cv"))
    sims_ok = (
        approx.join(F.broadcast(qv), "qid")
        .join(cv, "nid")
        .agg(
            F.coalesce(
                F.min(F.col("sim") == F.round(cosine_similarity("__qv", "__cv"), 6)),
                F.lit(True),
            ).alias("__sims_ok")
        )
    )
    hits = (
        approx.select("qid", "nid")
        .join(exact.select("qid", "nid"), ["qid", "nid"])
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("__n_exact"))
    sig_cols = ["qid", "nid", "sim", "rank"]
    s1 = _content_signature(approx, sig_cols)
    s2 = _content_signature(run_fn(), sig_cols).select(
        F.col("__hs").alias("__hs2"), F.col("__hn").alias("__hn2")
    )
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        nq.crossJoin(F.broadcast(structure))
        .crossJoin(F.broadcast(sims_ok))
        .crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            "n_queries",
            F.col("__at_most_k").alias("per_query_at_most_k"),
            F.col("__ranks_ok").alias("ranks_contiguous"),
            F.col("__sims_ok").alias("sims_are_exact_cosines"),
            (
                F.col("__n_hit").cast("double")
                >= F.lit(recall_floor) * F.col("__n_exact")
            ).alias("recall_ge_floor"),
            (
                F.col("__hs").eqNullSafe(F.col("__hs2"))
                & (F.col("__hn") == F.col("__hn2"))
            ).alias("deterministic"),
        )
    )


def hamming_pair_invariants(
    base: DataFrame,
    run_fn: Callable[[], DataFrame],
    max_hamming: int,
    count_alias: str = "n_docs",
    expected_pairs: DataFrame | None = None,
) -> DataFrame:
    """One-row invariant frame for a banded Hamming near-dup pair frame
    (d1, d2, hamming), oracle-pinned against ``count(base)``:

    - ``{count_alias}``: the oracle-computable input count;
    - ``pairs_within_radius``: every hamming in [0, max_hamming];
    - ``pairs_canonical_distinct``: d1 < d2 everywhere, no duplicate pair;
    - ``n_expected_pairs`` / ``n_recovered_pairs``: the must-hit pair
      count and how many the output recovered.  Both are oracle-pinnable
      (the expected set is an identical-content self-join DuckDB can
      count), so a zero-output regression fails the gate numerically even
      though the structural booleans coalesce to TRUE on an empty frame
      (round-5 ADVICE: the booleans alone were vacuous);
    - ``expected_pairs_recovered``: every must-hit pair (identical
      content → identical signature → guaranteed band collision) is in
      the output;
    - ``deterministic``: a second independent run is multiset-identical.

    Cache note: the pair frame is persisted because three independent
    aggregates consume it; tracked in the package scratch pool
    (round 11) — released on entry to the next registered query, or by
    ``scratch.release()`` for callers benching repeated runs (bench.py
    and driver_sim do exactly that).
    """
    # persist: three independent aggregates below consume the pair frame
    pairs = run_fn().transform(spersist)
    stats = pairs.agg(
        F.coalesce(
            F.min((F.col("hamming") >= 0) & (F.col("hamming") <= max_hamming)),
            F.lit(True),
        ).alias("__within"),
        F.coalesce(F.min(F.col("d1") < F.col("d2")), F.lit(True)).alias("__canon"),
        F.count(F.lit(1)).alias("__np"),
        F.count_distinct("d1", "d2").alias("__nd"),
    )
    if expected_pairs is not None:
        missed = (
            expected_pairs.join(pairs.select("d1", "d2"), ["d1", "d2"], "left_anti")
            .agg(F.count(F.lit(1)).alias("__n_missed"))
        )
        n_exp = expected_pairs.agg(
            F.count(F.lit(1)).cast("long").alias("__n_exp")
        )
    else:
        missed = pairs.limit(0).agg(F.count(F.lit(1)).alias("__n_missed"))
        n_exp = pairs.limit(0).agg(F.count(F.lit(1)).cast("long").alias("__n_exp"))
    sig_cols = ["d1", "d2", "hamming"]
    s1 = _content_signature(pairs, sig_cols)
    s2 = _content_signature(run_fn(), sig_cols).select(
        F.col("__hs").alias("__hs2"), F.col("__hn").alias("__hn2")
    )
    nb = base.agg(F.count(F.lit(1)).cast("long").alias(count_alias))
    return (
        nb.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(missed))
        .crossJoin(F.broadcast(n_exp))
        .crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            count_alias,
            F.col("__within").alias("pairs_within_radius"),
            (F.col("__canon") & (F.col("__np") == F.col("__nd"))).alias(
                "pairs_canonical_distinct"
            ),
            F.col("__n_exp").alias("n_expected_pairs"),
            (F.col("__n_exp") - F.col("__n_missed").cast("long")).alias(
                "n_recovered_pairs"
            ),
            (F.col("__n_missed") == 0).alias("expected_pairs_recovered"),
            (
                F.col("__hs").eqNullSafe(F.col("__hs2"))
                & (F.col("__hn") == F.col("__hn2"))
            ).alias("deterministic"),
        )
    )
