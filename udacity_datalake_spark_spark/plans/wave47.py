"""Wave 47: exact-substring span dedup (the Lee-et-al. "deduplicating
training data" primitive q94's repeated-gram signal feeds), corpus
distribution drift (smoothed KL / Jensen-Shannon between snapshot
halves), and an int8 embedding-quantization audit — three more
documents/embeddings-table operators a 100 TB training pipeline runs.

Reference parity note: the reference (etl.py, /root/reference) has no
text or vector surface; these extend the q94 (repeated n-grams), q310
(ranking drift) and q132 (embedding aggregate) families.

Cross-engine float discipline: every float reduction in this wave sums
BIGINT-scaled terms (floor(x·10^10 + 0.5), the q221 idiom) instead of
rounding doubles — the per-term ln()/square() values come out of both
engines bit-identically, and the integer sum is partition-order proof.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.registry import query
from udacity_datalake_spark_spark.sources.readers import read_table

#: Span-dedup gram width (tokens), per the exact-substring dedup
#: convention of using a fixed minimum match length.
SPAN_W = 8

#: Hot-gram guard knobs (round 9, VERDICT r8 #1 — the last
#: documented-but-unguarded skew path).  The probe hashes a seeded
#: doc-sample's grams into HOT_GRAM_BUCKETS and compares the max
#: bucket's EXCESS over the uniform baseline (total/buckets) against a
#: DOC-FREQUENCY bar: hot iff some gram occurs in ≥ HOT_GRAM_DOC_SHARE
#: of the probed documents (and ≥ HOT_GRAM_ABS_FLOOR occurrences — a
#: tiny corpus can't trip the guard on noise).  Doc-frequency, not
#: gram-share, is the scale-honest metric: the window exposure is one
#: task buffering a gram's OCCURRENCE list, and a phrase present in
#: most of a long-document corpus has a huge occurrence count while
#: its share of total gram rows is diluted arbitrarily by doc length
#: (the planted 80%-of-docs phrase measured only 1.7% gram-share on
#: 55-token docs — a share bar would scale-lie).  Driver fixtures
#: measure max doc-frequency ≤1.2%, 4x under the bar, so registered
#: plans are unchanged.  Sampling keeps the probe at ~5% of one
#: explode pass; below HOT_GRAM_PROBE_MIN sampled grams the probe
#: re-runs on the full frame (exact and cheap at that size, immune to
#: small-sample variance).
HOT_GRAM_BUCKETS = 65536
HOT_GRAM_DOC_SHARE = 0.05
HOT_GRAM_ABS_FLOOR = 32
HOT_GRAM_PROBE_FRACTION = 0.05
HOT_GRAM_PROBE_MIN = 1000

#: Per-dataset guard-decision memo for the REGISTERED q311.  The
#: decision is a property of the data, not the call — bench repeats,
#: driver runs, and snapshot passes re-build the same plan on the same
#: fixture, and each re-probe costs one Spark action (~0.2-0.4 s of
#: pure job round-trip at local scale).  Keyed on the dataset
#: FINGERPRINT (path + documents-parquet mtime/size — round 10,
#: VERDICT r9 #3), not the path alone: a fixture REWRITTEN at the same
#: path changes its fingerprint and re-decides automatically, closing
#: the stale-decision trap that previously needed a manual
#: clear_hot_gram_memo().  Ad-hoc callers of cross_doc_dup_hits are
#: unmemoized (they pass frames, not paths).
_HOT_GRAM_MEMO: dict[tuple, bool] = {}


#: fingerprint memo entries kept before FIFO eviction (ADVICE r10: a
#: test/CI loop rewriting fixtures forever must not grow the memo
#: unboundedly — 64 distinct dataset fingerprints is far beyond any
#: real session's working set, and eviction only costs a re-probe)
_HOT_GRAM_MEMO_CAP = 64


def _dataset_fingerprint(sf_dir: str) -> tuple:
    """Cheap identity of the documents table under ``sf_dir``: the
    (mtime_ns, size) of documents.parquet — or, when Spark wrote it as
    a directory, the sorted (name, mtime_ns, size) of its entries,
    recursing ONE level into subdirectories so a partitioned
    (``key=value/part-*.parquet``) layout fingerprints its real data
    files, not just the partition dirs (ADVICE r10; deeper nesting
    falls back to the subdir's own stat, which still changes whenever
    files are added/removed inside it).  A handful of stat() calls;
    never reads data."""

    def _dir_entries(d: str, recurse: bool) -> tuple:
        out = []
        for e in os.scandir(d):
            if e.name.startswith((".", "_")):
                continue
            if e.is_file():
                st = e.stat()
                out.append((e.name, st.st_mtime_ns, st.st_size))
            elif e.is_dir() and recurse:
                out.append((e.name, _dir_entries(e.path, recurse=False)))
            else:
                st = e.stat()
                out.append((e.name, st.st_mtime_ns, st.st_size))
        return tuple(sorted(out, key=str))

    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(p):
            return (p, _dir_entries(p, recurse=True))
        st = os.stat(p)
        return (p, st.st_mtime_ns, st.st_size)
    except OSError:
        # unreadable/missing path: fall back to the path itself (the
        # read_table below will surface the real error)
        return (p, None)


def clear_hot_gram_memo() -> None:
    """Forget cached per-dataset hot-gram decisions.  Rarely needed
    since the memo keys on the dataset fingerprint (an in-place rewrite
    re-decides by itself); kept for tests and belt-and-braces harness
    hygiene."""
    _HOT_GRAM_MEMO.clear()


def _hot_gram_stats(grams: DataFrame) -> tuple[int, int, int]:
    """(max bucket count, total grams, distinct docs) of a (doc_id, g)
    frame hashed into HOT_GRAM_BUCKETS — two bounded aggs: map-side
    combine collapses to ≤65536 rows before the only exchange, so the
    probe never materializes per-gram state.  The input is NOT
    persisted: both agg branches rescan the (sampled) frame inside the
    single combined job below, which measures cheaper than persist
    bookkeeping at probe size (see the one-action note).  Bucketing
    uses pmod, not % (ADVICE r9): Spark's % keeps the dividend's sign,
    so signed xxhash64 % N spreads grams over ~2N buckets and the
    uniform baseline tot/N in _probe_hot would overstate the per-bucket
    mean ~2x; pmod keeps the bucket space exactly HOT_GRAM_BUCKETS so
    the documented baseline formula is the real one."""
    bucket = (
        grams.groupBy(
            F.pmod(F.xxhash64("g"), F.lit(HOT_GRAM_BUCKETS)).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.max("__c").alias("__mx"), F.sum("__c").alias("__tot"))
    )
    docs = grams.agg(F.approx_count_distinct("doc_id").alias("__nd"))
    # ONE action for both aggregates (1-row × 1-row cross join): the
    # probe's wall cost at local scale is fixed job round-trips, so
    # two .first() calls doubled it; the two branches each rescan the
    # (sampled) input inside the one job, which is cheaper than the
    # persist bookkeeping a shared cache would cost at this size
    mx, tot, nd = bucket.crossJoin(docs).first()
    return (mx or 0, tot or 0, nd or 0)


def probe_docs_grams(docs_w: DataFrame) -> DataFrame:
    """(doc_id, g) gram frame of a (doc_id, w) tokenized frame — the
    probe-side twin of q311's gram explode (no positions; the probe
    only counts)."""
    return docs_w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_W}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {SPAN_W})))"
            )
        ).alias("g"),
    )


def _probe_hot(grams: DataFrame, min_grams: int = 0) -> bool | None:
    """Guard decision on one probe frame: None when the frame holds
    fewer than ``min_grams`` grams (sample too small to read), else
    whether the hottest bucket's excess over the uniform baseline
    (tot/buckets — so long-document corpora, whose EVERY bucket is
    full, don't false-trigger) clears both the doc-share bar and the
    absolute floor."""
    mx, tot, nd = _hot_gram_stats(grams)
    if tot < min_grams:
        return None
    if tot == 0 or nd == 0:
        return False
    signal = mx - tot / HOT_GRAM_BUCKETS
    return signal >= max(HOT_GRAM_ABS_FLOOR, HOT_GRAM_DOC_SHARE * nd)


def cross_doc_dup_hits(
    docs: DataFrame,
    grams: DataFrame,
    hot_gram_guard: bool | str = "auto",
    probe_docs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, p) positions whose gram occurs in ≥2 DISTINCT documents
    — q311's duplicate-tagging stage, with the wave's one skew exposure
    now auto-guarded.

    Two physical forms, identical output:

    - **window** (default past the guard): min/max(doc_id) over
      ``Window.partitionBy('g')`` rides the single gram exchange —
      round 7 measured it at half the groupBy+join form's exchange
      volume.  Exposure: WindowExec buffers every occurrence of a gram
      per key before emitting, and it has NO map-side partial
      aggregation — a mega-duplicated gram (one phrase in millions of
      docs) buffers its full occurrence list on one task.
    - **groupBy+join** (the fallback the guard engages): ``groupBy(g)``
      partially aggregates map-side, so the hot key collapses to one
      row per upstream partition BEFORE the shuffle, and the join-back
      streams the hot gram's occurrences past a 1-row build entry —
      per-task state is O(1) in the gram's duplication.

    ``hot_gram_guard="auto"`` probes a seeded HOT_GRAM_PROBE_FRACTION
    doc-sample's grams with bounded bucket aggs (_probe_hot) and falls
    back when some gram's occurrence count clears the
    HOT_GRAM_DOC_SHARE-of-probed-docs bar — the collapse_exact='auto'
    pattern (operators/dedup.py) applied to the gram key, with
    doc-frequency (not gram-share) as the metric because doc length
    dilutes share arbitrarily while the buffering exposure tracks
    occurrences.  True/False force a form (the planted-corpus tests
    compare both for bit-identical output).  Driver fixtures sit 4x
    under the bar, so registered plans are unchanged (plan-budget
    snapshots stay green).

    ``probe_docs``: an ALREADY-SAMPLED (doc_id, w) frame to probe.
    Catalyst does not push Sample below a Project, so sampling the
    post-split ``docs`` frame still pays the full-corpus text split
    before discarding 95% of rows (measured: the probe cost ~40% of
    the hits stage that way); callers who hold the raw table sample
    it FIRST and split only the sample — q311 does (probe overhead
    ~0.1 s at sf0.1).  Bernoulli sampling commutes with the per-row
    length filter, so the decision distribution is identical."""
    if hot_gram_guard == "auto":
        base = (
            probe_docs
            if probe_docs is not None
            else docs.sample(fraction=HOT_GRAM_PROBE_FRACTION, seed=7)
        )
        decided = _probe_hot(probe_docs_grams(base), min_grams=HOT_GRAM_PROBE_MIN)
        if decided is None:
            decided = _probe_hot(grams)
        hot_gram_guard = bool(decided)
    if not hot_gram_guard:
        w_gram = Window.partitionBy("g")
        return (
            grams.withColumn("__mn", F.min("doc_id").over(w_gram))
            .withColumn("__mx", F.max("doc_id").over(w_gram))
            .where(F.col("__mn") != F.col("__mx"))
            .select("doc_id", "p")
        )
    # Both the aggregate and the join-back hang off ONE explicit
    # repartition("g"): a bare groupBy would push partial aggregation
    # BELOW its exchange, making the agg subplan differ from the join
    # probe's and defeating ReuseExchange — the token-scale explode
    # would then run twice (measured 3x wall on the planted corpus).
    # Derived from the same exchange, the agg is O(1) state per gram
    # (min/max over already-partitioned rows) and the probe side
    # streams the hot gram's occurrences past a tiny build side — one
    # explode, one exchange, bounded per-task state.
    part = grams.repartition("g")
    dup = (
        part.groupBy("g")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .where(F.col("__mn") != F.col("__mx"))
        .select("g")
    )
    return part.join(dup, "g").select("doc_id", "p")


@query(
    "q311_exact_substring_spans",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, string_split(text, ' ') AS w
        FROM documents WHERE len(string_split(text, ' ')) >= {SPAN_W}
    ),
    grams AS (
        SELECT doc_id, source, u.p AS p, u.g AS g
        FROM (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(w) - {SPAN_W} + 2),
                       i -> struct_pack(p := i,
                            g := array_to_string(w[i:i+{SPAN_W - 1}], ' ')))) AS u
            FROM docs
        )
    ),
    dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT gr.doc_id, gr.source, gr.p
        FROM grams gr JOIN dup ON dup.g = gr.g
    ),
    runs AS (
        SELECT doc_id, source, p,
               max(p + {SPAN_W} - 1) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM hits
    ),
    islands AS (
        SELECT doc_id, source, p,
               CAST(sum(CASE WHEN prev_end IS NULL OR p > prev_end
                             THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS island
        FROM runs
    ),
    spans AS (
        SELECT doc_id, source, island,
               min(p) AS s, max(p) + {SPAN_W} - 1 AS e
        FROM islands GROUP BY 1, 2, 3
    ),
    per_doc AS (
        SELECT doc_id, source,
               count(*) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS covered
        FROM spans GROUP BY 1, 2
    )
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN pd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_with_spans,
           CAST(COALESCE(sum(pd.n_spans), 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(sum(pd.covered), 0) AS BIGINT) AS dup_tokens_covered,
           CAST(sum(len(d.w)) AS BIGINT) AS n_tokens
    FROM docs d LEFT JOIN per_doc pd ON pd.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def q311_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans: every {W}-token window occurring
    in ≥2 distinct documents marks its token range duplicated; per doc,
    overlapping marked ranges merge into MAXIMAL spans (the
    interval-islands pattern q116 established: a running prev-end max,
    an island id from its gaps), and the per-source report gives span
    counts and exact token coverage — the fraction of the corpus an
    exact-substring dedup pass (Lee et al., "Deduplicating Training
    Data Makes Language Models Better") would cut.

    Scale shape: gram keys shuffle ONCE to find cross-doc duplicates —
    "occurs in ≥2 distinct docs" is min(doc_id) ≠ max(doc_id) over a
    gram-partitioned window, so the duplicate tag rides the same
    exchange that groups the grams (round 7: replaced the groupBy +
    join-back pair, which re-shuffled the full token-scale gram set a
    second time; the window form halves gram exchange volume).
    Trade-off (ADVICE r7), GUARDED since round 9 (VERDICT r8 #1): an
    unframed Window.partitionBy('g') buffers every occurrence of a
    gram per key with no map-side partial aggregation — a
    pathologically duplicated gram (one phrase in millions of docs)
    would buffer its full occurrence list on one task.
    ``cross_doc_dup_hits(..., hot_gram_guard='auto')`` probes the
    max-gram bucket share with one bounded agg and auto-falls-back to
    the groupBy+join form past HOT_GRAM_DOC_SHARE (planted mega-gram
    evidence: scripts/skew_bench.py --hot-gram-evidence; both forms
    test-pinned bit-identical).  The
    islands windows partition by doc_id, so span merging is key-local
    with O(1) state per row; everything after is source-grain.  At
    100 TB the gram key becomes xxhash64 of the window (8 bytes on the
    wire) — collisions only over-mark a span, which the exact
    verify-on-strings here prices."""
    d = read_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    docs = d.select("doc_id", "source", F.split("text", " ").alias("w")).where(
        F.size("w") >= SPAN_W
    )
    # source is constant per doc and rejoined from `docs` at the end —
    # keeping it off the gram rows narrows the big exchange.
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_W}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {SPAN_W})))"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "g")
    memo_key = _dataset_fingerprint(sf_dir)
    if memo_key in _HOT_GRAM_MEMO:
        guard: bool | str = _HOT_GRAM_MEMO[memo_key]
        hits = cross_doc_dup_hits(docs, grams, hot_gram_guard=guard)
    else:
        probe_docs = (
            d.sample(fraction=HOT_GRAM_PROBE_FRACTION, seed=7)
            .select("doc_id", F.split("text", " ").alias("w"))
            .where(F.size("w") >= SPAN_W)
        )
        decided = _probe_hot(probe_docs_grams(probe_docs), min_grams=HOT_GRAM_PROBE_MIN)
        if decided is None:
            decided = _probe_hot(grams)
        while len(_HOT_GRAM_MEMO) >= _HOT_GRAM_MEMO_CAP:
            # FIFO evict (dict preserves insertion order) — see cap note
            _HOT_GRAM_MEMO.pop(next(iter(_HOT_GRAM_MEMO)))
        _HOT_GRAM_MEMO[memo_key] = bool(decided)
        hits = cross_doc_dup_hits(docs, grams, hot_gram_guard=bool(decided))
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = hits.withColumn("prev_end", F.max(F.col("p") + SPAN_W - 1).over(w_prev))
    islands = runs.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_end").isNull() | (F.col("p") > F.col("prev_end")), 1
            ).otherwise(0)
        )
        .over(w_run)
        .cast("long"),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"), (F.max("p") + SPAN_W - 1).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("covered"),
    )
    return (
        docs.join(per_doc.select("doc_id", "n_spans", "covered"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_spans").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_with_spans"),
            F.coalesce(F.sum("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.sum("covered"), F.lit(0)).cast("long").alias(
                "dup_tokens_covered"
            ),
            F.sum(F.size("w")).cast("long").alias("n_tokens"),
        )
    )


@query(
    "q312_distribution_drift",
    oracle="""
    WITH tok AS (
        SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    c AS (
        SELECT term,
               CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM tok GROUP BY term
    ),
    tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
               count(*) AS v
        FROM c
    ),
    probs AS (
        SELECT c.term, c.ca, c.cb,
               (c.ca + 1) / CAST(t.na + t.v AS DOUBLE) AS pa,
               (c.cb + 1) / CAST(t.nb + t.v AS DOUBLE) AS pb
        FROM c CROSS JOIN tot t
    ),
    terms AS (
        SELECT ca, cb,
               CAST(floor(pa * ln(pa / pb) * 1e10 + 0.5) AS BIGINT) AS kl_t,
               CAST(floor((0.5 * pa * ln(pa / ((pa + pb) / 2))
                         + 0.5 * pb * ln(pb / ((pa + pb) / 2))) * 1e10 + 0.5)
                    AS BIGINT) AS js_t
        FROM probs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(CASE WHEN ca > 0 AND cb = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lost,
           CAST(sum(CASE WHEN ca = 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           round(sum(kl_t) / 1e10, 6) AS kl_a_to_b,
           round(sum(js_t) / 1e10, 6) AS js_divergence
    FROM terms
    """,
)
def q312_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus distribution drift between two snapshot halves (doc_id
    parity): Laplace-smoothed unigram KL(A‖B) and Jensen-Shannon
    divergence plus vocabulary churn (terms lost/new) — the monitor
    that catches a crawl-pipeline change shifting the token mix before
    training does.

    Scale shape: one token explode collapses map-side into the
    (term, half-counts) vocabulary frame; the divergences are one
    closed-form double per TERM, and the reduction sums
    BIGINT-scaled contributions (floor(x·10^10 + 0.5) — the q221
    boundary-proof idiom), so the result is bit-stable under any
    partitioning and mirrors the oracle exactly."""
    tok = read_table(spark, sf_dir, "documents", columns=["doc_id", "text"]).select(
        (F.col("doc_id") % 2).alias("half"), F.explode(F.split("text", " ")).alias("term")
    )
    c = tok.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v")).cast("double")
    probs = c.crossJoin(F.broadcast(tot)).select(
        "ca", "cb", pa.alias("pa"), pb.alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2
    kl_t = F.floor(F.col("pa") * F.log(F.col("pa") / F.col("pb")) * 1e10 + 0.5).cast(
        "long"
    )
    js_t = F.floor(
        (
            0.5 * F.col("pa") * F.log(F.col("pa") / m)
            + 0.5 * F.col("pb") * F.log(F.col("pb") / m)
        )
        * 1e10
        + 0.5
    ).cast("long")
    return probs.select("ca", "cb", kl_t.alias("kl_t"), js_t.alias("js_t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.when((F.col("ca") > 0) & (F.col("cb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_lost"),
        F.sum(F.when((F.col("ca") == 0) & (F.col("cb") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.round(F.sum("kl_t") / 1e10, 6).alias("kl_a_to_b"),
        F.round(F.sum("js_t") / 1e10, 6).alias("js_divergence"),
    )


@query(
    "q313_quantization_audit",
    oracle="""
    WITH vals AS (
        SELECT u.dim AS dim, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT unnest(list_transform(range(1, len(embedding) + 1),
                       i -> struct_pack(dim := i, v := embedding[i]))) AS u
            FROM embeddings
        )
    ),
    rng AS (
        SELECT dim, min(v) AS lo, max(v) AS hi, count(*) AS n
        FROM vals GROUP BY dim
    ),
    q AS (
        SELECT v.dim, v.v, r.lo, r.hi, r.n,
               (r.hi - r.lo) / 255.0 AS scale,
               CASE WHEN r.hi = r.lo THEN 0
                    ELSE least(255, greatest(0,
                        CAST(floor((v.v - r.lo) / ((r.hi - r.lo) / 255.0) + 0.5)
                             AS BIGINT)))
               END AS code
        FROM vals v JOIN rng r ON r.dim = v.dim
    ),
    err AS (
        SELECT dim, lo, hi, n, scale,
               abs(v - (lo + code * scale)) AS e
        FROM q
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(n AS BIGINT) AS n,
           round(lo, 6) AS lo,
           round(hi, 6) AS hi,
           TRUE AS max_err_within_half_step,
           round(sum(CAST(floor(e * e * 1e10 + 0.5) AS BIGINT)) / 1e10 / n, 6)
               AS mse
    FROM err
    GROUP BY dim, lo, hi, n, scale
    ORDER BY dim
    """,
)
def q313_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (0..255) per-dimension linear quantization audit of the
    embedding corpus: each dimension's [min, max] range maps to 256
    codes; the output reports per dimension the range, the
    reconstruction MSE, and asserts the quantization contract — every
    absolute reconstruction error ≤ half a quantization step — as an
    oracle-checked TRUE (the q22 tolerance-band pattern).  This is the
    storage-shrink audit run before shipping a 4×-smaller ANN index.

    Scale shape: one posexplode collapses into the (dim, min/max)
    frame (64 rows — dimension-bounded); codes and errors evaluate
    map-side against the broadcast range table; the MSE reduction sums
    BIGINT-scaled squared errors (floor(e²·10^10 + 0.5)), making the
    float aggregate partition-order independent."""
    e = read_table(spark, sf_dir, "embeddings", columns=["embedding"])
    vals = e.select(F.posexplode("embedding").alias("d0", "vf")).select(
        (F.col("d0") + 1).alias("dim"), F.col("vf").cast("double").alias("v")
    )
    rng = vals.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    scale = (F.col("hi") - F.col("lo")) / 255.0
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.col("lo")) / scale + 0.5).cast("long"),
            ),
        )
    )
    q = vals.join(F.broadcast(rng), "dim").select(
        "dim", "v", "lo", "hi", "n", scale.alias("scale"), code.alias("code")
    )
    err = q.select(
        "dim",
        "lo",
        "hi",
        "n",
        "scale",
        F.abs(F.col("v") - (F.col("lo") + F.col("code") * F.col("scale"))).alias("e"),
    )
    return (
        err.groupBy("dim", "lo", "hi", "n", "scale")
        .agg(
            F.max("e").alias("max_e"),
            F.sum(F.floor(F.col("e") * F.col("e") * 1e10 + 0.5).cast("long")).alias(
                "sse_scaled"
            ),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("n").cast("long").alias("n"),
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            # computed for real; the oracle expects TRUE (the half-step
            # bound holds exactly: codes round to the nearest step and
            # clipping only applies at the range ends)
            (F.col("max_e") <= F.col("scale") / 2 + F.lit(1e-12)).alias(
                "max_err_within_half_step"
            ),
            F.round(F.col("sse_scaled") / 1e10 / F.col("n"), 6).alias("mse"),
        )
        .orderBy("dim")
    )
