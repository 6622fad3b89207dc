"""Brute-force and planted-invariant checks for the wave 46/47 operators
(beyond their DuckDB oracle twins, which pin cross-engine equality but
not the MATH): count-min never underestimates ANY term, Bloom
decontamination never misses a planted contamination, exact-substring
coverage equals a brute-force interval union, RBO of identical rankings
equals its closed form, domain caps keep exactly the md5-ordered
prefix, quantization errors respect the half-step bound on random data,
and KL/JS collapse to zero on identical halves."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from udacity_datalake_spark_spark.plans import QUERIES
from udacity_datalake_spark_spark.sources.readers import read_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


import pytest as _pytest_cache_scope


@_pytest_cache_scope.fixture(autouse=True)
def _scoped_operator_cache(spark):
    """This module exercises operators whose internal persist() is
    documented as caller-clears scope (banded dedup / LSH / invariant
    frames / gate-scalar persists).  Clearing per test honors that
    contract and keeps the conftest module-level persist-leak gate
    meaningful: a NEW operator leak in any module WITHOUT this declared
    scope still fails the suite."""
    yield
    spark.catalog.clearCache()


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    ).coalesce(2).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_countmin_never_underestimates_any_term(spark, tmp_path):
    """The CM guarantee is per-POINT-QUERY, so check est ≥ exact for the
    whole reported set against independently computed exact counts."""
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        toks = rng.choice([f"t{j}" for j in range(40)], size=30, p=None)
        rows.append((i, " ".join(toks), f"s{i % 3}"))
    d = _write_docs(spark, tmp_path, rows)
    exact: dict[str, int] = {}
    for _, t, _ in rows:
        for tok in t.split(" "):
            exact[tok] = exact.get(tok, 0) + 1
    out = QUERIES["q308_countmin_sketch"](spark, d).collect()
    assert out, "top-20 must be non-empty"
    for r in out:
        assert r.exact_cnt == exact[r.term], (r.term, r.exact_cnt, exact[r.term])
        assert r.est_cnt >= r.exact_cnt, f"CM underestimated {r.term}"
        assert r.never_underestimates and r.within_bound


def test_bloom_decontamination_no_false_negatives_planted(spark, tmp_path):
    """Docs sharing a trigram with a benchmark doc (doc_id % 97 == 0)
    must ALWAYS be flagged — Bloom filters have no false negatives."""
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [(0, bench_text, "bench")]  # 0 % 97 == 0 → benchmark doc
    # planted: shares the 'beta gamma delta' trigram
    rows += [(i, f"x{i} beta gamma delta y{i} z{i}", "corp") for i in range(1, 11)]
    # clean: disjoint vocabulary
    rows += [(i, f"p{i} q{i} r{i} s{i} t{i}", "clean") for i in range(11, 21)]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in QUERIES["q309_bloom_decontamination"](spark, d).collect()}
    assert out["corp"].n_contaminated == 10
    assert out["corp"].n_flagged >= 10, "false negative: planted contamination missed"
    assert all(r.no_false_negatives for r in out.values())
    assert out["clean"].n_contaminated == 0


def test_exact_substring_spans_match_bruteforce(spark, tmp_path):
    """Per-source covered-token totals must equal a brute-force interval
    union over duplicated 8-gram positions."""
    rng = np.random.default_rng(11)
    texts = []
    base = [f"w{j}" for j in range(200)]
    shared = " ".join(f"d{j}" for j in range(12))  # 12-token planted dup run
    for i in range(20):
        toks = list(rng.choice(base, size=25))
        t = " ".join(toks)
        if i % 3 == 0:
            t = t + " " + shared  # planted duplicate block across docs
        texts.append((i, t, f"s{i % 2}"))
    d = _write_docs(spark, tmp_path, texts)

    W = 8
    gram_docs: dict[str, set[int]] = {}
    doc_words = {}
    for i, t, _ in texts:
        w = t.split(" ")
        doc_words[i] = w
        for p in range(len(w) - W + 1):
            g = " ".join(w[p : p + W])
            gram_docs.setdefault(g, set()).add(i)
    want_cov: dict[str, int] = {}
    want_spans: dict[str, int] = {}
    for i, t, s in texts:
        w = doc_words[i]
        marked = sorted(
            p
            for p in range(len(w) - W + 1)
            if len(gram_docs[" ".join(w[p : p + W])]) >= 2
        )
        cov = 0
        spans = 0
        cur_end = -1
        for p in marked:
            if p > cur_end:
                spans += 1
                cov += W
                cur_end = p + W - 1
            else:
                cov += p + W - 1 - cur_end
                cur_end = p + W - 1
        want_cov[s] = want_cov.get(s, 0) + cov
        want_spans[s] = want_spans.get(s, 0) + spans
    out = {r.source: r for r in QUERIES["q311_exact_substring_spans"](spark, d).collect()}
    for s in want_cov:
        assert out[s].dup_tokens_covered == want_cov[s], (s, out[s], want_cov[s])
        assert out[s].n_spans == want_spans[s]
    assert sum(want_cov.values()) > 0, "fixture must contain planted duplicate spans"


def test_rbo_identical_rankings_closed_form(spark, tmp_path):
    """When every doc contains each of its terms exactly once, the df and
    tf rankings coincide, and truncated RBO = 1 − p^depth."""
    vocab = [f"v{j:02d}" for j in range(30)]
    rows = []
    for i in range(25):
        # distinct terms per doc → df == tf contribution per term
        toks = vocab[: 30 - (i % 5)]
        rows.append((i, " ".join(toks), "s0"))
    d = _write_docs(spark, tmp_path, rows)
    r = QUERIES["q310_rank_biased_overlap"](spark, d).first()
    want = 1 - 0.9**20
    assert r.overlap_at_depth == 20
    assert abs(r.rbo_truncated - want) < 1e-6, (r.rbo_truncated, want)


def test_domain_caps_keep_md5_prefix(spark, tmp_path):
    """kept_docid_sum must equal the sum over the first CAP doc_ids in
    (md5(doc_id), doc_id) order per source — the cap keeps a
    deterministic prefix, not an arbitrary subset."""
    rows = [(i, f"t{i} u{i}", f"s{i % 2}") for i in range(140)]
    d = _write_docs(spark, tmp_path, rows)
    per_src: dict[str, list[int]] = {}
    for i, _, s in rows:
        per_src.setdefault(s, []).append(i)
    out = {r.source: r for r in QUERIES["q307_domain_caps"](spark, d).collect()}
    for s, ids in per_src.items():
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want = sum(order[:50])
        assert out[s].kept_docid_sum == want, s
        assert out[s].n_kept == min(50, len(ids))
        assert out[s].n_total == len(ids)


def test_quantization_bound_on_random_embeddings(spark, tmp_path):
    rng = np.random.default_rng(5)
    d = str(tmp_path / "emb")
    vecs = [
        (int(i), [float(x) for x in rng.normal(size=16)], int(i % 3))
        for i in range(300)
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = QUERIES["q313_quantization_audit"](spark, d).collect()
    assert len(out) == 16
    for r in out:
        assert r.max_err_within_half_step, r
        step = (r.hi - r.lo) / 255.0
        assert r.mse <= (step / 2) ** 2 + 1e-9, r


def test_distribution_drift_zero_on_identical_halves(spark, tmp_path):
    """Mirror-paired docs (even/odd ids share a text) make the halves'
    unigram counts identical → KL and JS must be exactly 0 and the
    churn counts 0."""
    rows = []
    for i in range(30):
        t = " ".join(f"m{j}" for j in range((i % 7) + 3))
        rows.append((2 * i, t, "s0"))
        rows.append((2 * i + 1, t, "s0"))
    d = _write_docs(spark, tmp_path, rows)
    r = QUERIES["q312_distribution_drift"](spark, d).first()
    assert r.kl_a_to_b == 0.0 and r.js_divergence == 0.0
    assert r.n_lost == 0 and r.n_new == 0


def test_ngram_overlap_eval_self_pair_is_perfect(spark, tmp_path):
    """A candidate identical to its reference must score p1 = p2 =
    bleu2_core = 1 with no brevity penalty."""
    rows = []
    for i in range(5):
        t = " ".join(f"c{i}_{j}" for j in range(10))
        rows.append((i, t, "s0"))           # candidate (doc_id < 200)
        rows.append((i + 200, t, "s0"))     # identical reference partner
    d = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q306_ngram_overlap_eval"](spark, d).collect()
    assert len(out) == 5
    for r in out:
        assert r.p1 == 1.0 and r.p2 == 1.0 and r.bleu2_core == 1.0
        assert r.brevity_penalized == 0


def test_bmp_decode_agrees_with_ppm_and_rejects_bad_input(spark):
    """Three-container truth: BMP and PPM payloads of the same ids must
    decode to identical (width, height, channel sums); a payload without
    the 'BM' magic must be rejected."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_bmp_payload,
        synthesize_ppm_payload,
    )

    ids = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    bmp = {r.doc_id: r for r in decode_media(synthesize_bmp_payload(ids), "bmp").collect()}
    ppm = {r.doc_id: r for r in decode_media(synthesize_ppm_payload(ids), "ppm").collect()}
    assert len(bmp) == 24
    for i in bmp:
        assert (bmp[i].width, bmp[i].height, bmp[i].sum_r, bmp[i].sum_g, bmp[i].sum_b) == (
            ppm[i].width, ppm[i].height, ppm[i].sum_r, ppm[i].sum_g, ppm[i].sum_b
        ), i

    bad = spark.createDataFrame([(1, b"XX" + b"\x00" * 60)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="not a BMP"):
        decode_media(bad, "bmp").collect()


def test_contrastive_triplets_structure(spark, tmp_path):
    """q314 invariants on a small labeled set: every anchor whose label
    has >=2 members appears exactly once; positive is same-label and not
    the anchor; negative is a different label's md5-minimal head."""
    d = str(tmp_path / "emb")
    vecs = [(int(i), [float(i), 0.0], int(i % 4)) for i in range(40)]
    import pyspark.sql.types as T  # noqa: F401

    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    rows = QUERIES["q314_contrastive_triplets"](spark, d).collect()
    assert len(rows) == 40  # every label has 10 members
    by_label = {}
    for i, _, l in vecs:
        by_label.setdefault(l, []).append(i)
    heads = {
        l: min(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for l, ids in by_label.items()
    }
    seen = set()
    for r in rows:
        assert r.anchor_id not in seen
        seen.add(r.anchor_id)
        assert r.positive_id != r.anchor_id
        assert r.positive_id % 4 == r.anchor_label  # same label (label == id%4)
        neg_label = (sorted(by_label)[ (sorted(by_label).index(r.anchor_label) + 1) % 4 ])
        assert r.negative_id == heads[neg_label]


def test_hard_negatives_match_numpy_bruteforce(spark, sf_dir):
    """q315's argmax must equal a float64 numpy brute force on the real
    corpus (scaled-integer cosine ordering == true cosine ordering
    except at ties the test corpus doesn't produce)."""
    import numpy as np

    e = read_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in e}
    out = {r.anchor_id: r.hard_negative_id for r in QUERIES["q315_hard_negative_mining"](spark, sf_dir).collect()}
    assert len(out) == 20
    for a in range(20):
        va, la = vecs[a]
        best, best_cos = None, -2.0
        for c, (vc, lc) in vecs.items():
            if lc == la:
                continue
            cos = float(va @ vc / (np.linalg.norm(va) * np.linalg.norm(vc)))
            if cos > best_cos + 1e-12 or (abs(cos - best_cos) <= 1e-12 and c < best):
                best, best_cos = c, cos
        assert out[a] == best, (a, out[a], best)


def test_bootstrap_weights_follow_pmf(spark, sf_dir):
    """q332's replicate effective sizes must hover around n (Poisson(1)
    mean 1): each replicate's n_eff within 20% of the order count, and
    replicate totals are NOT all identical (the weights really vary)."""
    o = read_table(spark, sf_dir, "orders").count()
    rows = QUERIES["q332_deterministic_bootstrap"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert abs(r.n_eff - o) < 0.2 * o, (r.replicate, r.n_eff, o)
    assert len({r.total_rev_cents for r in rows}) > 1


def test_custom_source_partition_planning(spark):
    """q334's source must plan one task per day: reading n_days=4 yields
    4000 rows across exactly 4 distinct days, deterministically equal on
    a re-read."""
    from udacity_datalake_spark_spark.sources.pyds import register

    register(spark)
    df = spark.read.format("synthevents").option("n_days", "4").load()
    assert df.rdd.getNumPartitions() == 4
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in spark.read.format("synthevents").option("n_days", "4").load().collect())
    assert a == b and len(a) == 4000


def test_canonical_selection_keeps_longest(spark, tmp_path):
    """q327 on planted clusters: the canonical member must be the longest
    document of each near-dup cluster."""
    base = " ".join(f"c{j}" for j in range(30))
    rows = []
    # cluster of three near-dups with increasing length: 10/11/12 tokens + shared core
    for k in range(3):
        rows.append((k, base + " " + " ".join(f"x{k}_{j}" for j in range(k + 1)), "s0"))
    # isolated docs
    rows += [(10 + i, " ".join(f"z{i}_{j}" for j in range(20)), "s0") for i in range(5)]
    d = _write_docs(spark, tmp_path, rows)
    out = QUERIES["q327_canonical_selection"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 3 and r.component == 0
    assert r.canonical_id == 2, "longest member (doc 2) must be canonical"


def test_restatement_v1_never_exceeds_v2(spark, sf_dir):
    """q344: the first-published number can only go UP when stragglers
    land (all cents are positive), and the restated share must be
    roughly the straggler tag rate (~10%, md5-derived)."""
    rows = QUERIES["q344_restatement_audit"](spark, sf_dir).collect()
    assert rows
    total_v1 = sum(r.v1_cents for r in rows)
    total_v2 = sum(r.v2_cents for r in rows)
    for r in rows:
        assert r.v1_cents <= r.v2_cents
        assert r.restated_cents == r.v2_cents - r.v1_cents
    share = (total_v2 - total_v1) / total_v2
    assert 0.03 < share < 0.25, share


def test_binned_quantile_bounds_on_random_data(spark, tmp_path):
    """q348's structural guarantees must hold on adversarial random
    values too — heavy-tailed draws with ties, landing across bins."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = []
    eid = 0
    for t in ("a", "b", "c"):
        vals = np.round(rng.pareto(1.5, 800) * 30 + 0.5, 2)
        for v in vals:
            rows.append((eid, t, int(eid % 50), float(v)))
            eid += 1
    d = str(tmp_path / "fx")
    spark.createDataFrame(
        [(i, t, u, None, v) for i, t, u, v in rows],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["q348_mergeable_quantiles"](spark, d).collect()
    assert len(out) == 3
    for r in out:
        assert r.bin_contains_exact, r
        assert r.within_half_bin, r


def test_duplicate_payments_planted(spark, tmp_path):
    """q349 on planted double-charges: two same-amount purchases 2 min
    apart flag once; same amount 2 days apart does not."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: double-charge (2 minutes apart, same cents)
        (1, "purchase", 1, base, 10.00),
        (2, "purchase", 1, base + dt.timedelta(minutes=2), 10.00),
        # user 2: same amount, 2 days apart — NOT a dup
        (3, "purchase", 2, base, 5.00),
        (4, "purchase", 2, base + dt.timedelta(days=2), 5.00),
        # user 3: different amounts 1 minute apart — NOT a dup
        (5, "purchase", 3, base, 7.00),
        (6, "purchase", 3, base + dt.timedelta(minutes=1), 8.00),
    ]
    d = str(tmp_path / "fx")
    spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = QUERIES["q349_duplicate_payments"](spark, d).first()
    assert r.n_payments == 6
    assert r.n_suspect == 1
    assert r.n_users_flagged == 1
    assert r.suspect_cents == 1000


def _plant_events_and_compare(spark, tmp_path, qname, rows):
    """Write a planted events.parquet, run the registry query AND its
    DuckDB oracle twin on the same fixture, and assert exact parity.

    This makes the time-arithmetic oracle gates NON-vacuous: the driver
    fixtures contain no near-boundary pairs, so a second-truncation vs
    fractional-epoch divergence (the round-4 ADVICE class) would pass
    the driver gate silently.  Here the boundary rows exist by
    construction."""
    import duckdb

    from udacity_datalake_spark_spark.plans import ORACLE_SQL
    from tests.oracle import assert_frames_match

    d = str(tmp_path / "fx")
    spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    spark_pdf = QUERIES[qname](spark, d).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    oracle_pdf = con.sql(ORACLE_SQL[qname]).df()
    assert_frames_match(spark_pdf, oracle_pdf)
    return spark_pdf


def test_time_boundary_oracle_parity(spark, tmp_path):
    """Sub-second-straddling gaps around every window boundary the
    ADVICE flagged: 5-min dup window (q349), 24-h conversion window
    (q346), 30-min session gap (q329), minute-floor staleness (q345).
    Each plants a pair whose true gap differs from its second-truncated
    gap on which side of the boundary it lands; Spark and the DuckDB
    oracle must agree exactly."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0, 400_000)  # .4s fraction

    # q349: same user+amount, gaps 299.8s (dup), 300.3s (NOT dup — but a
    # second-floor diff would say 300 <= 300 and flag it), 300.9s.
    rows = [
        (1, "purchase", 1, base, 10.00),
        (2, "purchase", 1, base + dt.timedelta(seconds=299, microseconds=800_000), 10.00),
        (3, "purchase", 2, base, 5.00),
        (4, "purchase", 2, base + dt.timedelta(seconds=300, microseconds=300_000), 5.00),
        (5, "purchase", 3, base, 7.00),
        (6, "purchase", 3, base + dt.timedelta(seconds=300, microseconds=900_000), 7.00),
    ]
    pdf = _plant_events_and_compare(spark, tmp_path, "q349_duplicate_payments", rows)
    assert int(pdf.n_suspect.iloc[0]) == 1  # only the 299.8s pair

    # q346: view→purchase gaps 86399.8s (converts), 86400.3s (does not,
    # though the floored diff is exactly 86400).
    rows = [
        (1, "view", 1, base, None),
        (2, "purchase", 1, base + dt.timedelta(seconds=86399, microseconds=800_000), 3.0),
        (3, "view", 2, base, None),
        (4, "purchase", 2, base + dt.timedelta(seconds=86400, microseconds=300_000), 3.0),
    ]
    pdf = _plant_events_and_compare(spark, tmp_path, "q346_conversion_window", rows)
    assert int(pdf.n_converted.iloc[0]) == 1

    # q329: events 1799.7s then 1800.4s apart — the second gap crosses
    # the 30-min session boundary only in fractional arithmetic.
    rows = [
        (1, "view", 1, base, None),
        (2, "click", 1, base + dt.timedelta(seconds=1799, microseconds=700_000), None),
        (3, "view", 1, base + dt.timedelta(seconds=3600, microseconds=100_000), None),
        (4, "click", 1, base + dt.timedelta(seconds=3600, microseconds=200_000), None),
        (5, "purchase", 1, base + dt.timedelta(seconds=3600, microseconds=300_000), 1.0),
    ]
    pdf = _plant_events_and_compare(spark, tmp_path, "q329_session_trigrams", rows)
    # second session holds the only trigram (view,click,purchase)
    assert len(pdf) == 1 and pdf.n.iloc[0] == 1

    # q345: type 'b' max is 90.7s older than global max — floor to 1
    # minute; truncated-seconds arithmetic would compute floor(90/60)=1
    # too, so ALSO plant 119.8s (fractional floor 1, truncated floor 1)
    # and 60.2s (fractional 1, truncated-diff floor(60/60)=1)... the
    # discriminating case: global max has .4s, type max has .9s →
    # truncated diff overstates by 1s across a minute boundary.
    rows = [
        (1, "view", 1, base + dt.timedelta(seconds=500), None),
        (2, "click", 1, base + dt.timedelta(seconds=500 - 60, microseconds=100_000), None),
        (3, "view", 2, base, None),
        (4, "click", 2, base + dt.timedelta(seconds=100), None),
        # trailing-week volume rows so the trail7 inner join is non-empty
        (5, "view", 3, base - dt.timedelta(days=3), None),
        (6, "click", 3, base - dt.timedelta(days=3, seconds=50), None),
        (7, "view", 4, base - dt.timedelta(days=5), None),
        (8, "click", 4, base - dt.timedelta(days=5, seconds=50), None),
    ]
    pdf = _plant_events_and_compare(spark, tmp_path, "q345_freshness_monitor", rows)
    stale = {r.event_type: int(r.staleness_minutes) for r in pdf.itertuples()}
    # click max = base+440.1s, view max (global) = base+500s → gap 59.9s
    # → 0 minutes fractionally; truncated diff would give floor(60/60)=1.
    assert stale == {"view": 0, "click": 0}


def test_hot_gram_guard_engages_and_is_output_invariant(spark, tmp_path):
    """Round-9 VERDICT #1: the unframed Window.partitionBy('g') in
    q311's duplicate-tagging stage was the repo's last documented-but-
    unguarded skew path.  On a planted mega-gram corpus (one 15-token
    phrase in 80% of docs — every one of its 8 constituent 8-grams
    occurs in ~160 docs) the auto guard must (a) measure the hot share
    over the bar and route through the groupBy+join form (map-side
    partial aggregation collapses the hot key BEFORE the shuffle, so no
    task buffers the mega-gram's occurrence list), and (b) produce
    BIT-IDENTICAL (doc_id, p) hits to the window form — the fallback is
    a physical strategy, never a semantics change.  On a distinct-gram
    corpus the guard must stay on the window form, keeping registered
    plans (and their budget snapshots) unchanged."""
    from pyspark.sql import functions as F

    from udacity_datalake_spark_spark.plans.wave47 import (
        SPAN_W,
        _probe_hot,
        cross_doc_dup_hits,
    )

    rng = np.random.default_rng(23)
    phrase = " ".join(f"hot{j}" for j in range(15))
    rows = []
    for i in range(200):
        filler = " ".join(f"u{i}w{j}" for j in range(10))
        text = filler + " " + phrase if i % 5 != 0 else filler + " " + " ".join(
            str(x) for x in rng.integers(0, 10**6, size=15)
        )
        rows.append((i, text, f"s{i % 2}"))
    d = _write_docs(spark, tmp_path, rows)

    docs = (
        read_table(spark, d, "documents", columns=["doc_id", "source", "text"])
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .where(F.size("w") >= SPAN_W)
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_W}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {SPAN_W})))"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "g")

    # the probe itself must see the skew: the mega-gram occurs in 160
    # of 200 docs (80% doc-frequency >> the 5% bar and the 32 floor)
    assert _probe_hot(grams) is True

    window_form = cross_doc_dup_hits(docs, grams, hot_gram_guard=False)
    fallback = cross_doc_dup_hits(docs, grams, hot_gram_guard=True)
    auto = cross_doc_dup_hits(docs, grams, hot_gram_guard="auto")

    # auto must have routed through the fallback: no Window node on the
    # gram key anywhere in its optimized plan
    auto_plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in auto_plan, "auto kept the window form on a hot corpus"
    want = sorted((r.doc_id, r.p) for r in window_form.collect())
    assert sorted((r.doc_id, r.p) for r in fallback.collect()) == want
    assert sorted((r.doc_id, r.p) for r in auto.collect()) == want
    assert len(want) > 0, "planted corpus must produce duplicate hits"

    # distinct-gram corpus: auto stays on the window form (registered
    # q311 plan unchanged on driver fixtures — snapshot green)
    rows2 = [
        (i, " ".join(f"v{i}x{j}" for j in range(20)), "s0") for i in range(300)
    ]
    d2 = _write_docs(spark, tmp_path / "d2", rows2)
    docs2 = (
        read_table(spark, d2, "documents", columns=["doc_id", "source", "text"])
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .where(F.size("w") >= SPAN_W)
    )
    grams2 = docs2.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_W}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {SPAN_W})))"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "g")
    auto2 = cross_doc_dup_hits(docs2, grams2, hot_gram_guard="auto")
    assert "Window" in auto2._jdf.queryExecution().optimizedPlan().toString()


def test_hot_gram_memo_refingerprints_on_in_place_rewrite(spark, tmp_path):
    """Round-10 VERDICT #3: the q311 guard-decision memo keys on the
    dataset FINGERPRINT (documents.parquet mtime/size), not the sf_dir
    string — a fixture REWRITTEN at the same path must re-decide by
    itself, with no manual clear_hot_gram_memo().  Planted: a benign
    distinct-gram corpus decides False; the same path rewritten with the
    mega-gram corpus changes the fingerprint and decides True."""
    from udacity_datalake_spark_spark.plans import wave47

    wave47.clear_hot_gram_memo()
    benign = [
        (i, " ".join(f"v{i}x{j}" for j in range(20)), "s0") for i in range(300)
    ]
    d = _write_docs(spark, tmp_path, benign)
    fp1 = wave47._dataset_fingerprint(d)
    wave47.q311_exact_substring_spans(spark, d).collect()
    assert wave47._HOT_GRAM_MEMO == {fp1: False}

    # rewrite IN PLACE: one 15-token phrase in 80% of docs (every
    # constituent 8-gram is a mega-gram, far over the doc-share bar)
    phrase = " ".join(f"hot{j}" for j in range(15))
    hot = []
    for i in range(200):
        filler = " ".join(f"u{i}w{j}" for j in range(10))
        text = (
            filler + " " + phrase
            if i % 5 != 0
            else filler + " " + " ".join(f"z{i}y{j}" for j in range(15))
        )
        hot.append((i, text, f"s{i % 2}"))
    _write_docs(spark, tmp_path, hot)
    fp2 = wave47._dataset_fingerprint(d)
    assert fp2 != fp1, "in-place rewrite must change the dataset fingerprint"
    out = wave47.q311_exact_substring_spans(spark, d)
    pdf = out.toPandas()
    # the guard RE-DECIDED on the new data — no stale False reused
    assert wave47._HOT_GRAM_MEMO[fp2] is True
    assert set(wave47._HOT_GRAM_MEMO) == {fp1, fp2}
    # second run on the rewritten data takes the memo-hit path and
    # agrees with the probed run
    pdf2 = wave47.q311_exact_substring_spans(spark, d).toPandas()
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(
        map(tuple, pdf2.values.tolist())
    )
    wave47.clear_hot_gram_memo()


def test_link_prediction_dense_equals_wedge(spark):
    """The gated dense (driver-matmul) and distributed (wedge-join)
    forms of link_prediction_topk must produce IDENTICAL rows — the
    q319 oracle pins whichever path the gate picks, so path equality is
    the invariant that makes the gate a pure performance decision
    (round 11; the union-find-gate pattern applied to common-neighbor
    counting).  Planted graph with common-neighbor ties so the
    (n_common DESC, x, y) tie-break is exercised on both paths."""
    from udacity_datalake_spark_spark.plans.wave49 import link_prediction_topk

    # K4 on {1,2,3,4} plus a path 4-5, 5-6, 6-7 and an isolated edge 8-9:
    # non-adjacent pairs with shared neighbors at several counts + ties
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7), (8, 9)],
        "u long, w long",
    )
    dense = link_prediction_topk(spark, edges, k=20)
    wedge = link_prediction_topk(
        spark, edges, k=20, dense_gate_edges=0  # force the distributed path
    )
    assert dense.schema == wedge.schema
    assert [tuple(r) for r in dense.collect()] == [tuple(r) for r in wedge.collect()]
    # sanity: (1,5),(2,5),(3,5) share neighbor 4; (4,6) shares 5 …
    got = {(r["x"], r["y"]): r["n_common"] for r in dense.collect()}
    assert got[(1, 5)] == 1 and got[(4, 6)] == 1 and (1, 2) not in got
