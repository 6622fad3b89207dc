"""Property tests for the non-SQL-expressible operators (the driver only
rows-checks these, so the real guarantees are proven here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.dedup import exact_dedup
from udacity_datalake_spark_spark.plans import QUERIES
from udacity_datalake_spark_spark.sources.readers import read_table


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


def _planted_pairs(spark, sf_dir):
    """The corpus's planted near-dup pairs per the exact Jaccard operator."""
    return {
        (r.d1, r.d2)
        for r in QUERIES["q45_ngram_jaccard"](spark, sf_dir).collect()
    }


def test_minhash_lsh_equals_exact(spark, sf_dir):
    exact = QUERIES["q45_ngram_jaccard"](spark, sf_dir).collect()
    lsh = QUERIES["q46_minhash_lsh"](spark, sf_dir).collect()
    assert {(r.d1, r.d2, r.jaccard) for r in lsh} == {(r.d1, r.d2, r.jaccard) for r in exact}
    assert len(exact) > 0, "corpus should contain planted near-dups"


def test_simhash_recovers_planted_pairs(spark, sf_dir):
    from udacity_datalake_spark_spark.operators.dedup import simhash_near_pairs

    planted = _planted_pairs(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents")
    sim_pairs = {
        (r.d1, r.d2)
        for r in simhash_near_pairs(d, "doc_id", "text", max_hamming=7).collect()
    }
    # word-level near-dups differ in a few tokens → small (not zero)
    # Hamming gap; the radius-7 banding recovers the bulk of them
    recovered = planted & sim_pairs
    assert len(recovered) >= 0.75 * len(planted), (
        f"simhash recovered {len(recovered)}/{len(planted)} planted pairs"
    )


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    from udacity_datalake_spark_spark.operators.similarity import hyperplane_lsh_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = QUERIES["q48_embedding_topk"](spark, sf_dir).collect()
    approx = hyperplane_lsh_topk(
        emb, queries, k=5, n_tables=16, bits_per_table=4
    ).collect()
    exact_set = {(r.qid, r.nid) for r in exact}
    approx_set = {(r.qid, r.nid) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 16 tables × 4 bits on gaussian vectors → expected recall ≈0.9;
    # floor at 0.5 (far above the ≈1% chance rate)
    assert recall >= 0.5, f"ANN recall {recall:.2f} below floor"
    # every approx hit must be internally consistent
    for r in approx:
        assert 1 <= r.rank <= 5 and r.sim <= 1.0 + 1e-9


def test_exact_dedup_keeps_min_id(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    deduped = exact_dedup(doubled, "doc_id", "text")
    assert deduped.count() == docs.count()
    assert deduped.agg(F.max("doc_id")).first()[0] < 1_000_000  # survivor = smallest id


def test_multimodal_digest_matches_python(spark, sf_dir):
    import hashlib

    row = (
        QUERIES["q50_multimodal_features"](spark, sf_dir)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    text = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") == row.doc_id)
        .select("text")
        .first()[0]
    )
    assert row.digest == hashlib.md5(text.encode()).hexdigest()
    assert row.payload_bytes == len(text.encode())


def test_resize_payload_batch_shape(spark, sf_dir):
    from udacity_datalake_spark_spark.operators.multimodal import resize_payload, with_binary_payload
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = with_binary_payload(read_table(spark, sf_dir, "documents")).limit(20)
    out = resize_payload(d, factor=4).collect()
    src = {r.doc_id: r.text for r in read_table(spark, sf_dir, "documents").limit(20).collect()}
    assert len(out) == 20
    for r in out:
        expected = src[r.doc_id].encode("utf-8")[::4]
        assert bytes(r.payload) == expected and r.n_bytes == len(expected)


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    from udacity_datalake_spark_spark.plans import QUERIES

    from udacity_datalake_spark_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = QUERIES["q48_embedding_topk"](spark, sf_dir).collect()
    approx = ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4).collect()
    exact_set = {(r.qid, r.nid) for r in exact}
    approx_set = {(r.qid, r.nid) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 4/16 data-adapted cells on weak-neighbor gaussians; floor is
    # deliberately conservative — determinism matters more than the value
    assert recall >= 0.4, f"IVF recall {recall:.2f} below floor"
    # determinism: second run identical
    approx2 = {
        (r.qid, r.nid)
        for r in ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4).collect()
    }
    assert approx_set == approx2


def test_hll_rollup_merge_equals_direct(spark, sf_dir):
    """Unioning per-(lang, source) sketches must estimate the same
    cardinality as sketching each lang directly (mergeability), and the
    rollup must be deterministic across runs."""
    d = read_table(spark, sf_dir, "documents")

    def rollup():
        per_source = d.groupBy("lang", "source").agg(F.hll_sketch_agg("text").alias("sk"))
        return {
            r.lang: r.est
            for r in per_source.groupBy("lang")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()
        }

    rolled, rolled2 = rollup(), rollup()
    assert rolled == rolled2, "HLL rollup must be deterministic"

    # and q96's driver-facing tolerance band must actually hold
    q96 = QUERIES["q96_hll_rollup"](spark, sf_dir).collect()
    assert q96 and all(r.est_within_5pct for r in q96)
    direct = {
        r.lang: r.est
        for r in d.groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("text")).alias("est"))
        .collect()
    }
    assert rolled == direct, "sketch union must equal direct sketching"

    exact = {r.lang: r.n for r in d.groupBy("lang").agg(F.count_distinct("text").alias("n")).collect()}
    for lang, est in rolled.items():
        assert abs(est - exact[lang]) <= max(3, 0.05 * exact[lang]), (
            f"{lang}: HLL estimate {est} too far from exact {exact[lang]}"
        )


def test_kmeans_clusters_deterministic_and_complete(spark, sf_dir):
    """q103: seeded k-means must partition every vector exactly once and
    produce identical cluster memberships on a rerun (fixed seed, no RNG
    state).  Checks the raw kmeans_assign frame (q103's registered output
    is the invariant summary the oracle pins — asserted below too)."""
    from udacity_datalake_spark_spark.operators.similarity import kmeans_assign

    e = read_table(spark, sf_dir, "embeddings")
    run1 = {r.vec_id: r.cluster_id for r in kmeans_assign(e, n_cells=8, seed=42).collect()}
    run2 = {r.vec_id: r.cluster_id for r in kmeans_assign(e, n_cells=8, seed=42).collect()}
    assert run1 == run2, "k-means assignment must be deterministic"
    total = e.count()
    assert len(run1) == total, "every vector in exactly one cluster"
    assert len(set(run1.values())) > 1, "more than one non-empty cluster expected"

    row = QUERIES["q103_embedding_clusters"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_vectors == total
    assert r.all_assigned_exactly_once and r.n_clusters_in_range
    assert r.centroids_deterministic


def test_perceptual_hash_pairs_identical_payloads(spark):
    """Identical payloads → identical phash → paired at Hamming 0; a
    clearly different payload stays unpaired at radius 3.  Signatures are
    deterministic across invocations."""
    from udacity_datalake_spark_spark.operators.dedup import hamming_band_pairs
    from udacity_datalake_spark_spark.operators.multimodal import (
        perceptual_hash64,
        with_binary_payload,
    )

    rows = [
        (1, "aaab " * 40),
        (2, "aaab " * 40),          # exact copy of 1
        (3, "zz 9 ! " * 55),        # different content/shape
    ]
    df = with_binary_payload(spark.createDataFrame(rows, "doc_id long, text string"))
    sig1 = {r.doc_id: r.phash for r in perceptual_hash64(df).collect()}
    sig2 = {r.doc_id: r.phash for r in perceptual_hash64(df).collect()}
    assert sig1 == sig2  # deterministic
    assert sig1[1] == sig1[2]
    pairs = {
        (r.d1, r.d2): r.hamming
        for r in hamming_band_pairs(perceptual_hash64(df), "doc_id", "phash", 3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_frame_energy_rejects_non_mono16(spark):
    """A stereo or 8-bit WAV payload must fail loudly (ValueError),
    never silently mis-frame — round-2 advice item."""
    import io
    import wave as wavmod

    import pytest

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo — violates the mono 16-bit contract
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 64)
    from udacity_datalake_spark_spark.operators.multimodal import audio_frame_energy

    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="mono 16-bit"):
        audio_frame_energy(df).collect()


def test_near_dup_lsh_prefilter_subset_and_recall(spark, sf_dir):
    """The LSH-prefiltered near-dup path must be a subset of the exact
    broadcast path (same verify kernel ⇒ no false positives) with high
    recall at the q56 threshold, and must never pull the corpus to the
    driver (that is its whole reason to exist)."""
    import pyspark.sql as pssql

    from udacity_datalake_spark_spark.operators.similarity import cosine_near_dup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_near_dup_pairs(emb, prefilter="broadcast").collect()
    }

    orig = pssql.DataFrame.toPandas
    pssql.DataFrame.toPandas = _forbidden_to_pandas
    try:
        lsh_rows = cosine_near_dup_pairs(emb, prefilter="lsh").collect()
    finally:
        pssql.DataFrame.toPandas = orig

    lsh = {(r.id_a, r.id_b): r.sim for r in lsh_rows}
    assert set(lsh) <= set(exact), "LSH prefilter produced a pair the exact path lacks"
    for pair, sim in lsh.items():
        assert abs(sim - exact[pair]) <= 1e-5, (pair, sim, exact[pair])
    recall = len(lsh) / len(exact) if exact else 1.0
    assert len(exact) > 0, "fixture should contain near-dup pairs at 0.45"
    assert recall >= 0.85, f"LSH near-dup recall {recall:.2f} below floor"


def _forbidden_to_pandas(self):
    raise AssertionError("toPandas() called on the LSH near-dup path")


def test_near_dup_broadcast_tiling_bit_identical(spark, sf_dir):
    """The broadcast kernel tiles its matmul over rows × columns so peak
    memory per task is constant in corpus size (round 8: the untiled
    batch×n block hit ×2.8 sec-per-pair at n=63k — SKEW_SF1.json).
    Tiling splits M/N, never the K reduction, so pair frames must be
    BIT-identical for any tile size — exercised here with tiles far
    smaller than the corpus so every boundary path runs (partial last
    tile, empty tiles, cross-tile id masking)."""
    from udacity_datalake_spark_spark.operators.similarity import cosine_near_dup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    untiled = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_near_dup_pairs(
            emb, prefilter="broadcast", row_tile=10**9, col_tile=10**9
        ).collect()
    }
    tiled = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_near_dup_pairs(
            emb, prefilter="broadcast", row_tile=3, col_tile=7
        ).collect()
    }
    assert len(untiled) > 0, "fixture should contain near-dup pairs"
    assert tiled == untiled, "tiling changed the emitted pair frame"


def test_near_dup_auto_picks_lsh_above_threshold(spark, sf_dir):
    """auto mode must route above-broadcast-scale corpora to the LSH
    path — asserted by forbidding driver-side collection entirely."""
    import pyspark.sql as pssql

    from udacity_datalake_spark_spark.operators.similarity import cosine_near_dup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    orig = pssql.DataFrame.toPandas
    pssql.DataFrame.toPandas = _forbidden_to_pandas
    try:
        rows = cosine_near_dup_pairs(emb, prefilter="auto", broadcast_rows=1).collect()
    finally:
        pssql.DataFrame.toPandas = orig
    assert len(rows) > 0


def test_png_decode_matches_ppm_decode(spark, sf_dir):
    """PNG and PPM payloads share the pixel formula, so decoding both
    must give identical (width, height, channel-sum) stats — the
    cross-format consistency check on the full stdlib PNG codec pair
    (deflate + CRC + None/Sub/Up filters actually applied at encode)."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_png_payload,
        synthesize_ppm_payload,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id").limit(60)
    png = {
        r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in decode_media(synthesize_png_payload(d), "png").collect()
    }
    ppm = {
        r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in decode_media(synthesize_ppm_payload(d), "ppm").collect()
    }
    assert png == ppm and len(png) == 60
    # the synthesizer's (id + row) % 3 rule covers all three filter types
    # across 60 consecutive ids — the unfiltering paths all ran


def test_png_decode_rejects_corrupt_crc(spark):
    """A flipped payload byte must fail the chunk CRC check loudly."""
    import pytest

    from udacity_datalake_spark_spark.operators.multimodal import (
        decode_media,
        synthesize_png_payload,
    )

    d = spark.createDataFrame([(5,)], "doc_id long")
    payload = bytearray(synthesize_png_payload(d).first().payload)
    # IDAT body starts at 41: 8-byte signature + 25-byte IHDR chunk +
    # 8-byte IDAT length/type (byte 40 was the last byte of the chunk-type
    # field, so the old test corrupted the header, not the body)
    payload[44] ^= 0xFF  # inside IDAT compressed body
    bad = spark.createDataFrame([(5, bytes(payload))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="CRC mismatch"):
        decode_media(bad, "png").collect()


def _clustered_embeddings(spark, n=600, mega_frac=0.3, dim=64, seed=11):
    """Synthetic clustered corpus: one tight mega-cluster holding
    mega_frac of vectors (the adversarial ANN shape — a hot direction
    cone), the rest spread over 7 looser clusters."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((8, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n_mega = int(n * mega_frac)
    rows = []
    for i in range(n):
        if i < n_mega:
            c, sigma = centers[0], 0.02  # tight: same sign pattern
        else:
            c, sigma = centers[1 + i % 7], 0.3
        v = c + sigma * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v.astype("float32")], int(i >= n_mega)))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_lsh_bucket_stats_flags_mega_cluster(spark):
    """The occupancy diagnostic must expose a hot direction cone: a
    tight cluster holding 30% of vectors shares one sign pattern, so
    every table reports max_bucket >= the cluster size."""
    from udacity_datalake_spark_spark.operators.similarity import lsh_bucket_stats

    emb = _clustered_embeddings(spark).persist()
    stats = lsh_bucket_stats(emb, n_tables=8, bits_per_table=4).collect()
    assert len(stats) == 8
    n_mega = int(600 * 0.3)
    # a plane can slice through even a tight cone, so not EVERY table
    # keeps the cluster whole — but most do, and the hot tables show the
    # quadratic fan-out the guard exists to catch
    hot = [r for r in stats if r.max_bucket >= 0.9 * n_mega]
    assert len(hot) >= len(stats) // 2, [r.max_bucket for r in stats]
    for r in hot:
        assert r.candidate_pairs >= (r.max_bucket * (r.max_bucket - 1)) // 2, r


def test_lsh_bucket_cap_bounds_candidates_keeps_recall(spark):
    """With max_bucket_rows set, oversized buckets sub-split: the
    candidate fan-out must drop well below the uncapped blowup while
    genuinely-near pairs (the tight mega-cluster IS mutually near) keep
    high recall — each table sub-splits differently, so a pair split
    apart in one table still collides in another."""
    from udacity_datalake_spark_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = _clustered_embeddings(spark).persist()
    uncapped = cosine_near_dup_pairs(
        emb, threshold=0.9, prefilter="lsh", n_tables=8, bits_per_table=4
    )
    capped = cosine_near_dup_pairs(
        emb,
        threshold=0.9,
        prefilter="lsh",
        n_tables=8,
        bits_per_table=4,
        max_bucket_rows=60,
    )
    exact = cosine_near_dup_pairs(emb, threshold=0.9, prefilter="broadcast")
    exact_set = {(r.id_a, r.id_b) for r in exact.collect()}
    capped_set = {(r.id_a, r.id_b) for r in capped.collect()}
    uncapped_set = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert exact_set, "fixture should contain near pairs"
    # capped output is a subset of the exact truth (verify step is exact)
    assert capped_set <= exact_set
    assert len(capped_set) >= 0.9 * len(uncapped_set & exact_set), (
        len(capped_set),
        len(uncapped_set & exact_set),
    )


def _boilerplate_corpus(spark):
    """200 docs: 60 exact copies of a license header (the identical
    mega-group no hash can split), 60 near-identical variants (the
    J≈0.9 boilerplate regime the bucket cap sub-splits), 80 unrelated
    docs.  Deterministic by construction."""
    lic = " ".join(f"lic{w}" for w in range(40))
    rows = [(i, lic) for i in range(60)]
    for i in range(60, 120):
        # tweak 2 of 40 tokens -> 3-gram Jaccard ~ 0.75-0.8, distinct sigs
        words = [f"lic{w}" for w in range(40)]
        words[10] = f"var{i}"
        words[30] = f"alt{i}"
        rows.append((i, " ".join(words)))
    for i in range(120, 200):
        rows.append((i, " ".join(f"doc{i}tok{w}" for w in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_band_stats_flags_identical_cluster(spark):
    """The MinHash occupancy diagnostic must expose an identical-text
    mega-group: 60 identical docs share their whole signature, so EVERY
    band reports max_bucket >= 60 with the quadratic candidate count."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_band_stats

    d = _boilerplate_corpus(spark).persist()
    stats = minhash_band_stats(d, "doc_id", "text").collect()
    assert len(stats) == 32
    for r in stats:
        assert r.max_bucket >= 60, r
        assert r.candidate_pairs >= (60 * 59) // 2, r
    d.unpersist()


def test_minhash_collapse_exact_star_preserves_components(spark):
    """collapse_exact must turn the identical group's C(60,2)=1770 pairs
    into 59 star rows while leaving the connected-component partition —
    what the q95/q195 dedup pipelines consume — bit-identical."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components

    d = _boilerplate_corpus(spark).persist()
    full = minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    collapsed = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, threshold=0.6, collapse_exact=True
    )

    def comp_map(edges):
        return {
            (r.node, r.component)
            for r in connected_components(edges, src="d1", dst="d2").collect()
        }

    full_rows = full.collect()
    col_rows = collapsed.collect()
    mega = {i for i in range(60)}
    n_mega_full = sum(1 for r in full_rows if r.d1 in mega and r.d2 in mega)
    n_mega_col = sum(1 for r in col_rows if r.d1 in mega and r.d2 in mega)
    assert n_mega_full == (60 * 59) // 2  # quadratic without the guard
    assert n_mega_col == 59               # star with it
    assert comp_map(full) == comp_map(collapsed)
    d.unpersist()


def test_minhash_auto_collapse_gate(spark):
    """collapse_exact="auto" (round-7 VERDICT #4) routes by the MEASURED
    duplicate share: on a 30%-identical corpus (the expected 100 TB
    crawl regime) it must take the star collapse — 59 star rows for the
    mega-group, never C(60,2) — with the dedup survivors (connected-
    component partition) byte-identical to guards-off; on an all-
    distinct corpus the gate must skip the collapse entirely, producing
    the exact same plan as collapse_exact=False (no +15% fingerprint
    overhead)."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs
    from udacity_datalake_spark_spark.operators.graph import connected_components

    # 30%-identical corpus: auto must collapse
    d = _boilerplate_corpus(spark).persist()
    auto = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, threshold=0.6, collapse_exact="auto"
    )
    off = minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    auto_rows = auto.collect()
    mega = set(range(60))
    n_mega_auto = sum(1 for r in auto_rows if r.d1 in mega and r.d2 in mega)
    assert n_mega_auto == 59, "auto did not route through the star collapse"

    def comp_map(edges):
        return {
            (r.node, r.component)
            for r in connected_components(edges, src="d1", dst="d2").collect()
        }

    assert comp_map(auto) == comp_map(off)
    d.unpersist()
    spark.catalog.clearCache()

    # all-distinct corpus: auto must skip — identical plan to guards-off
    rows = [(i, " ".join(f"doc{i}tok{w}" for w in range(30))) for i in range(200)]
    dd = spark.createDataFrame(rows, "doc_id long, text string").persist()
    import re

    def norm_plan(df):
        # strip auto-incremented expression ids (#1234) — structural
        # plan equality is what the gate promises, not id equality
        return re.sub(
            r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
        )

    auto_plan = norm_plan(
        minhash_lsh_pairs(
            dd, "doc_id", "text", n=3, threshold=0.6, collapse_exact="auto"
        )
    )
    off_plan = norm_plan(minhash_lsh_pairs(dd, "doc_id", "text", n=3, threshold=0.6))
    assert auto_plan == off_plan, "auto gate added plan overhead on distinct corpus"
    dd.unpersist()
    spark.catalog.clearCache()


def test_ngram_jaccard_collapse_exact_output_invariant(spark):
    """ngram_jaccard_pairs(collapse_exact=True) must reproduce the EXACT
    pair set of the base path — unlike the minhash star collapse, the
    q45 contract is the full pair list, so the collapse verifies each
    distinct-text pair once and fans back out through group membership
    (round 8, SKEW_SF1.json: 463 s -> re-verified-once at 50 k docs).
    Planted corpus covers every expansion path: intra-group all-pairs
    (jaccard exactly 1.0), cross-group products between two dup groups,
    dup-group x unique-text pairs, id-order flips across groups, and a
    below-shingle-floor dup group that must vanish entirely."""
    from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs

    ta = " ".join(f"tok{w}" for w in range(20))
    tb = ta + " tail0"                      # near-dup of A (J ~ 18/20)
    rows = []
    rows += [(100 + i, ta) for i in range(8)]          # group A (8 copies)
    rows += [(50 + i, tb) for i in range(5)]           # group B (5 copies)
    rows += [(200 + i, " ".join(f"u{i}w{w}" for w in range(15))) for i in range(20)]
    rows += [(300 + i, "too short") for i in range(4)]  # < n tokens: excluded
    rows.append((400, ta + " tail0 tail1"))             # unique near-dup of B
    d = spark.createDataFrame(rows, "doc_id long, text string").persist()

    def pairset(df):
        return {(r.d1, r.d2, round(r.jaccard, 9)) for r in df.collect()}

    base = pairset(ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6))
    coll = pairset(
        ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.6, collapse_exact=True
        )
    )
    assert base, "fixture should contain qualifying pairs"
    assert coll == base, "collapse changed the pair set"
    # intra-A all-pairs at jaccard exactly 1.0
    intra_a = {(a, b, 1.0) for a in range(100, 108) for b in range(a + 1, 108)}
    assert intra_a <= coll
    # cross-group A x B pairs exist and flipped id order (B ids < A ids)
    # was handled — d1 < d2 must hold everywhere
    assert any(p[0] in range(50, 55) and p[1] in range(100, 108) for p in coll)
    assert all(p[0] < p[1] for p in coll)
    # the short-text dup group contributed nothing
    assert not any(p[0] >= 300 and p[0] < 310 for p in coll)
    d.unpersist()
    spark.catalog.clearCache()

    # auto gate: on an all-distinct corpus the plan must be identical to
    # collapse-off (no fingerprint overhead) — same promise as minhash
    import re

    rows = [(i, " ".join(f"doc{i}tok{w}" for w in range(30))) for i in range(200)]
    dd = spark.createDataFrame(rows, "doc_id long, text string").persist()

    def norm_plan(df):
        return re.sub(
            r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
        )

    auto_plan = norm_plan(
        ngram_jaccard_pairs(
            dd, "doc_id", "text", n=3, threshold=0.6, collapse_exact="auto"
        )
    )
    off_plan = norm_plan(ngram_jaccard_pairs(dd, "doc_id", "text", n=3, threshold=0.6))
    assert auto_plan == off_plan, "auto gate added plan overhead on distinct corpus"
    dd.unpersist()
    spark.catalog.clearCache()


def test_minhash_bucket_cap_bounds_candidates_keeps_recall(spark):
    """max_bucket_rows sub-splits hot DISTINCT-signature buckets by a
    similarity-sensitive secondary (next band's first minhash row):
    capped output stays a subset of the exact-verified uncapped truth
    with >=90% retention, and the identical group (same signature ->
    same secondary) keeps ALL its pairs."""
    from udacity_datalake_spark_spark.operators.dedup import minhash_lsh_pairs

    d = _boilerplate_corpus(spark).persist()
    uncapped = minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.6)
    capped = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, threshold=0.6, max_bucket_rows=30
    )
    un = {(r.d1, r.d2) for r in uncapped.collect()}
    cap = {(r.d1, r.d2) for r in capped.collect()}
    assert un, "fixture should contain near pairs"
    assert cap <= un
    assert len(cap) >= 0.9 * len(un), (len(cap), len(un))
    mega_pairs = {(a, b) for (a, b) in un if a < 60 and b < 60}
    assert mega_pairs <= cap
    d.unpersist()
