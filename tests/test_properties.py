"""Property-based equivalence: each composite operator rewrite must equal
its naive formulation on ARBITRARY inputs, not just the fixtures — the
rewrites (OR-join decomposition, salting, range bucketing, as-of union)
are only worth shipping if they're semantics-preserving everywhere.

Hypothesis generates small frames (Spark job per example — keep
max_examples low); deadline disabled because JVM scheduling jitter
dwarfs any per-example bound.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.joins import (
    asof_join,
    left_join_or,
    range_band_join,
    hot_key_salted_join,
    salted_join,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

names = st.sampled_from(["a", "b", "c", None])
locs = st.sampled_from(["x", "y", None])


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


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@given(
    left=st.lists(st.tuples(st.integers(0, 9), names, locs), min_size=0, max_size=6),
    right=st.lists(st.tuples(st.integers(10, 19), names, locs), min_size=0, max_size=6),
)
@SETTINGS
def test_left_join_or_property(spark, left, right):
    l = spark.createDataFrame(left, "lid int, lname string, lloc string") if left else None
    r = spark.createDataFrame(right, "rid int, rname string, rloc string") if right else None
    if l is None or r is None:
        return
    cond1, cond2 = F.col("lname") == F.col("rname"), F.col("lloc") == F.col("rloc")
    assert _rows(left_join_or(l, r, cond1, cond2)) == _rows(l.join(r, cond1 | cond2, "left"))


@given(
    fact=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=8),
    dim=st.lists(st.tuples(st.integers(0, 3), st.text("AB", min_size=1, max_size=2)), min_size=0, max_size=4),
    how=st.sampled_from(["inner", "left"]),
)
@SETTINGS
def test_salted_join_property(spark, fact, dim, how):
    if not fact or not dim:
        return
    # salting assumes dim keys unique (a dim); dedup to hold the invariant
    dim = list({k: (k, t) for k, t in dim}.values())
    f = spark.createDataFrame(fact, "k int, v int")
    d = spark.createDataFrame(dim, "k int, tag string")
    plain = f.join(d, "k", how)
    salted = salted_join(f, d, key="k", n_salt=3, how=how)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


@given(
    vals=st.lists(st.floats(0, 100, allow_nan=False), min_size=0, max_size=8),
    bands=st.lists(
        st.tuples(st.floats(0, 90, allow_nan=False), st.floats(1, 40, allow_nan=False)),
        min_size=0,
        max_size=4,
    ),
)
@SETTINGS
def test_range_band_join_property(spark, vals, bands):
    if not vals or not bands:
        return
    band_rows = [(f"b{i}", lo, lo + width) for i, (lo, width) in enumerate(bands)]
    f = spark.createDataFrame([(v,) for v in vals], "val double")
    b = spark.createDataFrame(band_rows, "name string, lo double, hi double")
    naive = f.join(b, (F.col("val") >= F.col("lo")) & (F.col("val") < F.col("hi")))
    bucketed = range_band_join(f, b, value_col="val", bucket_width=7.0)
    assert _rows(bucketed.select(*naive.columns)) == _rows(naive)


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=0, max_size=6),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 9)),
        min_size=0,
        max_size=6,
    ),
)
@SETTINGS
def test_asof_join_property(spark, left, right):
    """asof_join equals the naive 'max right_ts <= left_ts' correlated
    lookup. Right side deduped per (key, ts) to make the tie defined."""
    if not left:
        return
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    l = spark.createDataFrame(left, "k int, t int")
    r = spark.createDataFrame(right or [(99, 0, 0)], "k int, rt int, payload int")
    got = {
        (row.k, row.t): row.payload
        for row in asof_join(l, r, on=["k"], left_ts="t", right_ts="rt").collect()
    }
    rmap: dict[int, list[tuple[int, int]]] = {}
    for k, rt, payload in right or []:
        rmap.setdefault(k, []).append((rt, payload))
    for k, t in left:
        match = max(((rt, p) for rt, p in rmap.get(k, []) if rt <= t), default=None)
        assert got[(k, t)] == (match[1] if match else None), (k, t, got[(k, t)], match)


@given(
    fact=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=10),
    dim=st.lists(st.tuples(st.integers(0, 3), st.text("AB", min_size=1, max_size=2)), min_size=0, max_size=4),
    how=st.sampled_from(["inner", "left"]),
)
@SETTINGS
def test_hot_key_salted_join_property(spark, fact, dim, how):
    """hot-key salting ≡ plain join for any skew profile, including the
    all-hot (sample_fraction=1, hot_fraction tiny → every key hot) and
    no-hot (threshold above every count) regimes."""
    if not fact or not dim:
        return
    dim = list({k: (k, t) for k, t in dim}.values())
    f = spark.createDataFrame(fact, "k int, v int")
    d = spark.createDataFrame(dim, "k int, tag string")
    plain = f.join(d, "k", how)
    for hot_fraction in (0.0001, 2.0):  # everything hot / nothing hot
        out = hot_key_salted_join(
            f, d, key="k", n_salt=3, how=how, sample_fraction=1.0, hot_fraction=hot_fraction
        )
        assert _rows(out.select(*plain.columns)) == _rows(plain), hot_fraction


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["u", "v", "w", "z"]), min_size=0, max_size=8),
        min_size=0,
        max_size=8,
    ),
    threshold=st.sampled_from([0.34, 0.6]),
)
@SETTINGS
def test_ngram_jaccard_prefix_filter_property(spark, docs, threshold):
    """The prefix-filtered + array-verify Jaccard join must equal the
    brute-force all-pairs computation on arbitrary corpora — the prefix
    theorem is only worth trusting if no qualifying pair ever escapes
    candidate generation (rounding at the threshold boundary included)."""
    from udacity_datalake_spark_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.d1, r.d2): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=threshold).collect()
    }
    sh = {
        i: {" ".join(t[j : j + 2]) for j in range(len(t) - 1)}
        for i, t in enumerate(docs)
        if len(t) >= 2
    }
    want = {}
    for i in sh:
        for j in sh:
            if i < j:
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                if union and inter / union >= threshold:
                    want[(i, j)] = round(inter / union, 9)
    assert got == want


@given(
    ids=st.lists(st.integers(-50, 200), min_size=0, max_size=40),
    bucket_width=st.sampled_from([1, 2, 3, 7, 64]),
)
@SETTINGS
def test_sequence_gaps_property(spark, ids, bucket_width):
    """Bucketed gap detection must equal the naive global-lead version
    for any id set (duplicates, negatives, empty) and ANY bucket width —
    boundary stitching is where the bugs would live."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.sequences import sequence_gaps

    df = spark.createDataFrame([(i,) for i in ids] or [(None,)], "id long")
    got = {
        (r.gap_after, r.resume_at, r.n_missing)
        for r in sequence_gaps(df, "id", bucket_width=bucket_width).collect()
    }
    w = Window.orderBy("id")
    naive = (
        df.where(F.col("id").isNotNull())
        .distinct()
        .select("id", F.lead("id").over(w).alias("next_id"))
        .where(F.col("next_id") - F.col("id") > 1)
    )
    want = {(r.id, r.next_id, r.next_id - r.id - 1) for r in naive.collect()}
    assert got == want


@given(
    pts=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(-40, 40)),
        min_size=0, max_size=12,
    ),
    d=st.sampled_from([1, 5, 13]),
)
@SETTINGS
def test_grid_radius_self_join_property(spark, pts, d):
    """Grid-bucketed radius search must equal the brute-force quadratic
    join exactly — every pair once, none missed, including negative
    coordinates (floor cells) and points on cell boundaries."""
    from udacity_datalake_spark_spark.operators.spatial import grid_radius_self_join

    if not pts:
        return
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    p = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        (r.a_id, r.b_id, r.d2) for r in grid_radius_self_join(p, d).collect()
    )
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for i, a in enumerate(rows)
        for b in rows[i + 1:]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= d * d
    )
    assert got == want


@given(
    values=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
    width=st.sampled_from([2, 4, 8]),
)
@SETTINGS
def test_mg_candidates_superset_property(spark, values, width):
    """Misra–Gries candidates must be a superset of every value with
    global frequency > n/(width+1), for any width and partitioning."""
    from collections import Counter

    from udacity_datalake_spark_spark.operators.sketches import mg_candidates

    df = spark.createDataFrame([(v,) for v in values], "term string").repartition(3)
    got = {r.term for r in mg_candidates(df, "term", width).collect()}
    n = len(values)
    must_have = {v for v, c in Counter(values).items() if c > n / (width + 1)}
    assert must_have <= got, (must_have, got)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=3, max_size=8).map(" ".join),
        min_size=0, max_size=6,
    ),
)
@SETTINGS
def test_shingle_containment_pairs_property(spark, docs):
    """The prefix-filtered containment operator must equal the brute-force
    definition: C(small→big) = |S∩B|/|S| ≥ 0.9 with (size, id)
    orientation, over random tiny corpora with heavy shingle overlap."""
    from udacity_datalake_spark_spark.operators.dedup import shingle_containment_pairs

    if not docs:
        return
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d_small, r.d_big)
        for r in shingle_containment_pairs(
            df, "doc_id", "text", n=3, threshold_permille=900
        ).collect()
    }

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in rows if len(t.split(" ")) >= 3}
    want = set()
    for i, si in sets.items():
        for j, sj in sets.items():
            if i == j:
                continue
            small, big = (i, j) if (len(si), i) < (len(sj), j) else (j, i)
            if small != i:
                continue  # count each unordered pair once, from the small side
            inter = len(si & sj)
            if inter * 1000 >= 900 * len(si):
                want.add((small, big))
    assert got == want, (got, want)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=20,
    ),
)
@SETTINGS
def test_degree_oriented_triangles_property(spark, edges):
    """The Suri–Vassilvitskii wedge join must count exactly the triangles
    of the undirected graph — equal to the brute-force set count on
    arbitrary small graphs (dupes and both orientations in the input)."""
    from udacity_datalake_spark_spark.plans.wave15 import triangles

    und = {(min(u, w), max(u, w)) for u, w in edges}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "u long, w long")
    # dense_gate_edges=0 forces the distributed wedge paths (round 11:
    # the gated driver-matmul path would otherwise absorb every small
    # hypothesis graph); the dense path has its own equality test below
    got = triangles(df, orientation="degree", dense_gate_edges=0).first().n_triangles
    got_id = triangles(df, orientation="id", dense_gate_edges=0).first().n_triangles
    got_dense = triangles(df).first().n_triangles

    adj: dict[int, set[int]] = {}
    for u, w in und:
        adj.setdefault(u, set()).add(w)
        adj.setdefault(w, set()).add(u)
    want = sum(
        1
        for u, w in und
        for c in adj[u] & adj[w]
        if c > w  # u < w < c: each triangle once
    )
    assert got == want, (sorted(und), got, want)
    assert got_id == want, (sorted(und), got_id, want)
    assert got_dense == want, (sorted(und), got_dense, want)


def test_degree_oriented_triangles_hub_graph(spark):
    """Planted hub: a 400-leaf star plus one chord has exactly 1 triangle,
    and the (degree, id) orientation keeps the wedge fan-out linear —
    all star edges point AT the hub (highest degree), so the hub's
    out-degree is 0 and no leaf generates more than C(2,2) wedges.
    Under raw-id orientation a hub with the smallest id would generate
    C(400,2) ≈ 80k wedges; here the total is exactly 1."""
    from udacity_datalake_spark_spark.plans.wave15 import oriented_by_degree, triangles

    n = 400
    hub = 0  # smallest id AND highest degree — the adversarial raw-id case
    edges = [(hub, i) for i in range(1, n + 1)] + [(1, 2)]
    df = spark.createDataFrame(edges, "u long, w long")
    assert triangles(df).first().n_triangles == 1
    # force the distributed S-V path too (the dense gate would absorb
    # this 401-edge graph; auto picks id there: 80k wedges fits budget)
    assert (
        triangles(df, orientation="degree", dense_gate_edges=0)
        .first()
        .n_triangles
        == 1
    )

    # Wedge-count bound: Σ C(out-deg, 2) with degree orientation.
    from pyspark.sql import functions as F2

    out_deg = oriented_by_degree(df).groupBy("a").agg(F2.count(F2.lit(1)).alias("od"))
    wedge_total = out_deg.agg(
        F2.sum(F2.col("od") * (F2.col("od") - 1) / 2).alias("wt")
    ).first().wt
    assert wedge_total <= n, f"degree orientation should keep wedges linear, got {wedge_total}"


def test_dense_gate_fetch_guards(spark):
    """The dense-gate fetch (ADVICE r11): non-integral id schemas must
    skip the driver fetch entirely, and NULL ids (which arrive as a
    pandas object/float column that int64 conversion rejects) must fall
    back to the distributed path instead of raising — triangles() stays
    correct either way."""
    from udacity_datalake_spark_spark.plans.wave15 import (
        dense_gate_fetch,
        triangles,
    )

    # non-integral ids: no fetch, distributed path
    dbl = spark.createDataFrame([(1.0, 2.0)], "u double, w double")
    assert dense_gate_fetch(dbl, ["u", "w"], 10) is None

    # NULL id: conversion fails, falls back (and the wedge path treats
    # the null row per join semantics rather than crashing the gate)
    nulled = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (None, 4)], "u int, w int"
    )
    assert dense_gate_fetch(nulled, ["u", "w"], 10) is None
    assert triangles(nulled).first().n_triangles == 1

    # clean small graph: fetch returns the arrays and the dense count
    # equals the forced-distributed count
    clean = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u int, w int"
    )
    got = dense_gate_fetch(clean, ["u", "w"], 10)
    assert got is not None and len(got[0]) == 4
    assert (
        triangles(clean).first().n_triangles
        == triangles(clean, dense_gate_edges=0).first().n_triangles
        == 1
    )
