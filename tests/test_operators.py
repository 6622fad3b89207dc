"""Unit tests for composite operators on synthetic frames: the OR-join
decomposition (incl. the reference's golden null-artist case) and the
as-of join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.operators.joins import asof_join, left_join_or


def test_left_join_or_equals_direct_or_join(spark):
    left = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "y")],
        ["lid", "lname", "lloc"],
    )
    right = spark.createDataFrame(
        [(10, "a", "y"), (11, "q", "y"), (12, "c", "w"), (13, None, "v")],
        ["rid", "rname", "rloc"],
    )
    cond1 = F.col("lname") == F.col("rname")
    cond2 = F.col("lloc") == F.col("rloc")
    direct = left.join(right, cond1 | cond2, "left")  # the BNLJ plan
    rewritten = left_join_or(left, right, cond1, cond2)
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, rewritten.collect())) == sorted(map(key, direct.collect()))


def test_left_join_or_keeps_unmatched_with_nulls(spark):
    # the reference's golden case: 3 of 4 songplays rows end with
    # artist_id = null because neither name nor location matched
    left = spark.createDataFrame([(1, "nomatch", "nowhere")], ["lid", "lname", "lloc"])
    right = spark.createDataFrame([(10, "a", "y")], ["rid", "rname", "rloc"])
    out = left_join_or(
        left, right, F.col("lname") == F.col("rname"), F.col("lloc") == F.col("rloc")
    ).collect()
    assert len(out) == 1 and out[0].rid is None


def test_left_join_or_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    try:
        left_join_or(df, df, F.lit(True), F.lit(True))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        ["sym", "t", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", 5, 99.0), ("A", 15, 100.5), ("A", 20, 100.9), ("B", 20, 49.0)],
        ["sym", "qt", "bid"],
    )
    out = {
        (r.sym, r.t): r.bid
        for r in asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt").collect()
    }
    assert out[("A", 10)] == 99.0      # latest quote at/before t=10
    assert out[("A", 20)] == 100.9     # equal-timestamp quote counts (<=)
    assert out[("B", 15)] is None      # no quote yet


def test_salted_join_equals_plain_join(spark):
    from udacity_datalake_spark_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(k, i) for k in ("hot", "hot", "hot", "cold") for i in range(3)], ["k", "v"]
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("unused", "U")], ["k", "tag"])
    plain = fact.join(dim, "k", "inner")
    salted = salted_join(fact, dim, key="k", n_salt=4)
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, salted.select(*plain.columns).collect())) == sorted(
        map(key, plain.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    from udacity_datalake_spark_spark.operators.joins import salted_join

    fact = spark.createDataFrame([("a", 1), ("orphan", 2)], ["k", "v"])
    dim = spark.createDataFrame([("a", "A")], ["k", "tag"])
    out = {r.k: r.tag for r in salted_join(fact, dim, key="k", n_salt=3, how="left").collect()}
    assert out == {"a": "A", "orphan": None}


def test_range_band_join_matches_naive_and_handles_overlap(spark):
    from udacity_datalake_spark_spark.operators.joins import range_band_join

    fact = spark.createDataFrame([(float(v),) for v in (0, 4999, 5000, 7500, 12000, 19999)], ["val"])
    # overlapping bands: 7500 falls in both
    bands = spark.createDataFrame(
        [("lo", 0.0, 10000.0), ("mid", 5000.0, 20000.0)], "name string, lo double, hi double"
    )
    naive = fact.join(bands, (F.col("val") >= F.col("lo")) & (F.col("val") < F.col("hi")))
    bucketed = range_band_join(fact, bands, value_col="val")
    key = lambda r: (r.val, r.name)
    assert sorted(map(key, bucketed.collect())) == sorted(map(key, naive.collect()))
    # boundary: hi is exclusive, lo inclusive
    got = {(r.val, r.name) for r in bucketed.collect()}
    assert (5000.0, "mid") in got and (5000.0, "lo") in got  # 5000 in [0,10000) too
    assert (19999.0, "mid") in got and (7500.0, "lo") in got and (7500.0, "mid") in got


@pytest.mark.parametrize("threshold", [100_000, 0])
def test_connected_components_known_graph(spark, threshold):
    """Two components (a 4-clique chain and a pair) + min-label choice —
    both the union-find fast path (threshold high) and the distributed
    min-propagation loop (threshold 0) must agree."""
    from udacity_datalake_spark_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (4, 1)], ["src", "dst"]
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges, small_graph_threshold=threshold).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


@pytest.mark.parametrize("threshold", [100_000, 0])
def test_connected_components_long_chain(spark, threshold):
    """A 12-node path needs multiple propagation rounds — exercises the
    convergence loop on the distributed path, and the same chain through
    union-find."""
    from udacity_datalake_spark_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], ["src", "dst"]
    )
    rows = connected_components(edges, small_graph_threshold=threshold).collect()
    assert {r.component for r in rows} == {100}
    assert len(rows) == 12


def test_connected_components_path_graph_log_rounds(spark):
    """The MR-CC (large-star/small-star) loop must label a 10⁴-node path
    graph — the adversarial diameter case that made min-label
    propagation crawl — in O(log n) rounds, with output identical to
    the union-find fast path."""
    from udacity_datalake_spark_spark.operators import graph
    from udacity_datalake_spark_spark.operators.graph import connected_components

    n = 10_000
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    got = {
        (r.node, r.component)
        for r in connected_components(
            edges, small_graph_threshold=0, max_iter=30
        ).collect()
    }
    assert got == {(i, 0) for i in range(n + 1)}
    # O(log n) bound: log2(10^4) ≈ 13.3; min-label needed diameter=10^4.
    assert graph.last_cc_rounds <= 16, f"took {graph.last_cc_rounds} rounds"


def test_connected_components_random_graph_matches_union_find(spark):
    """Distributed MR-CC vs driver union-find on a random graph with
    mixed component shapes (cliques, chains, isolated pairs)."""
    import random

    from udacity_datalake_spark_spark.operators.graph import connected_components

    rng = random.Random(7)
    pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    pairs = [(u, v) for u, v in pairs if u != v]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    dist = {
        (r.node, r.component)
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    uf = {
        (r.node, r.component)
        for r in connected_components(edges, small_graph_threshold=10**9).collect()
    }
    assert dist == uf


def test_dq_report_counts_planted_violations(spark):
    from udacity_datalake_spark_spark.operators.quality import (
        dq_report,
        is_null,
        not_between,
        not_in,
    )

    df = spark.createDataFrame(
        [
            (1, 1, 5.0, "A", "x"),
            (1, 1, 5.0, "A", "x"),     # dup pk
            (2, 1, 99.0, "A", "x"),    # out of range
            (3, 1, 5.0, "Z", "x"),     # bad domain
            (4, 1, 5.0, "A", None),    # null
        ],
        ["k1", "k2", "qty", "flag", "req"],
    )
    row = dq_report(
        df,
        rules={
            "bad_qty": not_between("qty", 0, 50),
            "bad_flag": not_in("flag", ["A", "B"]),
            "null_req": is_null("req"),
        },
        unique_keys=["k1", "k2"],
    ).collect()[0]
    assert (row.n_rows, row.bad_qty, row.bad_flag, row.null_req, row.dup_pk) == (5, 1, 1, 1, 1)


def test_scd2_collapses_redelivered_records(spark):
    """Re-delivered unchanged records must not mint spurious versions;
    the current row is open-ended (operators/scd.py)."""
    from udacity_datalake_spark_spark.operators.scd import scd2

    rows = [
        (1, "2024-01-01 00:00:00", "free"),
        (1, "2024-01-02 00:00:00", "free"),   # redelivery — no new version
        (1, "2024-01-03 00:00:00", "paid"),
        (2, "2024-01-05 00:00:00", "paid"),
    ]
    changes = spark.createDataFrame(rows, "user_id int, ts string, level string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = scd2(changes, key="user_id", ts="ts", attrs=["level"]).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.valid_from)):
        by_user.setdefault(r.user_id, []).append(r)
    u1 = by_user[1]
    assert [r.level for r in u1] == ["free", "paid"]
    assert u1[0].valid_to == u1[1].valid_from and not u1[0].is_current
    assert u1[1].valid_to is None and u1[1].is_current
    assert len(by_user[2]) == 1 and by_user[2][0].is_current


def test_global_row_number_equals_window(spark, sf_dir):
    """Two-phase bucketed ranking must equal the single-partition
    row_number window bit-for-bit, including heavy ties."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import global_row_number
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    # n_chars has many ties; tie-break on doc_id for a total order
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    got = {
        r.doc_id: r.rn
        for r in global_row_number(d, order, "n_chars", descending=True, n_buckets=7).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r.doc_id: r.rn
        for r in d.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_equals_window(spark, sf_dir):
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import global_ntile
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    for n_tiles in (3, 10, 7):
        got = {
            r.doc_id: r.tile
            for r in global_ntile(d, order, "n_chars", n_tiles, descending=True).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r.doc_id: r.tile
            for r in d.withColumn("tile", F.ntile(n_tiles).over(w)).collect()
        }
        assert got == want, f"ntile({n_tiles}) diverged"


def test_global_running_sum_equals_window(spark, sf_dir):
    """Two-phase bucketed prefix sum must equal the single-partition
    running-sum window bit-for-bit (DECIMAL values, heavy ties)."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.functions.numeric import dec
    from udacity_datalake_spark_spark.operators.topk import global_running_sum
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", dec("n_chars").alias("v"))
        .withColumn("__k", F.col("n_chars").cast("double"))
    )
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    got = {
        r.doc_id: r.running
        for r in global_running_sum(
            d, order, "__k", "v", descending=True, n_buckets=7
        ).collect()
    }
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.running
        for r in d.withColumn("running", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_running_sum_null_prefix_equals_window(spark):
    """NULL handling must match the global window exactly: an all-NULL
    prefix yields NULL; a bucket whose WITHIN-bucket prefix is all-NULL
    still carries earlier buckets' non-null sum (round-2 advice item —
    the old NULL + __offset arithmetic dropped it to NULL)."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import global_running_sum

    # Leading rows NULL (tests NULL-prefix → NULL), then a NULL-heavy
    # tail so some small buckets are entirely NULL (tests carry-forward).
    rows = [(i, float(i), None if (i < 5 or i % 3 == 0) else i * 10) for i in range(60)]
    d = spark.createDataFrame(rows, "id long, k double, v long")
    order = [F.col("k"), F.col("id")]
    got = {
        r.id: r.running
        for r in global_running_sum(d, order, "k", "v", n_buckets=13).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.id: r.running for r in d.withColumn("running", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert want[0] is None  # the all-NULL prefix case is actually exercised


def test_ranked_topk_equals_window(spark, sf_dir):
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import ranked_topk
    from udacity_datalake_spark_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    got = {(r.doc_id, r.rn) for r in ranked_topk(d, order, 17).collect()}
    w = Window.orderBy(*order)
    want = {
        (r.doc_id, r.rn)
        for r in d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 17).collect()
    }
    assert got == want


def test_global_row_number_null_keys(spark):
    """NULL sort keys must rank where Spark's window defaults put them
    (NULLS LAST under desc, NULLS FIRST under asc) — the review-caught
    bug had them silently landing in the top bucket."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import global_ntile, global_row_number

    rows = [(1, 10.0), (2, None), (3, 5.0), (4, None), (5, 20.0), (6, 1.0)]
    df = spark.createDataFrame(rows, "id long, score double")
    for descending in (True, False):
        order = [
            F.col("score").desc() if descending else F.col("score").asc(),
            F.col("id"),
        ]
        got = {
            r.id: r.rn
            for r in global_row_number(
                df, order, "score", descending=descending, n_buckets=3
            ).collect()
        }
        w = Window.orderBy(*order)
        want = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
        assert got == want, f"descending={descending}: {got} != {want}"
        got_t = {
            r.id: r.tile
            for r in global_ntile(
                df, order, "score", 3, descending=descending, n_buckets=3
            ).collect()
        }
        want_t = {r.id: r.t for r in df.withColumn("t", F.ntile(3).over(w)).collect()}
        assert got_t == want_t, f"ntile descending={descending}: {got_t} != {want_t}"


def test_read_text_lines(spark, tmp_path):
    from udacity_datalake_spark_spark.sources.readers import read_text_lines

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\n")
    (p / "b.txt").write_text("gamma\n")
    lines = read_text_lines(spark, str(p)).collect()
    assert {r.value for r in lines} == {"alpha", "beta", "gamma"}
    assert all(r.source_file.endswith((".txt",)) for r in lines)
    docs = read_text_lines(spark, str(p), whole_file=True).collect()
    assert {r.value for r in docs} == {"alpha\nbeta\n", "gamma\n"}


def test_pagerank_fixed_point_star_graph(spark):
    """Hand-checkable star: center 0 connected to 1,2,3.  Verify the
    exact integer trajectory for two rounds, a custom scale, and the
    empty-graph schema."""
    from udacity_datalake_spark_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")

    # replicate the integer spec in plain python
    def expected(iters, scale):
        deg = {0: 3, 1: 1, 2: 1, 3: 1}
        n = 4
        r = {v: scale // n for v in deg}
        base = (15 * scale) // (100 * n)
        for _ in range(iters):
            s = {v: 0 for v in deg}
            for u, vs in {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}.items():
                for v in vs:
                    s[v] += r[u] // deg[u]
            r = {v: base + (85 * s[v]) // 100 for v in deg}
        return r

    for iters, scale in [(1, 1_000_000_000), (2, 1_000_000_000), (3, 1_000_000)]:
        got = {
            r.node: r.rank_ppb
            for r in pagerank_fixed_point(edges, iters=iters, scale=scale).collect()
        }
        assert got == expected(iters, scale), (iters, scale)

    # empty graph (all endpoints null): empty result, node type preserved
    nulls = spark.createDataFrame([(None, None)], "src string, dst string")
    out = pagerank_fixed_point(nulls)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "string", "rank_ppb": "bigint"}


def test_global_running_max_equals_window(spark, sf_dir):
    """Two-phase bucketed prefix max must equal the single-partition
    running-max window exactly."""
    from pyspark.sql import Window

    from udacity_datalake_spark_spark.operators.topk import global_running_max
    from udacity_datalake_spark_spark.sources.readers import read_table

    e = (
        read_table(spark, sf_dir, "events", columns=["event_id", "ts"])
        .select("event_id", F.unix_micros("ts").alias("v"))
        .withColumn("__k", F.col("event_id").cast("double"))
    )
    got = {
        r.event_id: r.running_max
        for r in global_running_max(
            e, [F.col("event_id")], "__k", "v", n_buckets=7
        ).collect()
    }
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.event_id: r.running_max
        for r in e.withColumn("running_max", F.max("v").over(w)).collect()
    }
    assert got == want
