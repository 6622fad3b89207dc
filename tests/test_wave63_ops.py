"""Wave-63 operator guarantees beyond the oracle gate: QOI codec
robustness, k-center coverage, boundary-stitch planted recovery."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans import QUERIES


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


def test_qoi_roundtrip_random_pixels():
    """The QOI encoder/decoder pair must roundtrip arbitrary pixel
    content (random bytes exercise RGB-heavy streams; planted runs and
    small steps exercise RUN/DIFF/LUMA; revisits exercise INDEX)."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        _qoi_decode_rgb,
        _qoi_encode_rgb,
    )

    rng = np.random.default_rng(5)
    for trial in range(4):
        px = rng.integers(0, 256, (240, 3), dtype=np.uint8)
        px[40:90] = px[39]  # run
        px[120:130] = (px[119].astype(int) + 1) % 256  # diff-range step
        px[200:210] = px[0:10]  # index revisits
        data = (
            struct.pack(">4sIIBB", b"qoif", 24, 10, 3, 0)
            + _qoi_encode_rgb(px)
            + b"\x00" * 7
            + b"\x01"
        )
        w, h, out = _qoi_decode_rgb(data)
        assert (w, h) == (24, 10) and np.array_equal(out, px), trial


def test_qoi_decode_rejects_corruption():
    """Header magic, end marker, and pixel-count coherence are all
    validated — a truncated or mislabeled payload fails loudly instead
    of yielding silent garbage stats."""
    from udacity_datalake_spark_spark.operators.multimodal import (
        _qoi_decode_rgb,
        _qoi_encode_rgb,
    )

    px = np.arange(90, dtype=np.uint8).reshape(-1, 3)
    good = (
        struct.pack(">4sIIBB", b"qoif", 6, 5, 3, 0)
        + _qoi_encode_rgb(px)
        + b"\x00" * 7
        + b"\x01"
    )
    _qoi_decode_rgb(good)  # sanity
    with pytest.raises(ValueError):
        _qoi_decode_rgb(b"qoix" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        _qoi_decode_rgb(good[:-1])  # missing end marker
    with pytest.raises(ValueError):
        # claim more pixels than the op stream encodes
        _qoi_decode_rgb(
            struct.pack(">4sIIBB", b"qoif", 60, 50, 3, 0) + good[14:]
        )


def test_kcenter_covers_separated_clusters(spark):
    """Greedy farthest-point selection must hit every well-separated
    cluster: 8 tight clusters, k=8 → all 8 cluster labels selected
    (the defining property density-based sampling lacks)."""
    from udacity_datalake_spark_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((8, 64)) * 4  # well separated
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + 0.05 * rng.standard_normal(64)
        rows.append((i, [float(x) for x in v.astype("float32")], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).persist()
    sel = kcenter_select(emb, k=8)
    assert len(sel) == 8
    picked_clusters = {i % 8 for _, i, _ in sel}
    assert picked_clusters == set(range(8)), sorted(picked_clusters)
    radii = [r for _, _, r in sel]
    assert all(radii[i + 1] <= radii[i] + 1e-12 for i in range(7)), radii
    # once every cluster is covered the radius collapses to intra-cluster
    assert radii[-1] < radii[0] / 3, radii


def test_boundary_stitch_recovers_planted_split(spark, tmp_path):
    """A document split into two records (the tail 3-gram of part 1 ==
    the head 3-gram of part 2) must surface as a stitch pair; unrelated
    docs with disjoint vocab must not."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "s1", "en", 1),
        (2, "delta epsilon zeta eta theta iota", "s1", "en", 1),  # stitch of 1
        (3, "one two three four five six", "s2", "en", 1),
        (4, "seven eight nine ten eleven twelve", "s2", "en", 1),
    ]
    d = str(tmp_path / "fx")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.source: r for r in QUERIES["q351_boundary_stitch"](spark, d).collect()}
    assert set(out) == {"s1"}
    assert out["s1"].n_stitch_pairs == 1
    assert out["s1"].n_tail_docs == 1 and out["s1"].n_head_docs == 1


def test_pii_scan_counts_match_plant_arithmetic(spark, sf_dir):
    """Planted-PII counts must equal the doc_id arithmetic that planted
    them: every doc_id % 3 == 0 contributes exactly one email, etc."""
    from udacity_datalake_spark_spark.sources.readers import read_table

    totals = (
        QUERIES["q350_pii_scan"](spark, sf_dir)
        .agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_phones").alias("p"),
            F.sum("n_ips").alias("i"),
        )
        .first()
    )
    ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents", columns=["doc_id"]).collect()
    ]
    assert totals.e == sum(1 for i in ids if i % 3 == 0)
    assert totals.p == sum(1 for i in ids if i % 5 == 0)
    assert totals.i == sum(1 for i in ids if i % 7 == 0)
