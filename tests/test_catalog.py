"""Catalog + session-conf surface tests."""

from __future__ import annotations

from udacity_datalake_spark_spark.catalog import register_tables, sql
from udacity_datalake_spark_spark.session import s3a_conf


def test_register_tables_makes_sql_views(spark, sf_dir):
    frames = register_tables(spark, sf_dir, ["region", "nation"])
    assert set(frames) == {"region", "nation"}
    got = spark.sql("SELECT count(*) AS n FROM region").collect()[0].n
    assert got == frames["region"].count() == 5


def test_sql_runs_joins_over_catalog(spark, sf_dir):
    df = sql(
        spark,
        sf_dir,
        "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
    )
    rows = {r.r_name: r.n for r in df.collect()}
    assert sum(rows.values()) == 25 and len(rows) == 5


def test_s3a_conf_shape():
    conf = s3a_conf(access_key="AK", secret_key="SK", hadoop_aws_version="3.4.1")
    assert conf["spark.jars.packages"] == "org.apache.hadoop:hadoop-aws:3.4.1"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    # no creds → provider-chain mode: no key entries at all
    anon = s3a_conf(access_key=None, secret_key="only-one-given")
    import os

    if "AWS_ACCESS_KEY_ID" not in os.environ:
        assert "spark.hadoop.fs.s3a.access.key" not in anon


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from udacity_datalake_spark_spark.sources.readers import read_table
    from udacity_datalake_spark_spark.sources.writers import compact_parquet
    import glob

    src = str(tmp_path / "fragmented")
    read_table(spark, sf_dir, "events").repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n == 1 and len(glob.glob(f"{dst}/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == read_table(spark, sf_dir, "events").count()


def test_dynamic_partition_overwrite_is_incremental(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic (set in the session factory):
    rewriting one partition leaves sibling partitions intact — the
    incremental-batch behavior the reference's full-table overwrite
    (etl.py:46,62,95,134,171) cannot do at 100 TB."""
    from pyspark.sql import functions as F

    from udacity_datalake_spark_spark.sources.readers import read_table
    from udacity_datalake_spark_spark.sources.writers import write_parquet

    out = str(tmp_path / "by_type")
    ev = read_table(spark, sf_dir, "events")
    write_parquet(ev, out, partition_by=["event_type"])
    before = spark.read.parquet(out).groupBy("event_type").count().collect()

    # rewrite ONLY the 'click' partition with a filtered subset
    clicks_subset = ev.where((F.col("event_type") == "click") & (F.col("user_id") < 5))
    write_parquet(clicks_subset, out, partition_by=["event_type"])

    after = {r.event_type: r["count"] for r in spark.read.parquet(out).groupBy("event_type").count().collect()}
    for r in before:
        if r.event_type == "click":
            assert after[r.event_type] == clicks_subset.count() != r["count"]
        else:
            assert after[r.event_type] == r["count"]  # untouched partitions survive
