"""Golden-quirk regression tests for the ported Sparkify pipelines
(the behaviors the reference's committed outputs prove — SURVEY.md §5)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from udacity_datalake_spark_spark.plans.sparkify import (
    build_artists,
    build_songplays,
    build_songs,
    build_time,
    build_users,
    filter_songplay_events,
    process_log_data,
    process_song_data,
    songs_readback_shape,
)
from udacity_datalake_spark_spark.schemas import LOG_DATA_SCHEMA, SONG_DATA_SCHEMA
from udacity_datalake_spark_spark.sources.readers import read_json_feed

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


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


@pytest.fixture(scope="module")
def song_data(spark):
    return read_json_feed(spark, f"{FIXTURES}/song_data.json", SONG_DATA_SCHEMA)


@pytest.fixture(scope="module")
def log_data(spark):
    return read_json_feed(spark, f"{FIXTURES}/log_data.json", LOG_DATA_SCHEMA)


def test_songs_distinct_and_columns(song_data):
    songs = build_songs(song_data)
    assert songs.columns == ["song_id", "title", "artist_id", "year", "duration"]
    assert songs.count() == 3  # exact duplicate record collapsed


def test_artists_full_tuple_distinct(song_data):
    artists = build_artists(song_data)
    # AR1 appears twice (different lat/long) — full-row distinct keeps both
    assert artists.count() == 3
    assert artists.where(F.col("artist_id") == "AR1AAAA1187B9XXXX1").count() == 2


def test_users_level_churn_yields_two_rows(log_data):
    users = build_users(filter_songplay_events(log_data))
    assert users.count() == 3  # user 10 free + user 10 paid + user 80 paid
    assert users.select("user_id").distinct().count() == 2
    # userId is a STRING (golden parquet truth, not the README's INTEGER)
    assert dict(users.dtypes)["user_id"] == "string"


def test_time_retains_duplicates_and_truncates_ms(log_data):
    time_table = build_time(filter_songplay_events(log_data))
    assert time_table.count() == 6  # one row per NextSong event, NO distinct
    assert time_table.select("start_time").distinct().count() == 5  # shared ts kept twice
    first = time_table.orderBy("start_time").first()
    # 1541990000123 ms → second-truncated (from_unixtime compat semantics)
    assert first.start_time == datetime.datetime.fromtimestamp(
        1541990000, datetime.timezone.utc
    ).replace(tzinfo=None)
    assert first.weekday == "Monday" and first.year == 2018 and first.month == 11


def test_songplays_golden_quirks(spark, song_data, log_data):
    events = filter_songplay_events(log_data)
    songs = songs_readback_shape(build_songs(song_data))
    artists = build_artists(song_data)
    sp = build_songplays(events, songs, artists, build_time(events)).cache()

    rows = sp.collect()
    assert len(rows) == 4  # only title-matching events survive J1
    by_session_item = {(r.session_id, r.start_time): r for r in rows}
    # name-match → AR1; two identical artist rows collapse via distinct
    assert sp.where(F.col("song_id") == "SOALPHA12AB018XXX1").where(
        F.col("user_id") == "10"
    ).count() == 1
    # location-only match attributes AR2 (OR-join second disjunct)
    ar2 = sp.where(F.col("artist_id") == "AR2BBBB1187B9XXXX2").collect()
    assert len(ar2) == 1 and ar2[0].song_id == "SOALPHA12AB018XXX1"
    # J2 misses → null artist_id (the golden 3-of-4 pattern)
    assert sp.where(F.col("artist_id").isNull()).count() == 2
    # location column is the LOG side value (reference etl.py:165)
    assert {r.location for r in rows} >= {"Portland, ME", "Nowhere, KS"}


def test_songplays_rewrite_equals_direct_or_join(spark, song_data, log_data):
    from udacity_datalake_spark_spark.plans.sparkify import with_start_time

    events = filter_songplay_events(log_data)
    songs = songs_readback_shape(build_songs(song_data))
    artists = build_artists(song_data)
    time_table = build_time(events)

    rewritten = build_songplays(events, songs, artists, time_table)

    # the reference's literal plan (BNLJ OR-join, etl.py:140-169)
    ev = with_start_time(events).alias("a")
    j1 = ev.join(songs, ev.song == songs.title, "inner")
    art = artists.select(
        "artist_id",
        F.col("name").alias("__n"),
        F.col("location").alias("__l"),
    )
    j2 = j1.join(art, (F.col("artist") == F.col("__n")) | (F.col("location") == F.col("__l")), "left")
    tt = time_table.select(F.col("start_time").alias("__ts"), "year", "month")
    direct = (
        j2.join(tt, F.col("start_time") == F.col("__ts"), "left")
        .select(
            "start_time",
            F.col("userId").alias("user_id"),
            "level",
            "song_id",
            "artist_id",
            F.col("sessionId").alias("session_id"),
            "location",
            F.col("userAgent").alias("user_agent"),
            "year",
            "month",
        )
        .distinct()
    )
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, rewritten.collect())) == sorted(map(key, direct.collect()))


def test_end_to_end_partitioned_layout(spark, song_data, log_data, tmp_path):
    out = str(tmp_path / "lake")
    process_song_data(spark, song_data, out)
    process_log_data(spark, log_data, out)

    assert os.path.isdir(f"{out}/songs/year=0")  # unknown-year sentinel partition
    assert os.path.isdir(f"{out}/songplays/year=2018/month=11")
    assert os.path.isdir(f"{out}/time/year=2018/month=11")

    # partition columns recovered on base-path read; dropped by the compat shim
    songs_back = spark.read.parquet(f"{out}/songs")
    assert set(songs_back.columns) == {"song_id", "title", "duration", "year", "artist_id"}
    assert songs_readback_shape(songs_back).columns == ["song_id", "title", "duration"]

    sp = spark.read.parquet(f"{out}/songplays")
    assert sp.count() == 4
    assert sp.where(F.col("artist_id").isNull()).count() == 2


def test_etl_cli_end_to_end(spark, tmp_path):
    """The spark-submit entry (etl_cli.run_etl) reproduces the reference's
    CLI pipeline (reference etl.py:176-199): JSON feeds in the reference
    layout → full star schema as partitioned parquet."""
    import shutil

    from udacity_datalake_spark_spark.etl_cli import run_etl

    inp = tmp_path / "input"
    (inp / "song_data" / "A" / "B").mkdir(parents=True)
    (inp / "log_data" / "2018").mkdir(parents=True)
    shutil.copy(f"{FIXTURES}/song_data.json", inp / "song_data" / "A" / "B" / "songs.json")
    shutil.copy(f"{FIXTURES}/log_data.json", inp / "log_data" / "2018" / "events.json")
    out = str(tmp_path / "lake")

    run_etl(spark, str(inp), out)

    songs = spark.read.parquet(f"{out}/songs")
    users = spark.read.parquet(f"{out}/users")
    songplays = spark.read.parquet(f"{out}/songplays")
    assert songs.count() == 3 and users.count() == 3
    # partitioned layout: partition columns recovered via discovery
    assert {"year", "artist_id"} <= set(songs.columns)
    assert {"year", "month"} <= set(songplays.columns)
    assert spark.read.parquet(f"{out}/artists").count() == 3
    assert spark.read.parquet(f"{out}/time").count() > 0


def test_read_json_feed_infer_schema_compat(spark):
    """infer_schema=True reproduces the reference's inference-driven read
    (reference etl.py:36,78): ids/numerics land as whatever inference
    guesses (strings stay strings, ints widen to long) instead of the
    engine's explicit types — a bug-for-bug compat flag, not a default."""
    import pytest

    inferred = read_json_feed(spark, f"{FIXTURES}/log_data.json", infer_schema=True)
    explicit = read_json_feed(spark, f"{FIXTURES}/log_data.json", LOG_DATA_SCHEMA)
    # inference sees the numeric-looking userId strings as strings — the
    # reference's famous quirk — and widens JSON integers to long
    assert dict(inferred.dtypes)["userId"] == "string"
    assert dict(inferred.dtypes)["status"] == "bigint"
    assert inferred.count() == explicit.count()
    with pytest.raises(ValueError):
        read_json_feed(spark, f"{FIXTURES}/log_data.json")
