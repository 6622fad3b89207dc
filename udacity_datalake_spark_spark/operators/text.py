"""Text-analysis operators for large-scale corpus pipelines: tokenization,
quality scoring, language-ID heuristics, fingerprinting, shingling.

Everything here is built on Spark SQL higher-order functions (split /
filter / transform / aggregate) so the hot path stays inside whole-stage
codegen — no Python worker round trips at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword list for the heuristic scorers (subset of the corpus vocabulary).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus; for general text use
    F.split on '\\s+')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Number of tokens that are stopwords — JVM-side lambda filter."""
    sw = stopwords or EN_STOPWORDS
    return F.size(F.filter(tokens(text), lambda x: x.isin(*sw)))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, trim, collapse runs of
    whitespace (reference-style full-row distinct misses case/spacing
    variants; this is the dedup-grade normalization)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def content_fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    ``sequence(1, size-n+1)`` start positions + ``slice``/``array_join`` —
    all codegen'd.  Rows with fewer than n tokens yield an empty array.
    """
    arr = tokens(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(arr) - (n - 1), F.lit(0)))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(arr, i, n), " "))
    return F.array_distinct(grams)


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work runs at full parallelism.

    A small parquet table arrives as ONE scan split (files < 128 MB don't
    split), so a heavy map stage — shingling, regex, hashing — runs on a
    single core no matter how many the cluster has.  Round-robin
    repartition to the default parallelism ONLY in that regime; at real
    scale the scan already has ≥ cores splits and this is a no-op, so no
    shuffle is ever added where data is large.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explode_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs — the input layout for Jaccard / MinHash joins.

    The shingle transform is the CPU-dominant stage of every dedup path,
    so it is spread() to full parallelism before the per-row work, and
    the token array is MATERIALIZED as a column before the gram lambda —
    referencing ``split(text)`` inside ``transform`` re-evaluates the
    split per element (the q309 lesson; ~30% on this stage even at short
    doc lengths, and O(tokens²) on long ones)."""
    base = spread(df).withColumn("__toks", tokens(text_col)).where(
        F.size("__toks") >= n
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__toks") - (n - 1), F.lit(0))
    )
    grams = F.transform(
        starts, lambda i: F.array_join(F.slice(F.col("__toks"), i, n), " ")
    )
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


# GPT-style byte-pair encoders emit roughly one token per short word /
# punctuation mark and split longer words every ~5-8 characters.  This
# estimator counts word/number/punctuation pieces and charges long pieces
# one extra token per started 7-char span — a deterministic, codegen'd
# proxy good enough for corpus sizing and per-doc budget filters (the real
# tokenizer is a Python library; keep it off the 100 TB hot path).
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_estimate(text: Column | str) -> Column:
    """Σ over regex pieces of ceil(len/7) — the BPE-ish token count."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0)
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.ceil(F.length(x) / 7.0).cast("long"),
    )
