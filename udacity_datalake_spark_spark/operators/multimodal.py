"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: the payload rides as a binary
column next to a metadata struct; decode/feature-extract runs as a
vectorized pandas stage over column batches (never row-at-a-time Python).
Real media decoding needs codec libraries this container doesn't ship, so
the decode step is STUBBED (``decode_media`` raises NotImplementedError;
``extract_payload_features`` computes deterministic byte-level features) —
the Spark-side plumbing (schema, batching, partitioning) is real and
oracle-tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Attach an opaque binary payload + metadata struct (the multimodal
    column shape; here the payload is the UTF-8 encoded text)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)


def extract_payload_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extract over binary payloads with mapInPandas: Arrow moves
    whole column batches to one pandas worker per partition.  The
    "decoder" here is a deterministic stand-in (byte length + MD5 digest);
    a real image/audio decoder drops into the same loop."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, "payload").mapInPandas(features, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Frame-sampling batch shape: one payload row in → N sampled-frame
    rows out, inside a single mapInPandas stage (no driver round-trip, no
    explode of pre-decoded data).  The "video" here is the raw payload
    chunked into fixed-size frames with every k-th kept — a real
    ffmpeg-style decoder yields frames into the same per-row loop.  Output
    carries per-frame digests/sizes, not raw frame bytes: at 100 TB the
    heavy artifacts go to a side store, the relational engine keeps
    references."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes, digests = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                for frame_no in range(0, -(-len(data) // frame_size), every):
                    chunk = data[frame_no * frame_size : (frame_no + 1) * frame_size]
                    ids.append(doc_id)
                    nos.append(frame_no)
                    sizes.append(len(chunk))
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(frames, FRAME_SCHEMA)


def decode_media(df: DataFrame, codec: str) -> DataFrame:
    """STUB — real media decode requires codec libraries (PIL/ffmpeg/...)
    not present in this environment.  The full implementation plugs a
    decoder into the ``extract_payload_features`` mapInPandas loop."""
    raise NotImplementedError(
        f"media decode ({codec}) is stubbed: no codec libraries in this environment; "
        "see extract_payload_features for the production batch shape"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def resize_payload(df: DataFrame, id_col: str = "doc_id", factor: int = 4) -> DataFrame:
    """Resize batch shape: payload in → smaller payload out, same row
    count, inside one mapInPandas stage.  The deterministic stand-in
    keeps every ``factor``-th byte (a real implementation decodes, calls
    PIL/ffmpeg resize, re-encodes in the same loop — the Spark contract
    is unchanged: binary in, binary out, Arrow-batched)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(resize, RESIZE_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Average-hash style 64-bit perceptual signature over binary
    payloads: resample the byte stream into 64 buckets, set bit i when
    bucket i's mean exceeds the global mean — the aHash recipe an image
    pipeline applies to an 8×8 grayscale thumbnail, here applied to the
    raw payload since decode is stubbed (decode_media).  Deterministic
    (no RNG, pure arithmetic), Arrow-batched, one pass.

    Near-identical payloads land within a few Hamming bits; pair them
    with ``dedup.hamming_band_pairs`` — the multimodal twin of text
    SimHash dedup."""
    import numpy as np

    def phash_one(b: bytes) -> int:
        a = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
        if a.size == 0:
            return 0
        idx = np.arange(a.size) * 64 // a.size
        sums = np.bincount(idx, weights=a, minlength=64)
        cnts = np.maximum(np.bincount(idx, minlength=64), 1)
        means = sums / cnts
        bits = means > means.mean()
        v = 0
        for i in range(64):
            if bits[i]:
                v |= 1 << i
        # wrap to signed int64 (Spark LongType)
        return v - (1 << 64) if v >= (1 << 63) else v

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "phash": pdf["payload"].map(phash_one).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(hashes, PHASH_SCHEMA)
