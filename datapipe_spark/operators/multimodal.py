"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to a typed metadata struct; run decode /
feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` stages. Decode libraries (PIL/ffmpeg/etc.) are not in
this container, so the actual codec step is STUBBED (clearly marked) —
the Spark-side plumbing (schema, batching, partition discipline, UDF
signatures) is real and tested with a deterministic fake extractor.

The testdata has no binary table; ``with_binary_payload`` materializes
one from ``documents`` (utf-8 bytes), which exercises identical
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datapipe_spark.sources.tables import load_table

FEATURE_DIM = 4

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_media(payload: bytes, media_type: str):
    """Real codec entry point — NOT IMPLEMENTED in this container.

    A deployment with PIL/torchaudio/ffmpeg installed swaps this in;
    everything downstream (schema, batching) is unchanged.
    """
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment; use fake_features for plumbing tests"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: quartile byte means.
    Replaces ``decode_media`` + model forward pass in this sandbox."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    step = max(n // FEATURE_DIM, 1)
    out = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        out.append(sum(chunk) / len(chunk))
    return out


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a multimodal-shaped table: binary payload + typed
    metadata struct (mirrors the reference's opaque-properties pattern,
    realtime design.md:455-456, at the binary level)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so one Python worker call handles a whole Arrow
    batch; partitioning of the input is preserved (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["mime"] for m in pdf["meta"]],
                    "byte_len": [len(b) for b in pdf["content"]],
                    "features": [fake_features(bytes(b)) for b in pdf["content"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def chunk_payloads(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Fixed-size binary chunking (frame-sampling stand-in): one output
    row per chunk, JVM-side via sequence+transform — no Python."""
    n_chunks = F.ceil(F.length("content") / F.lit(chunk_bytes)).cast("int")
    return (
        media.withColumn("_n", n_chunks)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, _n - 1), "
                    f"i -> substring(content, i * {chunk_bytes} + 1, {chunk_bytes}))"
                )
            ).alias("chunk_id", "chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_len int, frame_crc long"
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every: int = 4
) -> DataFrame:
    """Frame sampling over binary payloads: treat each payload as a
    sequence of fixed-size frames (the deterministic stand-in for
    video frame extraction — real codecs slot into the same signature)
    and keep every ``every``-th frame.

    Arrow-batched ``mapInPandas``: per-payload frame slicing happens
    in one Python call per Arrow batch, input partitioning preserved
    (map-only — at 100 TB this scales with payload bytes, no shuffle).
    Emits a checksum per sampled frame so downstream equality checks
    don't ship frame bytes.
    """
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, crcs = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(buf)
                for fi in range(0, -(-len(b) // frame_bytes), every):
                    frame = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(frame))
                    crcs.append(zlib.crc32(frame))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_crc": crcs}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline query: documents → binary payload
    table → Arrow-batched feature extraction, projected to scalar
    feature columns f0..f3.

    Oracle-checked: the stand-in extractor's byte arithmetic (quartile
    byte means over the utf-8 payload) is replayed in DuckDB
    (``MULTIMODAL_FEATURES_SQL``) — every partial sum is an exact
    integer below 2⁵³, so the final double divisions agree bit-for-bit.
    That verifies the binary → Arrow batch → Python extractor → typed
    row plumbing end-to-end, not just that it runs. A real codec swaps
    into ``decode_media`` with the identical contract.
    """
    feats = extract_features(with_binary_payload(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "byte_len",
        *[
            F.element_at("features", i + 1).alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def _chunk_avg_sql(i: int) -> str:
    # python-slice semantics of fake_features: chunk_i = bytes[i*step :
    # (i+1)*step], falling back to the last `step` bytes when empty;
    # text is ASCII (asserted in tests), so ascii(char) == byte value
    return (
        f"CASE WHEN n = 0 THEN 0.0 "
        f"WHEN {i} * step < n THEN "
        f"list_avg([ascii(text[j]) for j in range({i}*step + 1, least(({i}+1)*step, n) + 1)]) "
        f"ELSE list_avg([ascii(text[j]) for j in range(n - step + 1, n + 1)]) END AS f{i}"
    )


MULTIMODAL_FEATURES_SQL = f"""
WITH t AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         greatest(octet_length(encode(text)) // {FEATURE_DIM}, 1) AS step
  FROM documents
)
SELECT doc_id, 'text/plain' AS media_type, CAST(n AS BIGINT) AS byte_len,
       {", ".join(_chunk_avg_sql(i) for i in range(FEATURE_DIM))}
FROM t
"""


FRAME_BYTES = 64  # stand-in frame width (bytes)
FRAME_EVERY = 4  # keep every 4th frame


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked frame sampling: the ``sample_frames`` plumbing
    (binary payload → Arrow batch → per-frame Python slicing) with an
    md5 content digest per sampled frame, so the WHOLE mapInPandas
    path — batch iteration, byte slicing, per-frame hashing, typed
    row emission — replays bit-for-bit in the DuckDB oracle (payload
    text is ASCII, asserted in tests, so byte slices equal character
    slices). A real video codec swaps into the same signature; the
    manifest schema (doc_id, frame_idx, frame_len, digest) is what a
    downstream decode stage consumes.

    Map-only at any scale: partitioning preserved, output rows ∝
    payload bytes / (FRAME_BYTES·FRAME_EVERY).
    """
    import hashlib

    media = with_binary_payload(spark, sf_dir).select("doc_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, digs = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(buf)
                for fi in range(0, -(-len(b) // FRAME_BYTES), FRAME_EVERY):
                    frame = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(frame))
                    digs.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_md5": digs,
                }
            )

    return media.mapInPandas(
        run, "doc_id long, frame_idx int, frame_len int, frame_md5 string"
    )


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, text, len(text) AS n FROM documents
), starts AS (
  SELECT doc_id, text, n,
         unnest(generate_series(0, CAST(ceil(CAST(n AS DOUBLE) / {FRAME_BYTES}) AS INT) - 1,
                                {FRAME_EVERY})) AS frame_idx
  FROM d
)
SELECT doc_id,
  CAST(frame_idx AS INT) AS frame_idx,
  CAST(LEAST({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS INT) AS frame_len,
  md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM starts
"""
