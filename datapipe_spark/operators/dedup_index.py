"""Persisted MinHash/LSH band index — build-once / probe-many / append
cross-corpus near-dup dedup.

The inline ``dedup_cross_corpus_minhash`` recomputes the corpus-side
signatures every call; its docstring already names those frames "the
persisted-index role at 100 TB". This module IS that persistence (the
same build/probe/append split as ``similarity.build_ivf_index``, the
reference batch pipeline's incremental quality gate shape,
requirements.md): the corpus is collapsed/signed/banded ONCE and
written to the lakehouse; each incoming batch signs only itself and
equi-joins the index; verbatim-copy appends add membership rows but
zero band rows (the skew guard holds incrementally).

Layout under ``index_dir``::

    meta/   (hash, n_docs, n_reps)       one row — the index contract
    mem/    (doc_id, ghash, rep_id)      verbatim-copy membership
    sigs/   (doc_id, sh, signature)      rep-level verification sets
    bands/  band_id=*/ (doc_id, band_key)  hive-partitioned band join
                                           surface

``hash="md5"`` stores portable string shingles/band keys (oracle-
checkable); ``hash="xxhash64"`` stores int64 verification sets and
8-byte band keys — 10-20× smaller index rows for the 100 TB path.

Probe output is proven equal to the inline union pipeline
(``tests/test_llm_ops.py::test_probe_index_equals_inline_cross_corpus``):
identical texts have identical signatures, so batch-local collapse +
index join generates exactly the candidates the union-level collapse +
reach filter does, and both verify the same exact jaccard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _collapse_exact,
    _rep_docs,
    band_rows,
    minhash_signatures,
)


# bump on ANY on-disk layout change (partitioning, schema, hashing):
# it keys the /tmp build-once cache, so a stale pre-change index can
# never be probed by post-change code (a layout change without a bump
# produced silently-wrong appends once — mixed partitioned/flat bands)
_INDEX_FORMAT_VERSION = 2


def _p(index_dir: str, part: str) -> str:
    return index_dir.rstrip("/") + "/" + part


def _write_parts(
    mem: DataFrame, sigs: DataFrame, index_dir: str, mode: str
) -> None:
    mem.select("doc_id", "ghash", "rep_id").write.mode(mode).parquet(
        _p(index_dir, "mem")
    )
    sigs.select("doc_id", F.col("_sh").alias("sh"), "signature").write.mode(
        mode
    ).parquet(_p(index_dir, "sigs"))
    # flat layout: every probe touches all _BANDS bands, so partitioning
    # by band_id prunes nothing and multiplies files 8×; the 100 TB
    # layout win is bucketing by band_key (co-located probe join), which
    # a lakehouse table format would declare on this same column
    band_rows(sigs, hash=_meta_hash_of(sigs)).withColumn(
        "band_key", F.col("band_key").cast("string")
    ).write.mode(mode).parquet(_p(index_dir, "bands"))


def _meta_hash_of(sigs: DataFrame) -> str:
    # xxhash64 verification sets are int64; md5 keeps raw shingle strings
    return "md5" if dict(sigs.dtypes)["_sh"] == "array<string>" else "xxhash64"


def build_minhash_index(
    spark: SparkSession, docs: DataFrame, index_dir: str, hash: str = "md5"
) -> dict:
    """Build the corpus band index from ``(doc_id, text)`` rows.

    One linear pass: verbatim-copy collapse (membership), sign the
    representatives, explode band keys. All three artifacts are
    map-side-combinable or per-row — no all-pairs work at build time,
    and the bands/ join surface is O(reps × _BANDS) rows regardless of
    copy skew. Returns ``{"n_docs", "n_reps", "index_dir"}``.
    """
    mem = _collapse_exact(docs.select("doc_id", "text")).persist()
    reps = _rep_docs(docs, mem)
    sigs = (
        minhash_signatures(reps, hash=hash)
        .select(
            "doc_id",
            (
                F.col("_sh")
                if hash == "md5"
                else F.expr("transform(_sh, s -> xxhash64(s))")
            ).alias("_sh"),
            "signature",
        )
        .persist()
    )
    _write_parts(mem, sigs, index_dir, "overwrite")
    n_docs, n_reps = mem.count(), sigs.count()
    spark.createDataFrame(
        [(hash, n_docs, n_reps)], "hash string, n_docs long, n_reps long"
    ).coalesce(1).write.mode("overwrite").parquet(_p(index_dir, "meta"))
    mem.unpersist()
    sigs.unpersist()
    return {"n_docs": n_docs, "n_reps": n_reps, "index_dir": index_dir}


def _meta(spark: SparkSession, index_dir: str) -> dict:
    r = spark.read.parquet(_p(index_dir, "meta")).head()
    return {"hash": r["hash"], "n_docs": r["n_docs"], "n_reps": r["n_reps"]}


def append_minhash_index(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> None:
    """Incremental add with the frozen index contract (faiss ``add()``
    posture, same as ``append_ivf_index``): rep identity is stable once
    assigned.

    New docs whose content hash already exists in ``mem/`` append ONLY
    a membership row under the existing rep — zero new signature or
    band rows, which is the skew guard working incrementally (a
    million-copy boilerplate burst adds a million mem rows and nothing
    to the band join surface). Genuinely new content appends its own
    rep's membership, signature, and band rows to their partitions.
    Docs under 3 words carry no shingles and are not indexable —
    exactly the population the inline pipelines exclude (they belong
    to the exact content-hash index instead).
    """
    h = _meta(spark, index_dir)["hash"]
    bm = _collapse_exact(new_docs.select("doc_id", "text")).localCheckpoint(
        eager=True
    )
    # existing-rep lookup: broadcast the BATCH ghash set into the index
    # scan so the index side is a map-only probe (never shuffled on
    # ghash — per-batch cost tracks the batch, not the corpus)
    existing = (
        spark.read.parquet(_p(index_dir, "mem"))
        .join(F.broadcast(bm.select("ghash").distinct()), "ghash")
        .groupBy("ghash")
        .agg(F.min("rep_id").alias("_old_rep"))
    )
    batch_mem = bm.join(F.broadcast(existing), "ghash", "left")
    # materialize BOTH deltas off one consistent index snapshot before
    # any write: the first append to mem/ would otherwise invalidate /
    # re-list the lazy plans still reading it (Spark recaches by path on
    # insert), silently dropping the new reps' sig/band rows
    mem = batch_mem.select(
        "doc_id", "ghash", F.coalesce("_old_rep", "rep_id").alias("rep_id")
    ).localCheckpoint(eager=True)
    # reps that are NEW content: batch rep rows whose ghash missed the index
    new_reps = batch_mem.filter(
        F.col("_old_rep").isNull() & (F.col("doc_id") == F.col("rep_id"))
    ).select("doc_id")
    sigs = (
        minhash_signatures(new_docs.join(new_reps, "doc_id"), hash=h)
        .select(
            "doc_id",
            (
                F.col("_sh")
                if h == "md5"
                else F.expr("transform(_sh, s -> xxhash64(s))")
            ).alias("_sh"),
            "signature",
        )
        .localCheckpoint(eager=True)
    )
    _write_parts(mem, sigs, index_dir, "append")


def probe_minhash_index(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Probe an incoming ``(doc_id, text)`` batch against the persisted
    corpus index → oriented ``(new_doc_id, corpus_doc_id, jaccard)``
    pairs at jaccard ≥ threshold.

    Per-batch work: collapse/sign the BATCH only, then three equi-joins
    against index tables — band join for candidates, sigs join for
    exact-jaccard verification, mem join for member expansion. The
    batch side is broadcast into every index join (plan-gated), so the
    index is only ever map-side probed; I/O is proportional to matched
    keys, never corpus size; nothing is retrained or re-signed. Batch
    doc_ids must be disjoint from corpus doc_ids (they are new
    arrivals by definition), and batches are micro-batch-sized by
    contract — bulk re-dedup belongs to the inline op.
    """
    out, bmem, bsigs = _probe_plan(spark, index_dir, batch_docs, threshold)
    from datapipe_spark.util import materialize_and_release

    return materialize_and_release(out, bmem, bsigs)


def _probe_plan(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
):
    """The probe's un-materialized plan + its two batch-side caches —
    split out so plan-shape tests can inspect the joins before the
    eager checkpoint hides them."""
    h = _meta(spark, index_dir)["hash"]
    bmem = _collapse_exact(batch_docs.select("doc_id", "text")).persist()
    bsigs = (
        minhash_signatures(_rep_docs(batch_docs, bmem), hash=h)
        .select(
            "doc_id",
            (
                F.col("_sh")
                if h == "md5"
                else F.expr("transform(_sh, s -> xxhash64(s))")
            ).alias("sh"),
            "signature",
        )
        .persist()
    )
    bbands = band_rows(
        bsigs.select("doc_id", "signature"), hash=h
    ).withColumn("band_key", F.col("band_key").cast("string"))

    # batch side broadcast into EVERY index join: the index tables are
    # the big side by definition and must only ever be map-side probed —
    # no shuffle of bands/sigs/mem, per-probe cost ∝ batch + matches
    ibands = spark.read.parquet(_p(index_dir, "bands"))
    cand = (
        F.broadcast(bbands)
        .join(
            ibands.select(
                "band_id",
                "band_key",
                F.col("doc_id").alias("corpus_rep"),
            ),
            ["band_id", "band_key"],
        )
        .select(F.col("doc_id").alias("batch_rep"), "corpus_rep")
        .dropDuplicates(["batch_rep", "corpus_rep"])
    )

    isigs = spark.read.parquet(_p(index_dir, "sigs")).select(
        F.col("doc_id").alias("corpus_rep"), F.col("sh").alias("sh_c")
    )
    verified = (
        cand.join(
            F.broadcast(
                bsigs.select(
                    F.col("doc_id").alias("batch_rep"), F.col("sh").alias("sh_b")
                )
            ),
            "batch_rep",
        )
        .transform(lambda d: F.broadcast(d).join(isigs, "corpus_rep"))
    )
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size("sh_b") + F.size("sh_c") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    rep_pairs = verified.select(
        "batch_rep", "corpus_rep", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)

    imem = spark.read.parquet(_p(index_dir, "mem")).select(
        F.col("rep_id").alias("corpus_rep"), F.col("doc_id").alias("corpus_doc_id")
    )
    bmembers = bmem.select(
        F.col("rep_id").alias("batch_rep"), F.col("doc_id").alias("new_doc_id")
    )
    out = (
        rep_pairs.join(F.broadcast(bmembers), "batch_rep")
        .transform(lambda d: F.broadcast(d).join(imem, "corpus_rep"))
        .select("new_doc_id", "corpus_doc_id", "jaccard")
    )
    return out, bmem, bsigs


def dedup_cross_corpus_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of the probe: the deterministic corpus/batch split
    of ``dedup_cross_corpus_minhash``, but the corpus side served from
    a PERSISTED band index instead of inline recomputation.

    Semantics identical by construction to the inline op (same oracle,
    ``DEDUP_CROSS_CORPUS_MINHASH_SQL``) — what changes is the cost
    shape: the corpus is signed once per dataset (index cached under
    /tmp keyed by the documents parquet's identity, ``_READY``-marked
    like the streaming drops) and every probe touches the batch plus
    matched index keys only.
    """
    from datapipe_spark.operators.dedup import _cross_tagged

    tagged = _cross_tagged(spark, sf_dir)
    idx = _cached_corpus_index(
        spark, sf_dir, tagged.filter(~F.col("is_new")).select("doc_id", "text")
    )
    return probe_minhash_index(
        spark, idx, tagged.filter("is_new").select("doc_id", "text")
    )


def _cached_corpus_index(
    spark: SparkSession, sf_dir: str, corpus: DataFrame
) -> str:
    """Build-once cache of the corpus band index for a testdata dir,
    keyed by the documents parquet's (path, size, mtime) so a driver
    regeneration invalidates it."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:v{_INDEX_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR", "/tmp/datapipe_spark_minhash_index"
    )
    out = os.path.join(root, key)
    if not os.path.exists(os.path.join(out, "_READY")):
        build_minhash_index(spark, corpus, out)
        open(os.path.join(out, "_READY"), "w").close()
    return out
