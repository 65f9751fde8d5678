#!/usr/bin/env python
"""Empirical scaling curve for the training-data operators.

Builds an R×-replicated corpus from the driver's sf0.1 testdata —
documents get a deterministic every-4th-word replica salt (destroys
cross-replica shingle similarity so near-dup structure stays
proportional to corpus size, ~75%+ of 3-gram shingles differ between
replicas), embeddings get fresh deterministic pseudo-random vectors —
then times each documents/embeddings-only registry operator at that
scale. The point is the SHAPE: map-only ops and keyed shuffles must
scale ~linearly; candidate joins must track true-duplicate counts,
never corpus².

Usage: python scripts/scale_smoke.py [R ...]   (default: 1 10)
       SMOKE_OPS=op1,op2 python scripts/scale_smoke.py 10 30
Prints one JSON line per R with per-op wall seconds. SMOKE_OPS
restricts the sweep to the named registry entries (re-smoking one
operator without paying for the other 25).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_ROOT = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "datapipe_scale_smoke"
)

# documents/embeddings-only registry entries (the scaled dir carries no
# TPC-H tables); embedding_near_dup / dedup_semantic are exact-quadratic
# in flops by contract — capped to smaller R below
DOC_OPS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring_spans",
    "dedup_clusters",
    "dedup_keep_best",
    "text_stats",
    "token_profile_by_lang",
    "corpus_quality_filter",
    "lang_id_ngram",
    "winnow_fingerprints",
    "vocab_top_tokens",
    "tokenize_with_vocab",
    "corpus_mix_domains",
    "corpus_sample_stratified",
    "pack_token_budget",
    "pii_scrub",
    "repetition_stats",
    "decontaminate",
    # round-5 additions
    "tfidf_top_terms",
    "chunk_documents",
    "contamination_score",
    "corpus_split",
    "bigram_lm_score",
    "cms_top_tokens",
    # round-6 additions
    "dedup_cross_corpus",
    "dedup_cross_corpus_minhash",
    "decontaminate_shuffle",
    "dedup_pipeline",
    "dedup_cross_corpus_indexed",
    "corpus_train_shards",
    # round-7 additions
    "corpus_train_shards_epoch",
    "dedup_cross_corpus_compacted",
    "bpe_train_merges",
    "bpe_tokenize",
]
EMB_OPS = [
    "similarity_topk",
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "knn_join_ivf",
    "knn_join_ivfpq",
    "dedup_semantic_ann",
    "label_centroid_outliers",
    "embedding_quantize_int8",
]
QUADRATIC_EMB_OPS = ["embedding_near_dup", "dedup_semantic"]  # run only at R <= 10


def build_scaled(spark, r: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SMOKE_ROOT, f"r{r}")
    if os.path.exists(os.path.join(out, "_READY")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    n_docs = docs.count()
    parts = []
    for k in range(r):
        salted = F.concat_ws(
            " ",
            F.expr(
                f"transform(split(text, ' '), (w, i) -> "
                f"IF(i % 4 = 0, concat('r{k}x', i), w))"
            ),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
                salted.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text"))
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.write.parquet(os.path.join(out, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    n_labels = emb.select("label").distinct().count()
    # deterministic pseudo-random vectors: splitmix64-style hash per
    # (vec_id, dim) mapped to [-0.5, 0.5) — JVM-side, no RNG state
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"j -> cast(pmod(xxhash64(vec_id * {dim} + j), 1000003) / 1000003.0 - 0.5 as float))"
    )
    spark.range(n_emb * r).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        F.pmod(F.col("id"), F.lit(n_labels)).cast("int").alias("label"),
    ).write.parquet(os.path.join(out, "embeddings.parquet"))
    open(os.path.join(out, "_READY"), "w").close()
    return out


def main() -> None:
    rs = [int(a) for a in sys.argv[1:]] or [1, 10]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # index-cache ops (dedup_cross_corpus_indexed) must time the COLD
    # build every run: a leftover /tmp cache from a prior invocation
    # would silently flip the measurement to warm-probe-only
    os.environ["SPARK_GRAFT_INDEX_DIR"] = os.path.join(SMOKE_ROOT, "mh_index_cache")
    shutil.rmtree(os.environ["SPARK_GRAFT_INDEX_DIR"], ignore_errors=True)
    from datapipe_spark import get_spark
    from datapipe_spark.plans import registry

    spark = get_spark("scale-smoke")
    qs = registry.queries()
    for r in rs:
        # resolve the op list BEFORE paying for the replica-corpus
        # build: a SMOKE_OPS typo (or a quadratic-tier op at r > 10)
        # must fail in milliseconds, not after minutes of Spark writes
        ops = DOC_OPS + EMB_OPS + (QUADRATIC_EMB_OPS if r <= 10 else [])
        only = os.environ.get("SMOKE_OPS")
        if only:
            wanted = [s.strip() for s in only.split(",") if s.strip()]
            for name in wanted:
                if name not in ops:
                    print(
                        f"SMOKE_OPS entry {name!r} matches no runnable op at "
                        f"r={r} (typo, or quadratic-tier at r > 10) — skipped",
                        file=sys.stderr,
                    )
            ops = [o for o in ops if o in wanted]
            if not ops:
                print(
                    f"SMOKE_OPS={only!r} matches no runnable op at r={r} "
                    f"(quadratic-tier ops run only at r <= 10)",
                    file=sys.stderr,
                )
                continue
        sf_dir = build_scaled(spark, r)
        from datapipe_spark.operators.dedup import GUARD_ACTIVATIONS

        timings: dict[str, float] = {}
        rows: dict[str, int] = {}
        errors: dict[str, str] = {}
        activations: dict[str, dict[str, int]] = {}
        for name in ops:
            snap = dict(GUARD_ACTIVATIONS)
            t0 = time.perf_counter()
            try:
                rows[name] = qs[name](spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                errors[name] = repr(exc)[:300]
                continue
            timings[name] = round(time.perf_counter() - t0, 2)
            fired = {
                k: GUARD_ACTIVATIONS[k] - snap[k]
                for k in GUARD_ACTIVATIONS
                if GUARD_ACTIVATIONS[k] > snap[k]
            }
            if fired:
                activations[name] = fired
        out = {
            "replicas": r,
            "n_docs": spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count(),
            "timings": timings,
            "rows": rows,
            "guard_activations": activations,
        }
        if errors:
            out["errors"] = errors
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
