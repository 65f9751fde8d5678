"""Oracle parity + semantics for the behavior-analytics family
(ordered funnel, retention cohorts, transitions) and the round-5
curation batch (TF-IDF, chunking, contamination score, corpus split).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipe_spark.operators import decontam, textstats
from datapipe_spark.plans import behavior
from tests.oracle import compare_to_oracle

CASES = [
    (behavior.event_funnel_conversion, behavior.EVENT_FUNNEL_CONVERSION_SQL),
    (behavior.user_retention_cohorts, behavior.USER_RETENTION_COHORTS_SQL),
    (behavior.event_transitions, behavior.EVENT_TRANSITIONS_SQL),
    (textstats.tfidf_top_terms, textstats.TFIDF_TOP_TERMS_SQL),
    (textstats.chunk_documents, textstats.CHUNK_DOCUMENTS_SQL),
    (decontam.contamination_score, decontam.CONTAMINATION_SCORE_SQL),
    (decontam.corpus_split, decontam.CORPUS_SPLIT_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_matches_oracle(spark, sf_dir, fn, sql):
    compare_to_oracle(spark, fn, sql, sf_dir)


def test_funnel_stage_monotone(spark, sf_dir):
    # each funnel stage can only lose users, never gain them
    bad = (
        behavior.event_funnel_conversion(spark, sf_dir)
        .filter(
            (F.col("clickers") > F.col("viewers"))
            | (F.col("purchasers") > F.col("clickers"))
        )
        .count()
    )
    assert bad == 0


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    sums = (
        behavior.event_transitions(spark, sf_dir)
        .groupBy("from_type")
        .agg(F.sum("p").alias("total"))
        .collect()
    )
    assert sums and all(abs(r.total - 1.0) < 1e-9 for r in sums)


def test_retention_week_zero_is_full(spark, sf_dir):
    rows = (
        behavior.user_retention_cohorts(spark, sf_dir)
        .filter(F.col("week_offset") == 0)
        .collect()
    )
    assert rows and all(r.n_active == r.cohort_size and r.retention == 1.0 for r in rows)


def test_tfidf_rank_bounds(spark, sf_dir):
    out = textstats.tfidf_top_terms(spark, sf_dir)
    assert out.filter((F.col("rank") < 1) | (F.col("rank") > textstats.TFIDF_TOP_TERMS)).count() == 0
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > textstats.TFIDF_TOP_TERMS).count() == 0


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Taking each chunk's first CHUNK_STRIDE words (all words for the
    last chunk) in chunk order must reproduce the document exactly —
    no word lost or duplicated by the overlap bookkeeping."""
    from datapipe_spark.sources.tables import load_table

    chunks = textstats.chunk_documents(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            words = r.chunk_text.split(" ")
            keep = words if i == len(rows) - 1 else words[: textstats.CHUNK_STRIDE]
            rebuilt.extend(keep)
        assert " ".join(rebuilt) == docs[doc_id], doc_id


def test_corpus_split_shares_and_determinism(spark, sf_dir):
    out = decontam.corpus_split(spark, sf_dir)
    total = out.count()
    shares = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # hash buckets: train ~80%, val ~10%, test ~10% (loose bounds at
    # small N; the exact assignment is locked by the oracle test)
    assert shares.get("train", 0) / total > 0.6
    assert set(shares) <= {"train", "val", "test"}
    again = {r.doc_id: r.split for r in decontam.corpus_split(spark, sf_dir).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again


def test_contamination_score_consistent_with_flag(spark, sf_dir):
    score = decontam.contamination_score(spark, sf_dir).select("doc_id", "n_shared")
    flag = decontam.decontaminate(spark, sf_dir).select("doc_id", "is_contaminated")
    joined = score.join(flag, "doc_id")
    assert joined.filter(
        ((F.col("n_shared") >= 1) != F.col("is_contaminated"))
    ).count() == 0
    # scores live in [0, 1]
    s = decontam.contamination_score(spark, sf_dir)
    assert s.filter((F.col("contamination") < 0) | (F.col("contamination") > 1)).count() == 0


def test_round5_batch3_oracle(spark, sf_dir):
    from datapipe_spark.operators import similarity

    for fn, sql in [
        (textstats.bigram_lm_score, textstats.BIGRAM_LM_SCORE_SQL),
        (textstats.cms_top_tokens, textstats.CMS_TOP_TOKENS_SQL),
        (similarity.label_centroid_outliers, similarity.LABEL_CENTROID_OUTLIERS_SQL),
    ]:
        compare_to_oracle(spark, fn, sql, sf_dir)


def test_cms_never_undercounts(spark, sf_dir):
    # the count-min guarantee: estimate >= truth, always
    out = textstats.cms_top_tokens(spark, sf_dir)
    assert out.count() > 0
    assert out.filter(F.col("overcount") < 0).count() == 0


def test_bigram_lm_covers_multiword_docs(spark, sf_dir):
    from datapipe_spark.sources.tables import load_table

    scored = textstats.bigram_lm_score(spark, sf_dir)
    multi = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 2)
        .count()
    )
    assert scored.count() == multi
    assert scored.filter(F.col("perplexity") <= 0).count() == 0


def test_centroid_cosine_bounds(spark, sf_dir):
    from datapipe_spark.operators import similarity

    out = similarity.label_centroid_outliers(spark, sf_dir)
    assert out.filter((F.col("cos_centroid") < -1.000001) | (F.col("cos_centroid") > 1.000001)).count() == 0
