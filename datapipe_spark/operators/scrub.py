"""Corpus scrubbing: PII redaction + repetition quality signals
(build-brief extension surface — the scrub stages a large-scale
training-data pipeline runs alongside dedup/decontamination).

PII redaction is the standard pre-training scrub: emails, phone
numbers, and IPv4 addresses are replaced with typed placeholder
tokens and counted per document. The testdata corpus is synthetic
word-soup with no PII, so the operator *plants* deterministic PII
into a fixed slice of documents (``doc_id % 7 == 0``) before
scrubbing — the redaction path is exercised on ~14% of the corpus
and the clean path on the rest, and both engines (Spark and the
DuckDB oracle) derive the identical planted corpus, so the oracle
checks real redaction behavior, not a no-op.

Repetition signals are the Gopher-style quality-filter inputs
(Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1):
duplicate-word fraction and most-frequent-word share. Heavily
repetitive documents (boilerplate, keyword stuffing, scraper loops)
are the classic low-quality slice these cut.

Scale design:
- redaction is pure per-row column algebra (``regexp_count`` /
  ``regexp_replace`` in whole-stage codegen) — map-only, no shuffle,
  linear scale-out. The regexes are RE2-safe (no backtracking
  blowups) so worst-case cost stays linear in document length.
- repetition stats shuffle once on ``(doc_id, word)`` with map-side
  combine — the canonical word-count shape; partial aggregation means
  the shuffle carries at most |distinct words per doc| rows per
  document, not |words|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.sources.tables import load_table

# one doc in _PII_MOD gets planted PII appended (see module docstring)
_PII_MOD = 7

# patterns are written to the RE2 ∩ java.util.regex common subset so
# Spark and DuckDB match identical spans
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _planted(doc_id, text):
    """Deterministic planted-PII corpus: same derivation in Spark and
    the oracle SQL below."""
    pii = F.concat(
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com call 555-867-"),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (doc_id % 256).cast("string"),
        F.lit(".25"),
    )
    return F.when(doc_id % _PII_MOD == 0, F.concat(text, pii)).otherwise(text)


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails → ``<EMAIL>``, phone numbers → ``<PHONE>``, IPv4
    addresses → ``<IP>`` over the (planted-PII) corpus; count each
    PII type per document. Order matters: emails first, else the
    trailing IP-ish digits of an address like ``a@b.co`` never arise
    here but phone/IP patterns could overlap digit runs — counts are
    taken on the *original* text so they are order-independent."""
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    text = _planted(doc_id, F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IPV4_RE,
        "<IP>",
    )
    n_emails = F.regexp_count(text, F.lit(_EMAIL_RE))
    n_phones = F.regexp_count(text, F.lit(_PHONE_RE))
    n_ips = F.regexp_count(text, F.lit(_IPV4_RE))
    return d.select(
        "doc_id",
        "lang",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        n_ips.cast("int").alias("n_ips"),
        ((n_emails + n_phones + n_ips) == 0).alias("is_clean"),
        redacted.alias("text_redacted"),
    )


PII_SCRUB_SQL = f"""
WITH planted AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % {_PII_MOD} = 0 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25'
    ELSE text END AS text
  FROM documents
)
SELECT doc_id, lang,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS INT) AS n_ips,
  len(regexp_extract_all(text, '{_EMAIL_RE}'))
    + len(regexp_extract_all(text, '{_PHONE_RE}'))
    + len(regexp_extract_all(text, '{_IPV4_RE}')) = 0 AS is_clean,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g'),
    '{_IPV4_RE}', '<IP>', 'g') AS text_redacted
FROM planted
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: word counts,
    duplicate-word fraction (1 − distinct/total), and the most
    frequent word's share of the document. Downstream quality filters
    cut documents whose ``top_word_frac`` / ``dup_word_ratio`` exceed
    corpus thresholds."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_word = words.groupBy("doc_id", "word").agg(F.count("*").alias("n"))
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("n").cast("int").alias("n_words"),
        F.count("*").cast("int").alias("n_distinct_words"),
        F.max("n").cast("int").alias("top_word_count"),
    )
    n_words_d = F.col("n_words").cast("double")
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "top_word_count",
        (F.lit(1.0) - F.col("n_distinct_words") / n_words_d).alias("dup_word_ratio"),
        (F.col("top_word_count") / n_words_d).alias("top_word_frac"),
    )


REPETITION_STATS_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
)
SELECT doc_id,
  CAST(SUM(n) AS INT) AS n_words,
  CAST(COUNT(*) AS INT) AS n_distinct_words,
  CAST(MAX(n) AS INT) AS top_word_count,
  1.0 - COUNT(*) / CAST(SUM(n) AS DOUBLE) AS dup_word_ratio,
  MAX(n) / CAST(SUM(n) AS DOUBLE) AS top_word_frac
FROM c
GROUP BY doc_id
"""
