"""Text analysis operators for training-data pipelines.

Beyond the reference's own surface (per the build brief): language-ID,
quality scoring, token counting, document fingerprinting — all over the
``documents`` table. Everything except the n-gram language-ID model is
pure ``pyspark.sql.functions`` (JVM-side, codegen-friendly); the
language-ID centroid scorer is an Arrow-batched Pandas UDF.

Scale notes: all per-document ops are embarrassingly parallel map work
(no shuffle); the language-ID "training" aggregation is one groupBy on
a 5-value key, and its centroid table broadcasts to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipe_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _token_stat_cols():
    """The whitespace token-stat expressions shared by ``text_stats``
    and ``corpus_quality_filter`` (r12 review: two hand copies under
    separate oracles could drift — the quality gate is documented as
    column algebra over the stats). Returns ``(n_tokens, n_distinct,
    n_stop, stop_ratio, distinct_ratio)`` over a ``text`` column."""
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({_STOP_SQL}))"))
    stop_ratio = n_stop.cast("double") / n_tokens
    distinct_ratio = n_distinct.cast("double") / n_tokens
    return n_tokens, n_distinct, n_stop, stop_ratio, distinct_ratio


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics + content fingerprint.

    Whitespace token count, distinct-token ratio, average token length
    (closed form — text is single-space separated), stopword ratio, and
    a composite quality score; md5 content fingerprint for exact-dup
    detection downstream.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens, n_distinct, n_stop, stop_ratio, distinct_ratio = _token_stat_cols()
    avg_token_len = (F.col("n_chars") - n_tokens + 1).cast("double") / n_tokens
    quality = (
        distinct_ratio * 0.5
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(avg_token_len / 10.0, F.lit(1.0)) * 0.2
    )
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_stop.alias("n_stopwords"),
        avg_token_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality_score"),
        F.md5("text").alias("fingerprint"),
    )


TEXT_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS w FROM documents
)
SELECT doc_id, lang, n_chars,
  len(w) AS n_tokens,
  len(list_distinct(w)) AS n_distinct_tokens,
  len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS n_stopwords,
  CAST(n_chars - len(w) + 1 AS DOUBLE) / len(w) AS avg_token_len,
  CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(w)
    AS stopword_ratio,
  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.5
    + (1.0 - CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(w)) * 0.3
    + LEAST((CAST(n_chars - len(w) + 1 AS DOUBLE) / len(w)) / 10.0, 1.0) * 0.2
    AS quality_score,
  md5(text) AS fingerprint
FROM t
"""


def token_profile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language using the regex
    pre-tokenizer (BPE-style segmentation: letter runs / digit runs /
    symbols) — the "how many tokens is this corpus" query every
    training pipeline runs first."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0))
    per_doc = d.select("lang", "n_chars", toks.alias("n_regex_tokens"))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_regex_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_regex_tokens").cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
        # try_divide, not /: the session runs ANSI mode, and a language
        # whose docs match no regex token (all-whitespace text) would
        # abort the whole report with DIVIDE_BY_ZERO (r12 review,
        # probe-confirmed); NULL for that row on both engines instead
        F.try_divide(
            F.sum("n_chars").cast("double"), F.sum("n_regex_tokens")
        ).alias("chars_per_token"),
    )


TOKEN_PROFILE_BY_LANG_SQL = f"""
WITH t AS (
  SELECT lang, n_chars,
         len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_regex_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_regex_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_regex_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
       CAST(SUM(n_chars) AS DOUBLE) / NULLIF(SUM(n_regex_tokens), 0)
         AS chars_per_token
FROM t GROUP BY lang
"""


LANG_ID_DIM = 4096  # hashed-trigram feature space (collisions ≈ 1/D per pair)
LANG_ID_TRAIN_DOCS = 128  # per-language training-sample cap (deterministic)


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram language ID. Hash-oracled since r12 (r11
    verdict ask #5): the whole model is a deterministic function of the
    corpus, and the scorer keeps every cross-engine-comparable quantity
    EXACT — see ``lang_id_ngram_frame`` and ``LANG_ID_NGRAM_SQL``."""
    return lang_id_ngram_frame(load_table(spark, sf_dir, "documents"))


def lang_id_ngram_frame(d: DataFrame) -> DataFrame:
    """Train per-language centroids over hashed character trigrams and
    score every document by cosine against them.

    Feature space: trigram → 24-bit byte code (``b0<<16|b1<<8|b2``)
    mod ``LANG_ID_DIM``. Training is all JVM-side — a deterministic
    per-language sample (first ``LANG_ID_TRAIN_DOCS`` doc_ids per
    lang, ranked over a 2-column pruned projection so the sampling
    shuffle carries ids, not text) → trigram explode → one groupBy on
    (lang, dim) — so the driver collects at most L×LANG_ID_DIM rows
    and the explode touches at most L×LANG_ID_TRAIN_DOCS documents
    regardless of corpus size (the unhashed full-corpus
    trigram-vocabulary collect this replaced scales with the corpus;
    this does not — centroid direction converges long before 128 docs
    of trigrams per language). Scoring is an Arrow-batched pandas UDF that builds
    the whole batch's doc×dim count matrix with ONE ``np.bincount``
    over byte-decoded text (no per-document Python loop) and ranks all
    languages with one matmul against the stacked, L2-normalized
    centroid matrix — the per-byte cost is numpy, not interpreter.
    Ties/zero vectors resolve to the alphabetically first language
    (argmax-first over the sorted language axis), matching the old
    scorer's strict-improvement scan.

    Oracle exactness (r12, upgraded from rows-only): the score kept for
    argmax is ``dot(x_counts, c_counts) / ||c_counts||`` with RAW
    integer counts — the document norm is a per-document positive
    constant, so dropping it changes no argmax. Every dot product is a
    sum of non-negative integer-valued float64 terms far below 2^53,
    hence EXACT in any summation order on any engine; the norm is one
    correctly-rounded sqrt of an exact integer and the division is one
    correctly-rounded op. DuckDB replaying the same formula
    (``LANG_ID_NGRAM_SQL``) therefore produces bit-identical scores,
    and the shared tie-break (max score, then alphabetically first
    language) makes predictions hash-comparable, not just
    approximately equal.

    Non-ASCII caveat: Python-side byte codes come from latin-1
    ('replace'), JVM-side dims from ``ascii()`` codepoints — identical
    for codepoints ≤ 255; beyond that a trigram may train and score in
    different hash buckets (testdata is ASCII; asserted in tests).

    Output: per-doc predicted language + match flag vs the labeled
    column. On synthetic testdata (shared vocabulary across langs)
    accuracy is near-chance; the train/broadcast/score plumbing is the
    deliverable — crafted disjoint-vocabulary corpora separate
    perfectly (property-tested).
    """
    import numpy as np
    import pandas as pd

    dim_expr = F.pmod(
        F.ascii(F.col("tri")) * 65536
        + F.ascii(F.substring("tri", 2, 1)) * 256
        + F.ascii(F.substring("tri", 3, 1)),
        F.lit(LANG_ID_DIM),
    )
    wl = Window.partitionBy("lang").orderBy("doc_id")
    train_ids = (
        d.select("lang", "doc_id")
        .withColumn("_rk", F.row_number().over(wl))
        .filter(F.col("_rk") <= LANG_ID_TRAIN_DOCS)
        .select("doc_id")
    )
    # length >= 3 guard (r12 review, probe-confirmed): for shorter
    # texts sequence(0, length-3) DESCENDS (e.g. [0,-1]) and emits
    # phantom sub-3-char "trigrams" the scorer and the DuckDB oracle
    # (range(1, len-1) — empty) never see
    tri = d.join(train_ids, "doc_id").filter(F.length("text") >= 3).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, length(text)-3), i -> substring(text, i+1, 3))"
            )
        ).alias("tri"),
    )
    profile = (
        tri.select("lang", dim_expr.alias("dim"))
        .groupBy("lang", "dim")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    langs = sorted({r["lang"] for r in profile})
    cmat = np.zeros((len(langs), LANG_ID_DIM))
    li = {lang: i for i, lang in enumerate(langs)}
    for r in profile:
        cmat[li[r["lang"]], r["dim"]] = r["n"]
    # RAW counts kept exact; only the centroid norm divides the score
    # (the document norm is argmax-invariant) — see docstring oracle-
    # exactness note
    # every lang in `profile` has >= 1 positive bucket, so norms > 0
    # by construction — no zero guard (the oracle's cnorm CTE has none)
    cnorms = np.linalg.norm(cmat, axis=1)
    bc = d.sparkSession.sparkContext.broadcast((langs, cmat, cnorms))

    # note: no type hints — `from __future__ import annotations` turns
    # them into strings pyspark's hint parser rejects
    def _predict(texts):
        langs, cmat, cnorms = bc.value
        # row-chunked: the DENSE doc×dim count matrix (and its int64
        # bincount intermediate) is the only batch-size amplification
        # here — at Arrow's default 10k-row batches it would transiently
        # hold ~330 MB×2 per task. 1024-row chunks bound it at ~33 MB×2
        # per task at no asymptotic cost; everything else stays
        # batch-vectorized.
        CHUNK = 1024
        out: list[str] = []
        for lo in range(0, len(texts), CHUNK):
            sub = texts.iloc[lo : lo + CHUNK]
            n = len(sub)
            bufs = [
                np.frombuffer(t.encode("latin-1", "replace"), dtype=np.uint8)
                for t in sub
            ]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            starts = np.cumsum(lens) - lens
            total = np.concatenate(bufs) if lens.sum() else np.zeros(0, np.uint8)
            # trigram codes at every in-doc position, chunk-wide: one
            # vectorized pass over the concatenated bytes, boundary
            # positions excluded by construction of the gather index
            nval = np.maximum(lens - 2, 0)
            doc_of = np.repeat(np.arange(n), nval)
            local = np.arange(nval.sum()) - np.repeat(np.cumsum(nval) - nval, nval)
            pos = local + np.repeat(starts, nval)
            codes = (
                (total[pos].astype(np.int64) << 16)
                | (total[pos + 1].astype(np.int64) << 8)
                | total[pos + 2].astype(np.int64)
            ) % LANG_ID_DIM
            x = np.bincount(
                doc_of * LANG_ID_DIM + codes, minlength=n * LANG_ID_DIM
            ).reshape(n, LANG_ID_DIM).astype(np.float64)
            # exact integer dots (docstring), one rounded division per
            # (doc, lang); first max over the sorted lang axis = the
            # alphabetical tie-break the oracle replays
            best = np.argmax((x @ cmat.T) / cnorms, axis=1)
            out.extend(langs[i] for i in best)
        return pd.Series(out, dtype="object")

    predict = F.pandas_udf(_predict, "string")
    return d.select(
        "doc_id", "lang", predict(F.col("text")).alias("predicted_lang")
    ).withColumn("lang_match", F.col("predicted_lang") == F.col("lang"))


# DuckDB replay of lang_id_ngram (r11 verdict ask #5 — the simhash-r3
# posture applied to the classifier): same training sample (first
# LANG_ID_TRAIN_DOCS doc_ids per lang), same 24-bit trigram hash mod
# LANG_ID_DIM, same exact-integer dot / centroid-norm score, same
# (score DESC, lang ASC) tie-break. Bit-equality of scores is
# structural, not approximate — see lang_id_ngram_frame's docstring.
LANG_ID_NGRAM_SQL = f"""
WITH train AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
    FROM documents
  ) WHERE rk <= {LANG_ID_TRAIN_DOCS}
),
tri_train AS (
  SELECT d.lang,
         unnest([(ord(d.text[i:i]) * 65536 + ord(d.text[i+1:i+1]) * 256
                  + ord(d.text[i+2:i+2])) % {LANG_ID_DIM}
                 for i in range(1, length(d.text) - 1)]) AS dim
  FROM documents d JOIN train USING (doc_id)
),
centroid AS (
  SELECT lang, dim, CAST(COUNT(*) AS DOUBLE) AS c
  FROM tri_train GROUP BY lang, dim
),
cnorm AS (
  SELECT lang, sqrt(SUM(c * c)) AS nrm FROM centroid GROUP BY lang
),
tri_doc AS (
  SELECT d.doc_id,
         unnest([(ord(d.text[i:i]) * 65536 + ord(d.text[i+1:i+1]) * 256
                  + ord(d.text[i+2:i+2])) % {LANG_ID_DIM}
                 for i in range(1, length(d.text) - 1)]) AS dim
  FROM documents d
),
x AS (
  SELECT doc_id, dim, CAST(COUNT(*) AS DOUBLE) AS n
  FROM tri_doc GROUP BY doc_id, dim
),
score AS (
  SELECT x.doc_id, c.lang, SUM(x.n * c.c) AS dot
  FROM x JOIN centroid c USING (dim)
  GROUP BY x.doc_id, c.lang
),
pred AS (
  SELECT s.doc_id, s.lang AS predicted_lang,
         ROW_NUMBER() OVER (
           PARTITION BY s.doc_id
           ORDER BY s.dot / n.nrm DESC, s.lang ASC
         ) AS rk
  FROM score s JOIN cnorm n ON s.lang = n.lang
)
SELECT d.doc_id, d.lang,
       COALESCE(p.predicted_lang, (SELECT MIN(lang) FROM centroid))
         AS predicted_lang,
       d.lang = COALESCE(p.predicted_lang, (SELECT MIN(lang) FROM centroid))
         AS lang_match
FROM documents d
LEFT JOIN pred p ON d.doc_id = p.doc_id AND p.rk = 1
"""
# The LEFT JOIN + COALESCE arm mirrors the scorer's zero-vector /
# zero-overlap behavior: a document shorter than 3 chars or sharing no
# trigram bucket with any centroid has every dot = 0, and np.argmax
# over all-zero scores returns index 0 = the alphabetically first
# language. Score rows, when present, always carry dot > 0 (counts are
# positive), so the COALESCE fires exactly when Spark's all-zero path
# does — no tie ambiguity between present and absent langs.


def winnow_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = 5, window: int = 4, hash: str = "md5"
) -> DataFrame:
    """Document fingerprinting via winnowing (hashed k-grams,
    per-window minimum selection — the MOSS algorithm).

    ``hash="md5"`` (default) makes the whole operator engine-portable:
    md5 hex digests are identical across engines and window-min is
    lexicographic, so the fingerprint sets are DuckDB-oracle-checkable
    value for value (``WINNOW_FINGERPRINTS_SQL``). ``hash="xxhash64"``
    is the cheaper 64-bit variant for the 100 TB path (≈2× less hash
    CPU, 8-byte prints), engine-specific by nature.

    JVM-side either way: k-gram hashing and window-min selection are
    per-document array expressions — no shuffle, no Python. Output
    carries the fingerprint set sorted and comma-joined (a scalar
    column, driver-canonicalization-safe) plus its size.
    """
    d = load_table(spark, sf_dir, "documents")
    if hash not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash family {hash!r}; use 'md5' or 'xxhash64'")
    gram_fn = hash
    # _w materialized as a column first: split(text) INSIDE the lambda
    # would re-split the document once per gram — O(words²) string
    # work per doc, a real hazard at book-length documents (the same
    # pattern substring_dup_spans eliminated in r5)
    grams = F.expr(
        f"transform(sequence(1, greatest(size(_w)-{k}+1, 1)), "
        f"i -> {gram_fn}(concat_ws(' ', slice(_w, i, {k}))))"
    )
    wins = F.expr(
        f"transform(sequence(1, greatest(size(_grams)-{window}+1, 1)), "
        f"i -> array_min(slice(_grams, i, {window})))"
    )
    return (
        d.withColumn("_w", F.split("text", " "))
        .withColumn("_grams", grams)
        .withColumn("_fps", F.array_distinct(wins))
        .select(
            "doc_id",
            "lang",
            F.size("_fps").alias("n_fingerprints"),
            F.array_join(F.array_sort("_fps"), ",").alias("fingerprints"),
        )
    )


WINNOW_FINGERPRINTS_SQL = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, lang,
    [md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))
     for i in range(1, greatest(len(w) - 5 + 2, 2))] AS grams
  FROM t
), f AS (
  SELECT doc_id, lang,
    list_distinct([list_min(grams[i:i+3])
                   for i in range(1, greatest(len(grams) - 4 + 2, 2))]) AS fps
  FROM g
)
SELECT doc_id, lang, CAST(len(fps) AS INT) AS n_fingerprints,
       array_to_string(list_sort(fps), ',') AS fingerprints
FROM f
"""


# Quality-filter thresholds (documented constants so the oracle SQL and
# the Spark plan stay in lockstep).
QF_MIN_TOKENS = 10
QF_MAX_TOKENS = 5000
QF_MAX_STOP_RATIO = 0.5
QF_MIN_DISTINCT_RATIO = 0.3


def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus quality gate: the standard pre-training filter
    chain (length window, stopword saturation, repetitiveness) with a
    per-document keep/drop decision and the *first* failing reason —
    the shape every data pipeline wants for filter-rate dashboards.

    Pure column algebra over the text_stats features: one scan, no
    shuffle; at 100 TB this is a map-only job that parquet-prunes to
    (doc_id, lang, text) columns.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens, _n_distinct, _n_stop, stop_ratio, distinct_ratio = _token_stat_cols()
    reason = (
        F.when(n_tokens < QF_MIN_TOKENS, "too_short")
        .when(n_tokens > QF_MAX_TOKENS, "too_long")
        .when(stop_ratio > QF_MAX_STOP_RATIO, "stopword_saturated")
        .when(distinct_ratio < QF_MIN_DISTINCT_RATIO, "repetitive")
        .otherwise("kept")
    )
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        reason.alias("filter_reason"),
        (reason == "kept").alias("keep"),
    )


CORPUS_QUALITY_FILTER_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w, text FROM documents
), f AS (
  SELECT doc_id, lang, len(w) AS n_tokens,
    CASE
      WHEN len(w) < {QF_MIN_TOKENS} THEN 'too_short'
      WHEN len(w) > {QF_MAX_TOKENS} THEN 'too_long'
      WHEN CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(w)
           > {QF_MAX_STOP_RATIO} THEN 'stopword_saturated'
      WHEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
           < {QF_MIN_DISTINCT_RATIO} THEN 'repetitive'
      ELSE 'kept'
    END AS filter_reason
  FROM t
)
SELECT doc_id, lang, n_tokens, filter_reason, filter_reason = 'kept' AS keep
FROM f
"""


def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM score per document — the perplexity-proxy
    filter (the cheap stand-in for a KenLM pass: documents whose
    tokens are improbable under the corpus' own unigram distribution
    are boilerplate/noise outliers in either direction).

    Model = MLE unigram over the whole corpus (every token is in its
    own training set, so probabilities never need smoothing). Score =
    mean token log-prob; ``perplexity`` = exp(−score).

    Scale shape: per-(doc, token) counts FIRST (one map-side-combined
    shuffle), then one vocabulary-keyed join of those compressed
    counts (never the raw token stream) against the O(vocab) count
    table, then a per-doc rollup. No windows, no driver state; the
    1-row corpus total rides a broadcast cross join.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # empty-string tokens filtered like every other tokenizing operator
    # in this file (r12 review: a double space made '' a vocabulary
    # item here but not in tokenize_with_vocab)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    dt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("k"))
    counts = dt.groupBy("tok").agg(F.sum("k").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    lp = F.log(F.col("c").cast("double")) - F.log(F.col("t").cast("double"))
    return (
        dt.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            (F.sum(F.col("k") * lp) / F.sum("k")).alias("_alp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("_alp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_alp")), 6).alias("perplexity"),
        )
    )


UNIGRAM_LOGPROB_SCORE_SQL = """
WITH dt AS (
  SELECT doc_id, tok, COUNT(*) AS k
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY doc_id, tok
), c AS (
  SELECT tok, SUM(k) AS c FROM dt GROUP BY tok
), tot AS (
  SELECT SUM(c) AS t FROM c
)
SELECT dt.doc_id,
       CAST(SUM(dt.k) AS BIGINT) AS n_tokens,
       ROUND(SUM(dt.k * (ln(CAST(c.c AS DOUBLE)) - ln(CAST(tot.t AS DOUBLE))))
             / SUM(dt.k), 6) AS avg_logprob,
       ROUND(EXP(-(SUM(dt.k * (ln(CAST(c.c AS DOUBLE)) - ln(CAST(tot.t AS DOUBLE))))
             / SUM(dt.k))), 6) AS perplexity
FROM dt JOIN c USING (tok) CROSS JOIN tot
GROUP BY dt.doc_id
"""


# Gopher-style rule battery (Rae et al. 2021 §A1.1 heuristics, adapted
# to the single-line testdata): each rule is an independent boolean so
# filter-rate dashboards can attribute drops per rule; keep = AND.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8  # words containing >= 1 letter
GOPHER_MIN_DISTINCT_STOP = 2  # distinct stopwords present


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery: per-document boolean flags for the
    classic pre-training heuristics (word-count window, mean word
    length window, alpha-word fraction, stopword evidence) plus the
    conjunctive keep decision. Map-only column algebra — one scan,
    flags attributable per rule.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_len = (F.length("text") - n_words + 1).cast("double") / n_words
    n_alpha = F.size(F.expr("filter(split(text, ' '), x -> x rlike '[A-Za-z]')"))
    alpha_frac = n_alpha.cast("double") / n_words
    n_distinct_stop = F.size(
        F.array_distinct(F.expr(f"filter(split(text, ' '), w -> w IN ({_STOP_SQL}))"))
    )
    f_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    f_mean = (mean_len >= GOPHER_MIN_MEAN_LEN) & (mean_len <= GOPHER_MAX_MEAN_LEN)
    f_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    f_stop = n_distinct_stop >= GOPHER_MIN_DISTINCT_STOP
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_distinct_stop.alias("n_distinct_stopwords"),
        f_words.alias("pass_word_count"),
        f_mean.alias("pass_mean_word_len"),
        f_alpha.alias("pass_alpha_frac"),
        f_stop.alias("pass_stopwords"),
        (f_words & f_mean & f_alpha & f_stop).alias("keep"),
    )


GOPHER_QUALITY_FLAGS_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), m AS (
  SELECT doc_id,
    len(w) AS n_words,
    CAST(len(text) - len(w) + 1 AS DOUBLE) / len(w) AS mean_word_len,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      / len(w) AS alpha_word_frac,
    len(list_distinct(list_filter(w, x -> x IN ({_STOP_SQL}))))
      AS n_distinct_stopwords
  FROM t
)
SELECT doc_id, n_words,
  ROUND(mean_word_len, 6) AS mean_word_len,
  ROUND(alpha_word_frac, 6) AS alpha_word_frac,
  n_distinct_stopwords,
  n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS pass_word_count,
  mean_word_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN}
    AS pass_mean_word_len,
  alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC} AS pass_alpha_frac,
  n_distinct_stopwords >= {GOPHER_MIN_DISTINCT_STOP} AS pass_stopwords,
  (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
    AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN})
    AND alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC}
    AND n_distinct_stopwords >= {GOPHER_MIN_DISTINCT_STOP} AS keep
FROM m
"""


FEATURE_HASH_DIM = 64  # hashed BoW dims (matches the embeddings table)


def featurize_documents(
    spark: SparkSession, sf_dir: str, dim: int = FEATURE_HASH_DIM, hash: str = "md5"
) -> DataFrame:
    """Feature-hashed bag-of-words document vectors — the text →
    vector bridge that feeds the similarity/ANN stack when no neural
    encoder is in the loop (Weinberger et al.'s signed hashing trick:
    token → bucket by hash, ±1 sign from an independent hash bit to
    unbias collisions, L2-normalized).

    Output is LONG form ``(doc_id, dim, weight)`` over non-zero dims —
    sparse by construction, plain-row (oracle- and driver-friendly),
    and one ``groupBy(doc_id).collect_list`` away from the dense
    ``array<float>`` the ANN operators consume. Scale shape: explode →
    one map-side-combined (doc, dim) aggregate → per-doc norm join;
    no windows, no driver state, shuffles carry (id, dim, count) rows
    only. ``hash="md5"`` is the portable oracle family;
    ``hash="xxhash64"`` the cheap 100 TB path (same contract as every
    dedup operator).
    """
    from datapipe_spark.operators.dedup import _hash_expr

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")  # '' is not a feature (r12 review)
    h = F.expr(_hash_expr("tok", hash))
    # bucket from the low bits, sign from an independent high bit
    # (bit 58 — inside the 60-bit md5 parse, positive under both
    # engines' arithmetic)
    sgn = F.when(F.shiftright(h, 58).bitwiseAND(F.lit(1)) == 1, -1).otherwise(1)
    per = (
        toks.select("doc_id", F.pmod(h, F.lit(dim)).alias("dim"), sgn.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").alias("v"))
        .filter(F.col("v") != 0)
    )
    norms = per.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("_n")
    )
    return (
        per.join(norms, "doc_id")
        .select(
            "doc_id",
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("v") / F.col("_n"), 6).alias("weight"),
        )
    )


FEATURIZE_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
), per AS (
  SELECT doc_id, h % {FEATURE_HASH_DIM} AS dim,
         SUM(CASE WHEN (h >> 58) & 1 = 1 THEN -1 ELSE 1 END) AS v
  FROM toks GROUP BY doc_id, h % {FEATURE_HASH_DIM}
  HAVING SUM(CASE WHEN (h >> 58) & 1 = 1 THEN -1 ELSE 1 END) <> 0
), norms AS (
  SELECT doc_id, SQRT(SUM(CAST(v * v AS DOUBLE))) AS n FROM per GROUP BY doc_id
)
SELECT per.doc_id, CAST(per.dim AS INT) AS dim,
       ROUND(CAST(per.v AS DOUBLE) / norms.n, 6) AS weight
FROM per JOIN norms USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Vocabulary builder (tokenizer-training primitive)
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 1000


def vocab_top_tokens(spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K) -> DataFrame:
    """Corpus vocabulary head: the k most frequent whitespace tokens
    with rank, count, corpus frequency, and cumulative coverage — the
    table every tokenizer-training / vocab-pruning step starts from
    ("what fraction of the corpus do the top-N tokens cover?").

    Scale shape: one explode → groupBy(token) count with map-side
    combine (the only corpus-sized shuffle), then a global top-k
    (``orderBy.limit`` — Spark plans TakeOrderedAndProject: per-
    partition heaps of k, no full sort) and a window over the k
    surviving rows only. Ties broken (count DESC, token ASC) so the
    head is deterministic and oracle-checkable.
    """
    d = load_table(spark, sf_dir, "documents")
    counts, head = _vocab_head(d, k)
    # consumed by the grand total AND the top-k head: persist so the
    # corpus-sized explode+shuffle really runs once (the docstring's
    # claim) — without it the eager total recomputes the whole scan
    # for the lazy head (plan-matching cache lookup covers `head`)
    counts.persist()
    total = counts.agg(F.sum("n")).first()[0]
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    from datapipe_spark.util import materialize_and_release

    return materialize_and_release(
        head.select(
            "rank",
            "token",
            "n",
            (F.col("n") / F.lit(total)).alias("corpus_frac"),
            (
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.lit(total)
            ).alias("cum_coverage"),
        ),
        counts,
    )


def _vocab_head(d: DataFrame, k: int):
    """Shared tokenizer-vocabulary head: corpus whitespace-token counts
    (the one corpus-sized shuffle) and the deterministic
    (count DESC, token ASC) top-k with rank. The SINGLE definition of
    the rank ↔ vocab_id contract that ``vocab_top_tokens`` publishes
    and ``tokenize_with_vocab`` encodes against — a tie-break or
    k-default change here moves both in lockstep. Returns
    ``(counts, head)``; ``head`` carries (token, n, rank)."""
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    head = (
        counts.orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )
    return counts, head


VOCAB_TOP_TOKENS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n FROM toks WHERE token <> '' GROUP BY token
), total AS (
  SELECT SUM(n) AS t FROM counts
), head AS (
  SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {VOCAB_TOP_K}
)
SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, token, n,
       n / (SELECT t FROM total) AS corpus_frac,
       SUM(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING)
         / (SELECT t FROM total) AS cum_coverage
FROM head WINDOW w AS (ORDER BY n DESC, token)
"""


def tokenize_with_vocab(spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K) -> DataFrame:
    """Tokenizer application: encode every document against the
    corpus-derived top-k vocabulary (``vocab_top_tokens`` order:
    count desc, token asc → vocab id = rank, OOV → 0) — the
    text→ids step between vocab training and sequence packing.

    Per-doc output: positional id sequence (comma-joined — scalar,
    driver-canonicalization-safe), token count, OOV count and rate.
    Scale shape: one token-count aggregate for the vocab head (top-k
    via TakeOrderedAndProject), then explode → BROADCAST join against
    the k-row vocab → one doc-keyed regroup shuffle that carries
    (pos, id) pairs, never the text. Deterministic end-to-end, so the
    DuckDB oracle replays it value-for-value.
    """
    d = load_table(spark, sf_dir, "documents")
    _counts, head = _vocab_head(d, k)
    vocab = head.select("token", F.col("rank").alias("vocab_id"))
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    joined = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce("vocab_id", F.lit(0)).alias("tid")
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count(F.when(F.col("tid") == 0, 1)).alias("n_unk"),
        (
            F.count(F.when(F.col("tid") == 0, 1)).cast("double") / F.count("*")
        ).alias("unk_rate"),
        F.concat_ws(
            ",",
            F.expr("transform(array_sort(collect_list(struct(pos, tid))), s -> s.tid)"),
        ).alias("token_ids"),
    )


TOKENIZE_WITH_VOCAB_SQL = f"""
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n FROM toks0 WHERE token <> '' GROUP BY token
), vocab AS (
  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INT) AS vocab_id
  FROM (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {VOCAB_TOP_K})
), ids AS (
  SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, 0) AS tid
  FROM toks0 t LEFT JOIN vocab v USING (token) WHERE t.token <> ''
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (tid = 0) AS BIGINT) AS n_unk,
       CAST(COUNT(*) FILTER (tid = 0) AS DOUBLE) / COUNT(*) AS unk_rate,
       string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS token_ids
FROM ids GROUP BY doc_id
"""


TFIDF_TOP_TERMS = 3  # terms reported per document


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_TERMS`` TF-IDF terms per document.

    tf = in-document term count, idf = ln(N / df) over the corpus;
    ties broken by term text so ranks are engine-deterministic.

    Scale: two keyed aggregations (doc-term counts, then document
    frequency — both map-side combinable) and one per-document top-k
    window over ≤ |vocab(doc)| rows. The corpus size joins in as a
    1-row broadcast anchor; no per-term state ever reaches the driver.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            # ROUND 6 before ranking: Java vs C libm ln() can differ in
            # the last ulp, which must not flip a near-tie rank between
            # engines (the repo-wide float-parity convention)
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_TERMS)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term", "tfidf")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(CAST(tf.tf AS DOUBLE)
               * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df), 6)
           AS tfidf
  FROM tf JOIN df USING (term)
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
FROM ranked WHERE rank <= {TFIDF_TOP_TERMS}
"""


CHUNK_WORDS = 64  # context-window chunk width (words)
CHUNK_STRIDE = 48  # chunk start stride; overlap = CHUNK_WORDS - CHUNK_STRIDE


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    ``CHUNK_WORDS``-word chunks starting every ``CHUNK_STRIDE`` words
    (the pre-tokenization step that shapes long documents into model
    context windows). Trailing starts whose remaining words are fully
    covered by the previous chunk's overlap are dropped.

    Scale: map-only — per-row ``sequence`` + ``explode`` over the
    word array, no shuffle; chunk text is sliced from the one split()
    array per row.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    n = F.size(words)
    overlap = CHUNK_WORDS - CHUNK_STRIDE
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    chunked = (
        d.select("doc_id", words.alias("_w"), F.explode(starts).alias("start_word"))
        .filter(
            (F.col("start_word") == 0)
            | (F.size("_w") - F.col("start_word") > overlap)
        )
        .select(
            "doc_id",
            (F.col("start_word") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("start_word").cast("int").alias("start_word"),
            F.least(F.lit(CHUNK_WORDS), F.size("_w") - F.col("start_word"))
            .cast("int")
            .alias("n_chunk_words"),
            F.array_join(
                F.slice("_w", F.col("start_word") + 1, F.lit(CHUNK_WORDS)), " "
            ).alias("chunk_text"),
        )
    )
    return chunked


CHUNK_DOCUMENTS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), starts AS (
  SELECT doc_id, words,
         unnest(generate_series(0, len(words) - 1, {CHUNK_STRIDE})) AS start_word
  FROM w
)
SELECT doc_id,
  CAST(start_word / {CHUNK_STRIDE} AS INT) AS chunk_idx,
  CAST(start_word AS INT) AS start_word,
  CAST(LEAST({CHUNK_WORDS}, len(words) - start_word) AS INT) AS n_chunk_words,
  array_to_string(words[start_word + 1 : start_word + {CHUNK_WORDS}], ' ') AS chunk_text
FROM starts
WHERE start_word = 0 OR len(words) - start_word > {CHUNK_WORDS - CHUNK_STRIDE}
"""


# interpolation weights for the bigram LM: P = λ·P_bi + (1-λ)·P_uni
_LM_LAMBDA = 0.75


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model score per document: for each
    adjacent word pair, ``ln(λ·C(w1,w2)/C(w1) + (1-λ)·C(w2)/T)`` with
    corpus-estimated counts; per-doc mean log-prob and perplexity —
    the KenLM-style fluency filter one order above
    ``unigram_logprob_score`` (catches shuffled-word salad a unigram
    model scores as fluent). Documents need ≥ 2 words to score.

    Scale: bigram pairs come from array slicing per row (no window, no
    per-doc shuffle); corpus counts are two map-side-combinable
    aggregations; the token total is a 1-row broadcast anchor. The
    count joins shuffle on the word keys — Zipf skew on hot words is
    AQE's standard skew-join case.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        # '' dropped from the word stream like every other tokenizer
        # here (r12 review): a double space otherwise minted '' uni-
        # and bigrams with their own corpus counts
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("_w"),
    )
    pairs = (
        d.filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1),"
                    " (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    toks = d.select(F.explode("_w").alias("tok"))
    cu = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    cb = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_bg"))
    total = toks.agg(F.count("*").alias("t_total"))
    cu1 = cu.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_w1"))
    cu2 = cu.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_w2"))
    lp = (
        pairs.join(cb, ["w1", "w2"])
        .join(cu1, "w1")
        .join(cu2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                F.lit(_LM_LAMBDA) * (F.col("n_bg").cast("double") / F.col("n_w1"))
                + F.lit(1 - _LM_LAMBDA) * (F.col("n_w2").cast("double") / F.col("t_total"))
            ).alias("lp"),
        )
    )
    # ROUND 6 (repo float-parity convention): libm ln() ulp drift and
    # engine-order double summation must not leak into the comparison
    return lp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.round(F.exp(-F.avg("lp")), 6).alias("perplexity"),
    )


BIGRAM_LM_SCORE_SQL = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), pairs AS (
  SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
  FROM w WHERE len(w) >= 2
), toks AS (
  SELECT unnest(w) AS tok FROM w
), cu AS (
  SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok
), cb AS (
  SELECT w1, w2, COUNT(*) AS n_bg FROM pairs GROUP BY w1, w2
), t AS (
  SELECT COUNT(*) AS t_total FROM toks
), lp AS (
  SELECT p.doc_id,
    ln({_LM_LAMBDA} * (CAST(cb.n_bg AS DOUBLE) / cu1.n_tok)
       + {1 - _LM_LAMBDA} * (CAST(cu2.n_tok AS DOUBLE) / t.t_total)) AS lp
  FROM pairs p
  JOIN cb USING (w1, w2)
  JOIN cu cu1 ON cu1.tok = p.w1
  JOIN cu cu2 ON cu2.tok = p.w2
  CROSS JOIN t
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(lp), 6) AS avg_logprob, ROUND(exp(-AVG(lp)), 6) AS perplexity
FROM lp GROUP BY doc_id
"""


CMS_DEPTH = 4  # count-min-sketch rows (independent hash functions)
CMS_WIDTH = 8192  # counters per row
CMS_TOP_K = 50  # heavy hitters reported


def cms_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate the corpus frequency of
    the top-``CMS_TOP_K`` tokens from a fixed ``CMS_DEPTH×CMS_WIDTH``
    sketch and report estimate vs truth.

    The sketch is the 100 TB shape: counter state is O(D·W) regardless
    of vocabulary size, built in ONE map-side-combinable aggregation
    over (row, bucket) keys — where an exact per-token count would
    shuffle the full vocabulary, the sketch shuffles at most D·W
    cells. Estimates use deterministic md5-derived hash rows, so the
    whole operator (sketch included) replays exactly in the DuckDB
    oracle; CMS guarantees est ≥ truth (tested) with overflow bounded
    by collisions.
    """
    # persist the exploded token stream: the sketch cells AND the
    # exact-truth counts both consume it, and without the cache each
    # paid its own full split+explode pass over the corpus (r12
    # review — the vocab_top_tokens posture). Both consumers are
    # aggregations, so the cache is released before the result is
    # returned via the unpersist below.
    d = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "").persist()

    def bucket(j: int) -> F.Column:
        return F.expr(
            f"cast(conv(substring(md5(concat(tok, '#', '{j}')), 1, 15), 16, 10) as bigint)"
            f" % {CMS_WIDTH}"
        )

    rows = d.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("h"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("tok", F.col("cell.j").alias("j"), F.col("cell.h").alias("h"))
    cells = rows.groupBy("j", "h").agg(F.count("*").alias("c"))

    truth = (
        d.groupBy("tok")
        .agg(F.count("*").alias("n_true"))
        .orderBy(F.desc("n_true"), F.asc("tok"))
        .limit(CMS_TOP_K)
    )
    probes = truth.select(
        "tok",
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j).alias("h"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("tok", "n_true", F.col("cell.j").alias("j"), F.col("cell.h").alias("h"))
    out = (
        probes.join(cells, ["j", "h"])
        .groupBy("tok", "n_true")
        .agg(F.min("c").alias("n_est"))
        .select(
            "tok",
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_est").cast("long").alias("n_est"),
            (F.col("n_est") - F.col("n_true")).cast("long").alias("overcount"),
        )
    )
    from datapipe_spark.util import materialize_and_release

    return materialize_and_release(out, d)


CMS_TOP_TOKENS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), t AS (
  SELECT tok FROM toks WHERE tok <> ''
), rows_ AS (
  SELECT tok, unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j FROM t
), hashed AS (
  SELECT tok, j,
    CAST(('0x' || substring(md5(tok || '#' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)
      % {CMS_WIDTH} AS h
  FROM rows_
), cells AS (
  SELECT j, h, COUNT(*) AS c FROM hashed GROUP BY j, h
), truth AS (
  SELECT tok, COUNT(*) AS n_true FROM t GROUP BY tok
  ORDER BY n_true DESC, tok LIMIT {CMS_TOP_K}
), probes AS (
  SELECT tok, n_true, unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j
  FROM truth
), probed AS (
  SELECT p.tok, p.n_true, p.j,
    CAST(('0x' || substring(md5(p.tok || '#' || CAST(p.j AS VARCHAR)), 1, 15)) AS BIGINT)
      % {CMS_WIDTH} AS h
  FROM probes p
)
SELECT pr.tok, CAST(pr.n_true AS BIGINT) AS n_true,
       CAST(MIN(c.c) AS BIGINT) AS n_est,
       CAST(MIN(c.c) - pr.n_true AS BIGINT) AS overcount
FROM probed pr JOIN cells c ON pr.j = c.j AND pr.h = c.h
GROUP BY pr.tok, pr.n_true
"""


BPE_MERGES = 8  # merge rounds for the registry entry (fixed for determinism)
BPE_EOW = "</w>"  # end-of-word marker (Sennrich-style)

# Dispatch ceilings for the two big-k paths (r7 verdict ask #2):
# - training: past this k, one cluster round-trip per merge stops
#   paying for itself — switch to the hybrid trainer (one distributed
#   corpus→types reduction, then the textbook merge loop driver-side
#   on the collected type table, the HF-tokenizers train split);
# - tokenizing: past this k, the k-nested-fold Catalyst expression
#   tree stops analyzing/compiling sanely — switch to the broadcast
#   merge-table Arrow path (``_bpe_tokenize_arrow``).
_BPE_LOOP_MAX = 32
_BPE_FOLD_MAX = 32
# the hybrid trainer collects the TYPE table (distinct words), never
# the corpus: ~10⁶-10⁸ rows at 100 TB. Over this cap we refuse loudly
# rather than OOM the driver — raise the cap, sample types, or run the
# per-round distributed loop (strategy="loop") instead.
_BPE_TYPES_COLLECT_CAP = 2_000_000


def _bpe_apply_word(word: str, merges: list) -> list:
    """Reference merge replay for ONE word: rank order, each merge
    applied in a single leftmost non-overlapping left-to-right pass —
    byte-identical semantics to the JVM fold in ``bpe_tokenize`` and
    the pure-Python reference in tests. ``merges`` is [(left, right,
    merged), ...] in rank order."""
    syms = list(word)
    syms.append(BPE_EOW)
    present = set(syms)
    for a, b, ab in merges:
        if a not in present or b not in present:
            continue
        out: list = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = ab
            else:
                out.append(x)
        if len(out) != len(syms):
            present.add(ab)
            syms = out
    return syms


def _bpe_train_driver_recount(types: dict, n_merges: int) -> list:
    """Reference trainer (full per-round pair recount) — kept as the
    equality oracle for the incremental trainer below; same argmax,
    tie-break ((freq desc, left, right)) and leftmost non-overlapping
    fold. O(total symbols) EVERY round — correct but flat-times-k."""
    from collections import Counter

    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in types.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, a + b, int(n)))
        nxt: dict = {}
        for syms, f in types.items():
            out: list = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + f
        types = nxt
    return merges


def _bpe_train_driver(types: dict, n_merges: int) -> list:
    """Incremental pair-count BPE merge loop (r8 verdict ask #4 — the
    per-round full recount made driver training flat-times-k; this is
    the classic subword-nmt/HF-tokenizers incremental form). Maintains

    - total pair counts,
    - a pair → type-index occurrence index, and
    - a lazy-deletion max-heap keyed ``(freq desc, left, right)``;

    after merging ``(a, b)`` only the types CONTAINING that pair are
    re-counted (their pair deltas update counts/heap/index), so
    per-round cost is O(types touched by the merge) — shrinking as
    merges specialize — instead of O(all types). Same argmax,
    tie-break, and leftmost non-overlapping fold as
    ``_bpe_train_driver_recount``; rank-for-rank equality at k=1024 is
    pinned in tests."""
    import heapq
    from collections import Counter, defaultdict

    def pairs_of(seq: list) -> Counter:
        c: Counter = Counter()
        for i in range(len(seq) - 1):
            c[(seq[i], seq[i + 1])] += 1
        return c

    seqs, weights = [], []
    counts: Counter = Counter()
    occ: defaultdict = defaultdict(set)
    for syms, f in types.items():
        ti = len(seqs)
        seqs.append(list(syms))
        weights.append(f)
        for p, m in pairs_of(seqs[ti]).items():
            counts[p] += m * f
            occ[p].add(ti)

    heap = [(-n, a, b) for (a, b), n in counts.items()]
    heapq.heapify(heap)

    merges = []
    for rank in range(1, n_merges + 1):
        top = None
        while heap:  # lazy deletion: skip entries whose count moved on
            negn, a, b = heapq.heappop(heap)
            if counts.get((a, b), 0) == -negn:
                top = (a, b, -negn)
                break
        if top is None:
            break
        a, b, n = top
        ab = a + b
        merges.append((rank, a, b, ab, int(n)))
        changed: set = set()
        for ti in list(occ.get((a, b), ())):
            seq, w = seqs[ti], weights[ti]
            before = pairs_of(seq)
            out: list = []
            for x in seq:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            seqs[ti] = out
            after = pairs_of(out)
            for p in before.keys() | after.keys():
                d = after.get(p, 0) - before.get(p, 0)
                if d:
                    counts[p] += d * w
                    changed.add(p)
                if after.get(p, 0):
                    occ[p].add(ti)
                else:
                    occ[p].discard(ti)
        for p in changed:
            n2 = counts.get(p, 0)
            if n2 > 0:
                heapq.heappush(heap, (-n2, p[0], p[1]))
            else:
                counts.pop(p, None)
                occ.pop(p, None)
    return merges


def bpe_train_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BPE_MERGES,
    strategy: str = "auto",
) -> DataFrame:
    """Distributed BPE tokenizer training — the ranked merge table
    (``rank, left, right, merged, freq``) a subword tokenizer is built
    from. Classic corpus→types reduction then greedy merges: symbol
    sequences start as characters + an end-of-word marker; each round
    merges the globally most frequent adjacent symbol pair (ties
    broken lexically — fully deterministic).

    Rows-only by design: the merge loop is an iterative fixpoint over
    its own previous output, outside SQL's reach (the driver brief's
    "iterative algorithms" carve-out). Output equality against a
    pure-Python reference implementation over the full corpus is
    pinned in tests/test_llm_ops.py instead.

    Scale shape (the standard BPE trick, distributed): pair counting
    runs over the WORD-TYPE table (one ``groupBy word`` of the corpus,
    then weight by type frequency), never the corpus itself — on a
    100 TB corpus the type table is millions of rows, corpus-
    independent per round. Each round is one map-side-combinable
    pair-count aggregation + a 1-row argmax to the driver + a map-only
    fold applying the merge (leftmost, non-overlapping) as a pure JVM
    array expression — no Python in the row path, driver state
    O(n_merges). Lineage is truncated per round (localCheckpoint) so
    plan depth stays constant.

    ``strategy`` (r7 verdict ask #2 — a real 32k-merge vocabulary
    needs thousands of rounds, and one cluster round-trip per merge
    stops making sense past a few dozen): ``"loop"`` forces the
    per-round distributed form above; ``"driver"`` runs ONE
    distributed corpus→types reduction, collects the type table
    (cap-guarded — it is vocabulary-sized, never corpus-sized), and
    trains the merge loop driver-side (``_bpe_train_driver``) — the
    HF-tokenizers split, identical output by construction (same
    argmax, same tie-break, same fold; equality-tested). ``"auto"``
    picks loop for k ≤ ``_BPE_LOOP_MAX``, driver past it.
    """
    if strategy == "auto":
        strategy = "loop" if n_merges <= _BPE_LOOP_MAX else "driver"
    docs = load_table(spark, sf_dir, "documents")
    word_types = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    schema = "rank int, left string, right string, merged string, freq bigint"
    if strategy == "driver":
        rows = word_types.limit(_BPE_TYPES_COLLECT_CAP + 1).collect()
        if len(rows) > _BPE_TYPES_COLLECT_CAP:
            raise ValueError(
                f"type table exceeds the {_BPE_TYPES_COLLECT_CAP}-row driver "
                "cap — raise _BPE_TYPES_COLLECT_CAP, pre-sample the types, or "
                "use strategy='loop'"
            )
        tt: dict = {}
        for r in rows:
            t = tuple([*r["word"], BPE_EOW])
            tt[t] = tt.get(t, 0) + int(r["freq"])
        return spark.createDataFrame(_bpe_train_driver(tt, n_merges), schema)
    chars = (
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    types = word_types.select(
        F.expr(f"concat({chars}, array('{BPE_EOW}'))").alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            types.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((rank, a, b, a + b, n))
        def _fold(_a: str, _b: str):
            def fold(acc, x):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_a))
                    & (x == F.lit(_b)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(_a + _b)),
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return fold

        fold = _fold(a, b)
        types = types.select(
            F.aggregate("syms", F.array().cast("array<string>"), fold).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, schema)


# trained merge tables, memoized per (documents parquet identity,
# n_merges) — the "model file" a tokenizer ships; O(n_merges) rows
# each. Two layers (r8, the persisted-quantizer posture from
# similarity.py): a process dict, then a JSON sidecar on disk keyed by
# the corpus identity — a second SESSION tokenizes without retraining.
_BPE_MERGE_CACHE: dict[tuple, list] = {}


def _bpe_merges_for(spark: SparkSession, sf_dir: str, n_merges: int) -> list:
    import hashlib
    import json
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_size, st.st_mtime_ns, n_merges)
    if key in _BPE_MERGE_CACHE:
        return _BPE_MERGE_CACHE[key]
    root = os.environ.get("SPARK_GRAFT_MODEL_DIR", "/tmp/datapipe_spark_bpe")
    h = hashlib.md5(repr(key).encode()).hexdigest()[:16]
    path = os.path.join(root, f"merges-{h}.json")
    if os.path.exists(path):
        with open(path) as f:
            merges = json.load(f)
    else:
        merges = [
            {k: r[k] for k in ("rank", "left", "right", "merged", "freq")}
            for r in bpe_train_merges(spark, sf_dir, n_merges).orderBy("rank").collect()
        ]
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, f"merges-{h}.tmp-{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(merges, f)
        os.replace(tmp, path)
    _BPE_MERGE_CACHE[key] = merges
    return merges


def bpe_tokenize(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BPE_MERGES,
    path: str | None = None,
) -> DataFrame:
    """Apply the trained BPE merge table to the corpus — the consumer
    half of ``bpe_train_merges``: every document tokenized to subwords
    by replaying the k merges in rank order (leftmost,
    non-overlapping — byte-identical semantics to training, so
    training words re-tokenize to exactly their final training
    symbols).

    Output ``(doc_id, n_tokens, tokens)`` with tokens space-joined
    (driver-safe scalar, ``</w>`` marks word ends). Rows-only by
    design: the merge table is a data-derived model (same carve-out as
    ``lang_id_ngram``); reference equality vs a pure-Python
    tokenizer is pinned in tests.

    Scale shape (r10 revision): the merge table — the O(k) model
    file any BPE tokenizer ships — is broadcast into ONE Arrow-batched
    ``mapInPandas`` pass (``_bpe_tokenize_arrow``): a single corpus
    scan, no shuffle, plan size O(1) in k, with per-batch word-TYPE
    memoization so the per-word replay cost is paid once per distinct
    word, not once per token (Zipf makes that the dominant savings on
    real text). This is now the default at EVERY k: the former small-k
    regime (k nested pure-JVM ``aggregate`` folds in one projection,
    the r7 ask #2 design) measured 15.1 s vs the arrow path's 1.7 s at
    sf0.1/k=8 — Spark evaluates higher-order-function lambdas
    interpreted, per element, with boxing (the same constant-factor
    trap the z-order bucketer hit, SCALING.md r10), and the fold path
    also re-replays every merge per token occurrence where the memo
    pays per word type. The fold path is kept as the independent
    reference implementation (``path="fold"``, valid to
    ``_BPE_FOLD_MAX`` merges before Catalyst's expression-tree cost
    explodes) and the two are equality-tested at the old boundary plus
    against a pure-Python tokenizer at k=1024. Driver state is the
    O(k) collected merge table; like a model file it is trained once
    per dataset and memoized (keyed by the documents parquet's
    identity, the ``_cached_corpus_index`` posture), so repeated
    tokenization pays only the map pass.
    """
    merges = _bpe_merges_for(spark, sf_dir, n_merges)
    docs = load_table(spark, sf_dir, "documents")
    if path not in (None, "arrow", "fold"):
        raise ValueError(f"unknown bpe_tokenize path {path!r}")
    if path == "fold" and len(merges) > _BPE_FOLD_MAX:
        raise ValueError(
            f"fold path caps at {_BPE_FOLD_MAX} merges (expression-tree"
            f" size is O(k)); got {len(merges)}"
        )
    if path != "fold":
        return _bpe_tokenize_arrow(
            docs, [(m["left"], m["right"], m["merged"]) for m in merges]
        )

    def q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    expr = (
        "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
        f" array('{q(BPE_EOW)}'))"
    )
    for lvl, m in enumerate(merges):
        a, b = q(m["left"]), q(m["right"])
        expr = (
            f"aggregate({expr}, cast(array() as array<string>),"
            f" (acc{lvl}, x{lvl}) -> CASE WHEN size(acc{lvl}) > 0"
            f" AND element_at(acc{lvl}, -1) = '{a}' AND x{lvl} = '{b}'"
            f" THEN concat(slice(acc{lvl}, 1, size(acc{lvl}) - 1), array('{a}{b}'))"
            f" ELSE concat(acc{lvl}, array(x{lvl})) END)"
        )
    toks = f"flatten(transform(filter(split(text, ' '), w -> w <> ''), w -> {expr}))"
    return docs.selectExpr(
        "doc_id",
        f"cast(size({toks}) as bigint) AS n_tokens",
        f"array_join({toks}, ' ') AS tokens",
    )


def _bpe_tokenize_arrow(docs: DataFrame, merges: list) -> DataFrame:
    """Large-k tokenizer path: the rank-ordered merge table — the O(k)
    model file — is broadcast and replayed per WORD TYPE inside one
    Arrow-batched ``mapInPandas`` pass. Map-only (no shuffle, one
    corpus scan, plan size O(1) in k); a per-batch ``word →
    (n_tokens, joined)`` memo means each distinct word pays the
    O(k·len) replay once per batch regardless of its corpus frequency.
    Output schema and semantics identical to the nested-fold path
    (``_bpe_apply_word`` mirrors the JVM fold exactly)."""
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(merges)

    def tokenize(batches):
        ms = bc.value
        memo: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            n_out, t_out = [], []
            for text in pdf["text"]:
                toks: list = []
                for w in text.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _bpe_apply_word(w, ms)
                    toks.extend(got)
                n_out.append(len(toks))
                t_out.append(" ".join(toks))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_tokens": n_out, "tokens": t_out}
            )

    return docs.select("doc_id", "text").mapInPandas(
        tokenize, "doc_id long, n_tokens bigint, tokens string"
    )
