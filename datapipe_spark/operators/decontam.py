"""Training-corpus curation: benchmark decontamination + stratified
sampling (build-brief extension surface — the operations a large-scale
training-data pipeline runs between dedup and tokenization).

Decontamination is the standard eval-overlap scrub: any training
document sharing a word n-gram with a held-out benchmark/eval set is
flagged and dropped, so the model can't be graded on text it trained
on. Stratified sampling is corpus mixing: per-language (or per-source)
quota rates applied deterministically, so a re-run reproduces the same
corpus byte-for-byte.

Scale design:
- the benchmark n-gram set is *small by construction* (eval suites are
  a few thousand documents even when the training corpus is 100 TB),
  so the contamination join is a broadcast semi-join against the
  training corpus's exploded n-grams — a map-side filter, no shuffle
  of the corpus. If the benchmark set ever outgrew broadcast range,
  the same plan works as a shuffle join on the gram key.
- sampling uses a deterministic id-mod systematic rule rather than
  ``rand()`` — reproducible across runs/engines and SQL-oracle-able.
  At 100 TB the mod would be taken over ``xxhash64(content)`` instead
  of the raw id (sequential ids can correlate with crawl order); the
  id form keeps the DuckDB oracle exact here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.operators.dedup import _shingles
from datapipe_spark.sources.tables import load_table

# every 50th doc plays the held-out benchmark/eval set; the rest are
# the training corpus
_BENCH_MOD = 50
_NGRAM = 5  # contamination gram width: 5-word spans (docs here ~50 words)


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents that share any word 5-gram with the
    benchmark slice (``doc_id % 50 == 0``).

    Output: one row per *training* document — shared-gram count and
    the contamination flag (``n_shared_grams >= 1``).
    """
    return _decontaminate(spark, sf_dir, broadcast=True)


def decontaminate_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical semantics with the benchmark gram set on a SHUFFLE
    hash join — the escape hatch when the eval suite outgrows a
    broadcast (hundreds of GB of eval shards × n-gram fan-out). Only
    gram keys shuffle, never document text; the per-doc aggregate
    stays map-side combinable. Same oracle as ``decontaminate``
    (plan difference only — gated in tests/test_plan_quality.py)."""
    return _decontaminate(spark, sf_dir, broadcast=False)


def _gram_split(spark: SparkSession, sf_dir: str, *extra_cols: str):
    """Shared head of ``decontaminate`` and ``contamination_score``
    (r12 review — two verbatim copies): documents shingled into
    distinct word {_NGRAM}-grams, benchmark slice split off as a
    distinct gram set. NULL text coalesces to an EMPTY gram array,
    matching the oracles' ``CASE … ELSE []`` (a null-text doc
    otherwise surfaced n_grams = NULL where DuckDB says 0). Returns
    ``(train_docs, bench_grams)``."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", *extra_cols,
        F.coalesce(
            _shingles("text", _NGRAM), F.array().cast("array<string>")
        ).alias("grams"),
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench_grams = (
        d.filter(is_bench).select(F.explode("grams").alias("g")).distinct()
    )
    return d.filter(~is_bench), bench_grams


def _gram_hits(train: DataFrame, bench_grams, out_col: str) -> DataFrame:
    """Per-training-doc count of benchmark-shared grams. Plain count:
    each doc's grams are already distinct (``_shingles`` dedups) and
    the bench side is distinct, so (doc_id, g) join rows are unique —
    count_distinct forced a second dedup phase for identical values
    (r12 review)."""
    return (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias(out_col))
    )


def _decontaminate(spark: SparkSession, sf_dir: str, broadcast: bool) -> DataFrame:
    train, bench_grams = _gram_split(spark, sf_dir, "lang")
    bench_grams = (
        F.broadcast(bench_grams) if broadcast else bench_grams.hint("shuffle_hash")
    )
    hits = _gram_hits(train, bench_grams, "n_shared_grams")
    return (
        train.select("doc_id", "lang")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) >= 1).alias("is_contaminated"),
        )
    )


# oracle gram text derived from _NGRAM like its range bound (r12
# review: a literal 5-term concat under an _NGRAM-derived bound would
# silently desync the oracle if _NGRAM ever changed)
_GRAM_CONCAT_SQL = " || ' ' || ".join(
    ["w[i]"] + [f"w[i+{j}]" for j in range(1, _NGRAM)]
)

DECONTAMINATE_SQL = f"""
WITH g AS (
  SELECT doc_id, lang,
    CASE WHEN len(w) >= {_NGRAM} THEN
      list_distinct([{_GRAM_CONCAT_SQL}
                     for i in range(1, len(w) - {_NGRAM - 2})])
    ELSE [] END AS grams
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {_BENCH_MOD} = 0
), train AS (
  SELECT * FROM g WHERE doc_id % {_BENCH_MOD} <> 0
), hits AS (
  SELECT doc_id, COUNT(DISTINCT tg.gram) AS n
  FROM (SELECT doc_id, unnest(grams) AS gram FROM train) tg
  JOIN bench USING (gram)
  GROUP BY doc_id
)
SELECT t.doc_id, t.lang,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
  COALESCE(h.n, 0) >= 1 AS is_contaminated
FROM train t LEFT JOIN hits h USING (doc_id)
"""


# per-language inclusion rates out of 100 (corpus-mixing quotas)
_STRATA_RATES = {"en": 80, "zh": 60, "de": 40, "fr": 40, "es": 20}
_DEFAULT_RATE = 10  # unknown languages: keep a trickle


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample of the document corpus.

    A document is kept iff ``doc_id % 100 < rate(lang)`` — systematic
    sampling, so the selected set is stable across runs and engines
    (no RNG), and per-stratum proportions converge to the quota.
    Output: the sampled docs with their stratum rate.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in sorted(_STRATA_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", "source", "n_chars", rate.cast("int").alias("stratum_rate"))
        .filter(F.col("doc_id") % 100 < F.col("stratum_rate"))
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(_STRATA_RATES.items())
)

CORPUS_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source, n_chars,
  CAST(CASE {_RATE_CASE} ELSE {_DEFAULT_RATE} END AS INT) AS stratum_rate
FROM documents
WHERE doc_id % 100 < (CASE {_RATE_CASE} ELSE {_DEFAULT_RATE} END)
"""


# training-batch assembly: packs are filled to a fixed token budget
_PACK_BUDGET = 512
_PACK_SHARDS = 8


def pack_token_budget(
    spark: SparkSession, sf_dir: str, shards: int = _PACK_SHARDS
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    (the "concatenate docs up to N tokens" step that turns a curated
    corpus into training batches).

    Contiguous-fill rule, per shard: docs are taken in doc_id order and
    a doc starts a new pack when the shard's running token count would
    cross the budget boundary (pack = floor(preceding-cumsum/budget)).
    Deterministic — no RNG, no data-dependent tie-breaks — so re-runs
    and engines agree byte-for-byte.

    Scale: one window cumsum per shard (``partitionBy(shard)``), never
    a global sort. ``shards`` is *semantic*, not a perf knob — pack
    ids depend on it, so a deployment fixes it once, sized to the
    corpus (shards ≈ corpus_tokens / tokens-per-training-file keeps
    every window partition executor-sized at any corpus scale); the
    default matches the testdata + oracle. ``is_oversize`` flags docs
    that alone exceed the budget (the caller chunks those downstream).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    shard = (F.col("doc_id") % shards).cast("int")
    toks = d.select("doc_id", shard.alias("shard"), n_tokens.alias("n_tokens"))
    return _pack(toks).select(
        "doc_id",
        "shard",
        "n_tokens",
        "pack_id",
        (F.col("n_tokens") > _PACK_BUDGET).alias("is_oversize"),
    )


def _pack(toks: DataFrame) -> DataFrame:
    """The contiguous-fill packing rule over ``(doc_id, shard,
    n_tokens)`` rows — ONE spelling for ``pack_token_budget`` and
    ``curation_pipeline`` (r12 review: the shard/cumsum/floor window
    lived in two Python places plus two SQL strings): per-shard
    doc_id-ordered preceding cumsum, ``pack_id = floor(cum/budget)``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    return toks.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn(
        "pack_id", F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long")
    )


PACK_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id,
    CAST(doc_id % {_PACK_SHARDS} AS INT) AS shard,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
  CAST(FLOOR(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
  n_tokens > {_PACK_BUDGET} AS is_oversize
FROM c
"""


# target mixture weights per domain/source (relative, integer); any
# source not named gets the default — corpus mixing reweights crawl
# skew toward the training recipe
_MIX_WEIGHTS = {"src0": 30, "src1": 20, "src2": 10}
_MIX_DEFAULT_W = 5


def corpus_mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: downsample each ``source`` so the kept
    corpus matches target mixture weights EXACTLY (the data-recipe
    step every pretraining run applies to reweight crawl skew).

    The achievable budget is ``T = min_s floor(n_s·W/w_s)`` (the
    largest total for which no domain's quota exceeds its supply);
    each domain keeps ``floor(w_s·T/W)`` documents. Selection within
    a domain is deterministic hash-order: rank by
    ``(md5(doc_id), doc_id)`` per source and keep the first quota
    ranks — reproducible across runs AND engines (md5 is
    bit-identical in DuckDB, so the whole operator is value-oracled;
    at 100 TB swap in xxhash64 for cheaper ranking). All quota
    arithmetic is exact: integers through double math far below 2^53.

    Scale shape: one O(sources) count aggregate (broadcast back), one
    per-source ranking window (keyed shuffle — never a global sort),
    map-side filter. Output: kept docs with their domain weight and
    quota.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # per-domain supply: O(domains) rows — collected and turned into
    # exact integer quotas driver-side (the mixture table is tiny at
    # any corpus size; the documents themselves never leave executors)
    counts = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    w = {s: _MIX_WEIGHTS.get(s, _MIX_DEFAULT_W) for s in counts}
    big_w = sum(w.values())
    budget = min(n * big_w // w[s] for s, n in counts.items()) if counts else 0
    quotas = spark.createDataFrame(
        # None-safe sort (r12 review: a NULL source crashed sorted());
        # a NULL-source quota row then drops out of the equi-join on
        # both engines identically
        [(s, w[s], w[s] * budget // big_w)
         for s in sorted(counts, key=lambda x: (x is None, x or ""))],
        "source string, domain_weight long, domain_quota long",
    )
    wr = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", "lang", "n_chars")
        .withColumn("_rk", F.row_number().over(wr))
        .join(F.broadcast(quotas), "source")
        .filter(F.col("_rk") <= F.col("domain_quota"))
        .select("doc_id", "source", "lang", "n_chars", "domain_weight", "domain_quota")
    )


_MIX_CASE = " ".join(
    f"WHEN source = '{s}' THEN {wv}" for s, wv in sorted(_MIX_WEIGHTS.items())
)

CORPUS_MIX_DOMAINS_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n,
         CAST(CASE {_MIX_CASE} ELSE {_MIX_DEFAULT_W} END AS BIGINT) AS w
  FROM documents GROUP BY source
), quotas AS (
  SELECT source, w AS domain_weight,
    CAST(FLOOR(w * (SELECT MIN(FLOOR(n * (SELECT SUM(w) FROM counts) / w)) FROM counts)
               / (SELECT SUM(w) FROM counts)) AS BIGINT) AS domain_quota
  FROM counts
), ranked AS (
  SELECT doc_id, source, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.source, r.lang, r.n_chars, q.domain_weight, q.domain_quota
FROM ranked r JOIN quotas q USING (source)
WHERE r.rk <= q.domain_quota
"""


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation flow a training-data pipeline actually
    runs, composed from this engine's own oracled stages:

        quality gate (``corpus_quality_filter`` keep)
        → exact dedup (canonical doc per verbatim group)
        → benchmark decontamination (uncontaminated training docs)
        → sequence packing (per-shard token-budget cumsum)

    Output: the training-set manifest ``(doc_id, shard, n_tokens,
    pack_id)`` over surviving documents. Every stage is a DataFrame →
    DataFrame function, so the composition is ONE lazy plan — Catalyst
    sees through the whole chain (the three keep-filters collapse into
    joins over the same scan) and the only materialization is the
    consumer's. Packing runs over the SURVIVORS (pack ids must be
    dense over what ships, not over what was dropped), with the same
    deterministic contiguous-fill rule as ``pack_token_budget``.

    Scale: the gates are map-only or hash-keyed aggregates (no
    windows); packing is one window cumsum per shard — shards sized so
    each partition stays executor-sized at any corpus (see
    ``pack_token_budget``).
    """
    from datapipe_spark.operators.dedup import exact_dedup
    from datapipe_spark.operators.textstats import corpus_quality_filter

    kept = corpus_quality_filter(spark, sf_dir).filter("keep").select("doc_id")
    canon = exact_dedup(spark, sf_dir).filter("NOT is_duplicate").select("doc_id")
    clean = decontaminate(spark, sf_dir).filter("NOT is_contaminated").select("doc_id")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    surv = (
        d.join(kept, "doc_id")
        .join(canon, "doc_id")
        .join(clean, "doc_id")
        .withColumn("shard", (F.col("doc_id") % _PACK_SHARDS).cast("int"))
    )
    return _pack(surv).select("doc_id", "shard", "n_tokens", "pack_id")


def _curation_pipeline_sql() -> str:
    """Single-source composition: the oracle is built FROM the
    component stages' own oracle SQL, so a stage fix propagates here
    automatically (imports are local — textstats/dedup are peers)."""
    from datapipe_spark.operators.dedup import EXACT_DEDUP_SQL
    from datapipe_spark.operators.textstats import CORPUS_QUALITY_FILTER_SQL

    return f"""
WITH q AS ({CORPUS_QUALITY_FILTER_SQL}
), kept AS (
  SELECT doc_id FROM q WHERE keep
), dd AS ({EXACT_DEDUP_SQL}
), canon AS (
  SELECT doc_id FROM dd WHERE NOT is_duplicate
), dec AS ({DECONTAMINATE_SQL}
), clean AS (
  SELECT doc_id FROM dec WHERE NOT is_contaminated
), surv AS (
  SELECT d.doc_id,
         len(string_split(d.text, ' ')) AS n_tokens,
         CAST(d.doc_id % {_PACK_SHARDS} AS INT) AS shard
  FROM documents d
  JOIN kept USING (doc_id)
  JOIN canon USING (doc_id)
  JOIN clean USING (doc_id)
), cum AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM surv
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(CAST(cb AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS pack_id
FROM cum
"""


CURATION_PIPELINE_SQL = _curation_pipeline_sql()


def contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: per training document, the FRACTION of
    its distinct word 5-grams shared with the benchmark slice (not
    just the binary flag ``decontaminate`` emits) — the thresholdable
    score production scrubs use (drop > 0.8, down-weight > 0.2, keep
    the long tail).

    Same broadcast-semi-join scale shape as ``decontaminate``; the
    per-doc distinct-gram denominator rides the same explode.
    """
    train, bench_grams = _gram_split(spark, sf_dir)
    hits = _gram_hits(train, F.broadcast(bench_grams), "n_shared")
    return (
        train.select("doc_id", F.size("grams").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("n_shared", F.lit(0)).cast("double") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


CONTAMINATION_SCORE_SQL = f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN len(w) >= {_NGRAM} THEN
      list_distinct([{_GRAM_CONCAT_SQL}
                     for i in range(1, len(w) - {_NGRAM - 2})])
    ELSE [] END AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {_BENCH_MOD} = 0
), train AS (
  SELECT * FROM g WHERE doc_id % {_BENCH_MOD} <> 0
), hits AS (
  SELECT doc_id, COUNT(DISTINCT tg.gram) AS n
  FROM (SELECT doc_id, unnest(grams) AS gram FROM train) tg
  JOIN bench USING (gram)
  GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(len(t.grams) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared,
  CASE WHEN len(t.grams) > 0
       THEN CAST(COALESCE(h.n, 0) AS DOUBLE) / len(t.grams)
       ELSE 0.0 END AS contamination
FROM train t LEFT JOIN hits h USING (doc_id)
"""


# hash-bucket split quotas out of 100: [0,80) train / [80,90) val / rest test
_SPLIT_TRAIN_LT = 80
_SPLIT_VAL_LT = 90


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: hash-bucket each
    document id into 100 buckets (md5-based — engine-portable and
    stable across runs, unlike ``rand()``) and map bucket ranges to
    splits. The manifest every training job consumes; re-running on
    the same corpus reproduces it byte-for-byte, and membership never
    depends on row order or partitioning.

    Scale: map-only projection — no shuffle, no state.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 100"
    )
    return d.select(
        "doc_id",
        "source",
        "lang",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < _SPLIT_TRAIN_LT, "train")
        .when(bucket < _SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


CORPUS_SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id, source, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
           AS bucket
  FROM documents
)
SELECT doc_id, source, lang, CAST(bucket AS INT) AS bucket,
       CASE WHEN bucket < {_SPLIT_TRAIN_LT} THEN 'train'
            WHEN bucket < {_SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


TRAIN_SHARDS = 8


def corpus_train_shards(
    spark: SparkSession, sf_dir: str, n_shards: int = TRAIN_SHARDS, epoch: int = 0
) -> DataFrame:
    """Deterministic global training-order shuffle + shard layout —
    the manifest a data loader consumes to stream the corpus in a
    reproducible pseudo-random order (reference batch pipeline's
    "training-ready serving layout" posture; sources interleave
    naturally because the order key is a content-free hash).

    Each doc gets a 60-bit md5 order key; ``shard_id = key %
    TRAIN_SHARDS``; ``pos`` is its rank within the shard and
    ``token_offset`` the running token count before it — exactly what
    a resumable loader needs to seek mid-shard. Byte-stable across
    runs, row order, and partitioning (same md5 idiom as
    ``corpus_split``).

    ``epoch`` salts the order key (``md5(doc_id || ':' || epoch)``),
    giving each training epoch an independent deterministic
    permutation — the multi-epoch reshuffle a training run performs
    between passes. Epoch 0 keys on the bare doc_id (the original,
    artifact-stable layout). Reshuffling is manifest-only: token
    counts are recomputed here from text for self-containment, but no
    tokenization, dedup, or shard WRITE is implied — a loader reorders
    reads, it never rewrites the corpus.

    Scale: ONE hash shuffle on the uniform shard key, then keyed
    windows (rank + running sum share the same partitioning — one
    sort, no second exchange). The per-shard rank is inherently one
    task per shard, so ``n_shards`` IS the parallelism knob: size it
    so a shard fits a task (≈ corpus_bytes / 1 GB at 100 TB, i.e.
    thousands of shards — which is also what a training job wants).
    The 8-shard default exists for the fixed oracle; no driver-side
    state either way. Per-epoch cost is identical and epochs are
    independent (embarrassingly parallel across epochs if a run
    pre-plans its whole schedule).
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    seed = "cast(doc_id as string)" if epoch == 0 else f"concat(cast(doc_id as string), ':{int(epoch)}')"
    skey = F.expr(
        f"cast(conv(substring(md5({seed}), 1, 15), 16, 10) as bigint)"
    )
    keyed = d.select(
        "doc_id",
        skey.alias("skey"),
        (skey % n_shards).cast("int").alias("shard_id"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("token_count"),
    )
    w = Window.partitionBy("shard_id").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("long").alias("pos"),
        "token_count",
        F.coalesce(
            F.sum("token_count").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("token_offset"),
    )


def _train_shards_sql(salt: str = "") -> str:
    """One template for the shard-manifest oracle and its epoch-salted
    twin (r12 review: two verbatim copies differing only in the md5
    salt — a window/offset fix applied to one would silently leave the
    other stale)."""
    key = "CAST(doc_id AS VARCHAR)" + (f" || '{salt}'" if salt else "")
    return f"""
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5({key}), 1, 15)) AS BIGINT)
           AS skey,
         len(string_split(text, ' ')) AS token_count
  FROM documents
)
SELECT doc_id,
       CAST(skey % {TRAIN_SHARDS} AS INT) AS shard_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
       CAST(token_count AS BIGINT) AS token_count,
       CAST(COALESCE(SUM(token_count) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS token_offset
FROM k
WINDOW w AS (PARTITION BY skey % {TRAIN_SHARDS} ORDER BY skey, doc_id)
"""


CORPUS_TRAIN_SHARDS_SQL = _train_shards_sql()


# the registry's fixed epoch for the multi-epoch reshuffle oracle — any
# nonzero epoch exercises the salted-key path; 1 is what a second
# training pass would request
TRAIN_EPOCH = 1


def corpus_train_shards_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of the multi-epoch training reshuffle: the epoch-1
    manifest — same corpus, same shard count, an independent
    deterministic permutation (order key salted with the epoch). A
    training run regenerates this manifest between passes instead of
    physically rewriting shards; ``tests/test_pipeline_ops.py`` pins
    that epochs genuinely permute (epoch 0 vs 1 disagree on pos) while
    each epoch remains byte-stable."""
    return corpus_train_shards(spark, sf_dir, epoch=TRAIN_EPOCH)


CORPUS_TRAIN_SHARDS_EPOCH_SQL = _train_shards_sql(f":{TRAIN_EPOCH}")
