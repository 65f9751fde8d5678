"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exactness baseline, plus an
IVF-partitioned variant as the scale path. The dot product is a
JVM-side sequential fold (``zip_with`` + ``aggregate``) — numerically
deterministic (same left-to-right order on both engines), no Python.

Scale notes: brute force is O(|Q|·N) — fine for small query sets via a
broadcast of Q; IVF prunes to nprobe/nlist of the corpus per query and
distributes by cluster id. Top-k selection is a per-query window (k
small) — at very large Q switch to repartition-by-query + in-partition
heap (mapInPandas), which preserves the same output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipe_spark.sources.tables import load_table

DEFAULT_K = 10
DEFAULT_QUERY_IDS = (0, 1, 2, 3, 4)


def _as_double(col: str) -> F.Column:
    return F.col(col).cast("array<double>")


def _cosine(a: str, b: str) -> F.Column:
    """Sequential-fold cosine: dot/(‖a‖·‖b‖), deterministic order."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0.0d, (acc, x) -> acc + x * x)"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0.0d, (acc, x) -> acc + x * x)"))
    return dot / (na * nb)


def topk_bruteforce(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    query_ids: tuple[int, ...] = DEFAULT_QUERY_IDS,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the full
    corpus, rank per query with a deterministic tie-break."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


TOPK_BRUTEFORCE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e
  WHERE vec_id IN {tuple(DEFAULT_QUERY_IDS)}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    ROUND(
      list_reduce([qv[i] * v[i] for i in range(1, len(qv) + 1)], (x, y) -> x + y)
      / (sqrt(list_reduce([qv[i] * qv[i] for i in range(1, len(qv) + 1)], (x, y) -> x + y))
         * sqrt(list_reduce([v[i] * v[i] for i in range(1, len(v) + 1)], (x, y) -> x + y))),
      6) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {DEFAULT_K}
"""


_NEAR_DUP_BLOCK_ROWS = 2048  # ~2k×dim float64 per side fits any executor


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold — exact
    all-pairs, fully distributed.

    Block-matrix execution: vectors are assigned to ~2k-row blocks, the
    (upper-triangular) block-pair grid becomes the join key, and each
    block pair is one cogrouped Arrow batch multiplied with BLAS. No
    corpus collect, no broadcast of the matrix: shuffle volume is
    N·(B+1) vector rows for B blocks, and every N²-scale flop happens
    inside a bounded numpy matmul on an executor. Exact thresholded
    all-pairs is inherently quadratic in flops — when that stops being
    affordable, the approximate scale path is ``topk_ivf``/LSH
    bucketing, with per-bucket math identical to a block here.
    """
    import math

    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    ).persist()
    n = e.count()  # sizes the block grid; also materializes the cache
    n_blocks = max(1, math.ceil(n / _NEAR_DUP_BLOCK_ROWS))
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    eb = e.withColumn("blk", blk)
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    # each side re-aliases every column: fresh expression ids keep the
    # self-cogroup unambiguous (both sides derive from the same frames)
    a_side = (
        eb.alias("ea")
        .join(F.broadcast(grid.alias("ga")), F.col("ea.blk") == F.col("ga.bi"))
        .select(
            F.col("ga.bi").alias("bi"),
            F.col("ga.bj").alias("bj"),
            F.col("ea.vec_id").alias("vec_id"),
            F.col("ea.v").alias("v"),
        )
    )
    b_side = (
        eb.alias("eb")
        .join(F.broadcast(grid.alias("gb")), F.col("eb.blk") == F.col("gb.bj"))
        .select(
            F.col("gb.bi").alias("bi"),
            F.col("gb.bj").alias("bj"),
            F.col("eb.vec_id").alias("vec_id"),
            F.col("eb.v").alias("v"),
        )
    )

    out_schema = "vec_a long, vec_b long, cosine double"

    def block_pair(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        if left.empty or right.empty:
            return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        a = np.stack(left["v"].to_numpy()).astype(np.float64)
        b = np.stack(right["v"].to_numpy()).astype(np.float64)
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        cos = np.round(a @ b.T, 6)
        # each unordered vector pair appears in exactly one block pair;
        # the id inequality both dedupes the diagonal block (bi == bj)
        # and orients output as vec_a < vec_b
        li, ri = np.nonzero((cos >= threshold) & (a_ids[:, None] < b_ids[None, :]))
        out = pd.DataFrame({"vec_a": a_ids[li], "vec_b": b_ids[ri], "cosine": cos[li, ri]})
        if bi != bj:
            # off-diagonal blocks also carry the pairs oriented the
            # other way (a-side id > b-side id): emit them normalized
            li2, ri2 = np.nonzero((cos >= threshold) & (a_ids[:, None] > b_ids[None, :]))
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {"vec_a": b_ids[ri2], "vec_b": a_ids[li2], "cosine": cos[li2, ri2]}
                    ),
                ],
                ignore_index=True,
            )
        return out

    from datapipe_spark.util import materialize_and_release

    return materialize_and_release(
        a_side.groupBy("bi", "bj")
        .cogroup(b_side.groupBy("bi", "bj"))
        .applyInPandas(block_pair, out_schema),
        e,
    )


EMBEDDING_NEAR_DUP_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  ROUND(
    list_reduce([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)], (x, y) -> x + y)
    / (sqrt(list_reduce([a.v[i] * a.v[i] for i in range(1, len(a.v) + 1)], (x, y) -> x + y))
       * sqrt(list_reduce([b.v[i] * b.v[i] for i in range(1, len(b.v) + 1)], (x, y) -> x + y))),
    6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(
    list_reduce([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)], (x, y) -> x + y)
    / (sqrt(list_reduce([a.v[i] * a.v[i] for i in range(1, len(a.v) + 1)], (x, y) -> x + y))
       * sqrt(list_reduce([b.v[i] * b.v[i] for i in range(1, len(b.v) + 1)], (x, y) -> x + y))),
    6) >= 0.4
"""


def _centroids(e: DataFrame) -> DataFrame:
    """Per-label centroid via positional explode + re-assemble (keeps
    averaging distributed; no driver math)."""
    dims = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
    )
    return (
        dims.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("_pc"))
        .select("label", F.expr("transform(_pc, p -> p.cx)").alias("cv"))
    )


def topk_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    nprobe: int = 3,
    query_ids: tuple[int, ...] = DEFAULT_QUERY_IDS,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus by ``label`` (the
    testdata's cluster id stands in for learned k-means cells), probe
    only the nprobe nearest centroids per query, exact cosine within
    probed cells.

    With nprobe ≥ nlist this equals brute force exactly
    (property-tested); at scale the corpus is partitioned by cell so a
    probe touches nprobe/nlist of the data.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    cents = _centroids(e)
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cent_cos").desc(), F.col("label")
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", _cosine("qv", "cv"))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "qv", "label")
    )
    scored = probes.join(e, "label").filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine("qv", "v"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


KNN_JOIN_K = 5


def knn_join_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_JOIN_K,
    block_rows: int = _NEAR_DUP_BLOCK_ROWS,
) -> DataFrame:
    """All-pairs kNN *join*: every vector gets its top-k neighbors —
    the similarity-search workload at corpus scale (vs. the
    few-queries ``topk_*`` form).

    IVF strategy: vectors are bucketed by cell (coarse quantizer =
    the corpus ``label`` cells, as in ``topk_ivf``) so total flops are
    Σ|cell|² instead of N². Within a cell the work is block-matrix:
    vectors are assigned to ≤``_NEAR_DUP_BLOCK_ROWS``-row sub-blocks,
    each (bi ≤ bj) block pair is one cogrouped Arrow batch multiplied
    with BLAS emitting per-row block-local top-k *candidates*, and a
    final per-vector window keeps the true top-k (each neighbor occurs
    in exactly one block pair, so the union of block-local top-k
    contains the global top-k). Executor memory per task is therefore
    bounded by two blocks regardless of cell size — the skewed-cell
    hazard of one-batch-per-cell is gone. Rows-only check; recall vs.
    brute force is property-tested on sampled queries; block-split
    equivalence is unit-tested against the one-batch form.

    At 100 TB: embarrassingly parallel across cells × block pairs;
    refine with multi-probe (neighboring cells) when recall demands it.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    # per-cell block counts: O(nlist) rows — same bounded driver
    # footprint as the IVF centroid table itself (and a column-pruned
    # scan: only `label` is read for the sizing pass)
    sizes = {
        r["label"]: max(1, -(-r["n"] // block_rows))
        for r in e.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    grid = spark.createDataFrame(
        [
            (lbl, bi, bj)
            for lbl, nb in sizes.items()
            for bi in range(nb)
            for bj in range(bi, nb)
        ],
        "label int, bi int, bj int",
    )
    # block id must be computable JVM-side: pmod(vec_id, blocks(label))
    nb_map = F.create_map(
        *[F.lit(x) for kv in sizes.items() for x in kv]
    )
    eb = e.withColumn("blk", F.pmod(F.col("vec_id"), nb_map[F.col("label")]).cast("int"))
    a_side = (
        eb.alias("ea")
        .join(
            F.broadcast(grid.alias("ga")),
            (F.col("ea.label") == F.col("ga.label")) & (F.col("ea.blk") == F.col("ga.bi")),
        )
        .select(
            F.col("ga.label").alias("label"),
            F.col("ga.bi").alias("bi"),
            F.col("ga.bj").alias("bj"),
            F.col("ea.vec_id").alias("vec_id"),
            F.col("ea.v").alias("v"),
        )
    )
    b_side = (
        eb.alias("ebb")
        .join(
            F.broadcast(grid.alias("gb")),
            (F.col("ebb.label") == F.col("gb.label")) & (F.col("ebb.blk") == F.col("gb.bj")),
        )
        .select(
            F.col("gb.label").alias("label"),
            F.col("gb.bi").alias("bi"),
            F.col("gb.bj").alias("bj"),
            F.col("ebb.vec_id").alias("vec_id"),
            F.col("ebb.v").alias("v"),
        )
    )

    cand_schema = "vec_id long, neighbor_id long, cosine double"

    def block_candidates(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        _lbl, bi, bj = key
        if left.empty or right.empty:
            return pd.DataFrame(columns=["vec_id", "neighbor_id", "cosine"])
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        a = np.stack(left["v"].to_numpy()).astype(np.float64)
        b = np.stack(right["v"].to_numpy()).astype(np.float64)
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        cos = np.round(a @ b.T, 6)
        if bi == bj:
            cos[a_ids[:, None] == b_ids[None, :]] = -np.inf

        def row_topk(ids_side, other_ids, mat):
            kk = min(k, mat.shape[1])
            # deterministic (cosine desc, id asc) partial order
            order = np.lexsort((other_ids[None, :].repeat(len(ids_side), 0), -mat), axis=1)[
                :, :kk
            ]
            vals = np.take_along_axis(mat, order, axis=1)
            keep = np.isfinite(vals)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(ids_side, kk)[keep.ravel()],
                    "neighbor_id": other_ids[order.ravel()][keep.ravel()],
                    "cosine": vals.ravel()[keep.ravel()],
                }
            )

        out = row_topk(a_ids, b_ids, cos)
        if bi != bj:
            out = pd.concat([out, row_topk(b_ids, a_ids, cos.T)], ignore_index=True)
        return out

    cands = (
        a_side.groupBy("label", "bi", "bj")
        .cogroup(b_side.groupBy("label", "bi", "bj"))
        .applyInPandas(block_candidates, cand_schema)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
