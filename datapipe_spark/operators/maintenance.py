"""Table maintenance: small-file compaction (SURVEY §4).

The reference targets 128 MB data files with auto-compaction via
Iceberg table properties (``task6-ecommerce-tables-config.yaml:51-61``,
batch design.md:193; requirements.md:41). Plain-parquet tables don't
get that for free — this job is the stand-in for Iceberg's
``rewrite_data_files``: rewrite each (optionally partitioned) table
into ⌈bytes/target⌉ files, atomically (write beside, swap).

Why it matters at 100 TB: streaming sinks and per-batch appends
produce files sized by *trigger cadence*, not by optimal scan width;
a 128 MB target keeps scan task counts ≈ data size / target and
avoids driver-side file-listing blowup (millions of tiny files is the
classic lakehouse failure mode).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024

# staging suffixes the bare dir-swap rewrites below use; recover_swap
# knows all of them
_SWAP_SUFFIXES = ("__compacting", "__clustering", "__zordering")


def recover_swap(path: str, sweep: bool = False) -> bool:
    """Heal a crashed ``compact_parquet``/``cluster_parquet``/
    ``zorder_parquet`` directory swap (the scd2 r9 compaction advisory
    generalized to every bare-swap site): the swap's only
    non-recoverable-looking crash state is "live dir renamed to
    ``__old``, rewritten dir not yet renamed in" — restore ``__old``
    so readers see the pre-rewrite content (the rewrite is
    content-preserving by contract, so either generation is correct)
    instead of a missing-path error.

    ``sweep=True`` (WRITER entries only — the next maintenance run)
    additionally deletes leftover ``__compacting``/``__clustering``/
    ``__zordering``/``__old`` debris. Readers must not sweep: a live
    rewrite's staging dir looks exactly like debris (the same
    reader-vs-writer rule as the journaled stores). Returns True if a
    restore happened."""
    restored = False
    old = path.rstrip("/") + "__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        restored = True
    if sweep:
        for suffix in (*_SWAP_SUFFIXES, "__old"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
    return restored


def table_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1 for root, _d, files in os.walk(path) for f in files if f.endswith(".parquet")
    )


def compact_parquet_into(
    spark: SparkSession,
    path: str,
    out: str,
    target_bytes: int = TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> None:
    """The rewrite half of ``compact_parquet``, decoupled from the
    swap: write the ⌈size/target⌉-file rewrite of ``path`` into
    ``out`` and stop. Callers that own a commit journal (the SCD2
    store, the band index) stage the rewrite under their hidden
    ``.staging-*`` dir and commit it as a journaled swap instead of
    the bare rename pair — a crash can then never leave the live dir
    missing (r9 advisory on ``scd2_compact_closed``)."""
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(table_bytes(path) / target_bytes))
    shutil.rmtree(out, ignore_errors=True)
    writer = df.repartition(n_files, *partition_cols) if partition_cols else df.coalesce(n_files)
    if partition_cols:
        writer.write.mode("overwrite").partitionBy(*partition_cols).parquet(out)
    else:
        writer.write.mode("overwrite").parquet(out)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ⌈size/target⌉ files; returns new file count.

    Partitioned tables keep their layout (each partition is rewritten
    through a repartition on the partition key so one task owns one
    partition's output). The swap is atomic at the directory level:
    readers either see the old or the new table, never a mix.
    """
    recover_swap(path, sweep=True)
    tmp = path.rstrip("/") + "__compacting"
    compact_parquet_into(spark, path, tmp, target_bytes, partition_cols)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(path)


def cluster_parquet_into(
    spark: SparkSession,
    path: str,
    out: str,
    cluster_cols: list[str],
    target_bytes: int = TARGET_FILE_BYTES,
    schema: str | None = None,
    transform=None,
) -> None:
    """The rewrite half of ``cluster_parquet`` without the swap (see
    ``compact_parquet_into`` for why journaled callers need it).
    ``schema``: optional explicit DDL — a schema-evolved table must be
    read under its full schema (a footer-sampled read silently drops
    columns the sampled file predates). ``transform``: optional
    DataFrame→DataFrame hook applied before the cluster shuffle (e.g.
    SCD2's cbucket back-fill healing for rows the schema null-filled)."""
    df = (
        spark.read.schema(schema).parquet(path)
        if schema
        else spark.read.parquet(path)
    )
    if transform is not None:
        df = transform(df)
    n_files = max(1, math.ceil(table_bytes(path) / target_bytes))
    shutil.rmtree(out, ignore_errors=True)
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(out)
    )


def cluster_parquet(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    target_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Range-cluster rewrite — the sort-order half of Iceberg's
    ``rewrite_data_files`` (reference table config's sorted write
    expectation; batch design.md:193): rows are range-partitioned on
    ``cluster_cols`` (one contiguous key slice per output file) and
    sorted within each file, so every file's footer min/max covers a
    narrow slice of the key space. Returns the new file count.

    Why it matters at 100 TB: parquet scans prune at two levels —
    Spark skips whole FILES whose footer stats miss the predicate, and
    row groups within a file the same way. On an unclustered table
    every file spans the full key range (min/max ≈ global min/max) and
    a selective predicate still reads every footer's data; after
    clustering, a 1 %-selectivity range predicate touches ~1 % of
    files. The rewrite itself is one range shuffle (sampled range
    boundaries keep output files near-equal-sized even under key skew)
    plus a per-partition sort that spills — no single-task sort
    anywhere. The swap is the same atomic directory swap as
    ``compact_parquet``.
    """
    recover_swap(path, sweep=True)
    tmp = path.rstrip("/") + "__clustering"
    cluster_parquet_into(spark, path, tmp, cluster_cols, target_bytes)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(path)


def zorder_parquet(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    target_bytes: int = TARGET_FILE_BYTES,
    bits_per_dim: int = 8,
) -> int:
    """Multi-dimensional cluster rewrite (z-order / Morton layout) —
    what ``cluster_parquet`` cannot give: after a single-column range
    cluster, predicates on any OTHER column still touch every file.
    Z-order interleaves the bits of per-column quantile ranks so file
    footers stay selective for range predicates on EACH clustered
    column (and compound box predicates prune multiplicatively).

    Scale shape: per-column bucket boundaries come from
    ``approxQuantile`` (one distributed sketch pass, O(2^bits) driver
    state per column); bucketing + bit interleaving are pure codegen
    column expressions; the layout write is the same sampled range
    shuffle + per-file sort as ``cluster_parquet``. No window over the
    whole table, no single-task sort, no Python in the row path.
    Returns the new file count.
    """
    recover_swap(path, sweep=True)
    df = spark.read.parquet(path)
    nq = (1 << bits_per_dim) - 1
    buckets = []
    for i, c in enumerate(cluster_cols):
        # rank → bucket via distributed quantile sketch; cast through
        # double for approxQuantile (dates/ints alike)
        dcol = F.col(c).cast("double")
        probs = [j / (nq + 1) for j in range(1, nq + 1)]
        cuts = sorted(set(df.select(dcol.alias("_q")).approxQuantile("_q", probs, 0.001)))
        # bucket = |{cut ≤ value}| via a STATIC balanced decision tree
        # over the sorted cuts: O(cuts) expression nodes total (each
        # cut appears as exactly one scalar comparison) but only
        # O(log cuts) comparisons evaluated per row — vs the original
        # F.aggregate higher-order lambda (interpreted, per-element,
        # boxed: 2^bits−1 = 255 evals × rows × columns × the
        # sampling/shuffle/sort re-evaluations made it the rewrite's
        # dominant cost; measured 44 s on 600k rows at bits=8, ~6 s
        # with the tree). NULL values: every comparison is null ⟹ the
        # otherwise-branch walks left to bucket 0, same as before.
        def _rank_tree(lo: int, hi: int):
            # bucket value is known to lie in [lo, hi]
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi + 1) // 2
            return F.when(
                dcol >= F.lit(float(cuts[mid - 1])), _rank_tree(mid, hi)
            ).otherwise(_rank_tree(lo, mid - 1))

        if cuts:
            # rescale to the full 0..nq range: a low-cardinality column
            # (|distinct| < 2^bits) otherwise only ever sets LOW bucket
            # bits and its dimension vanishes from the significant z bits
            bexpr = (_rank_tree(0, len(cuts)) * nq / len(cuts)).cast("int")
        else:
            bexpr = F.lit(0)
        buckets.append(bexpr.alias(f"_b{i}"))
    withb = df.select("*", *buckets)
    zval = F.lit(0).cast("long")
    for bit in range(bits_per_dim):
        for d in range(len(cluster_cols)):
            zval = zval + F.shiftleft(
                F.shiftright(F.col(f"_b{d}"), bit).bitwiseAND(F.lit(1)).cast("long"),
                bit * len(cluster_cols) + d,
            )
    n_files = max(1, math.ceil(table_bytes(path) / target_bytes))
    tmp = path.rstrip("/") + "__zordering"
    (
        withb.withColumn("_z", zval)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_b{i}" for i in range(len(cluster_cols))])
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(path)


def file_column_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) for ``column`` from parquet footer
    statistics — the same metadata scan planners prune with. Driver
    cost is one footer read per file (O(files), no data read)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            md = pq.ParquetFile(fp).metadata
            idx = md.schema.names.index(column)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
            if mins:
                out.append((fp, min(mins), max(maxs)))
    return out


def write_train_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int | None = None,
    epoch: int = 0,
) -> dict:
    """Materialize ``decontam.corpus_train_shards`` as the physical
    serving layout a training job reads: one ``shard_id=*/`` hive
    partition per shard, rows inside each file in loader order (pos
    ascending), text included. A loader streams a shard front-to-back
    for the deterministic pseudo-random sample order, and seeks
    mid-shard with ``token_offset`` — no shuffle at read time, ever.

    Write path: the manifest's ONE hash exchange, then
    ``repartition(shard_id)`` + ``sortWithinPartitions(shard_id, pos)``
    so each output file is pos-sorted even when two shards hash to one
    write task (verified against parquet row order in tests). Returns
    ``{"n_shards", "n_docs", "out_dir"}``.

    ``epoch`` selects which epoch's permutation to materialize (the
    manifest's salted order key) — normally a loader just regenerates
    the MANIFEST per epoch and reorders reads over epoch 0's physical
    layout, but a sequential-I/O-only consumer can rewrite the layout
    per epoch with this.
    """
    from datapipe_spark.operators.decontam import TRAIN_SHARDS, corpus_train_shards
    from datapipe_spark.sources.tables import load_table

    n = n_shards or TRAIN_SHARDS
    manifest = corpus_train_shards(spark, sf_dir, n_shards=n, epoch=epoch)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = out_dir.rstrip("/") + "__staging"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        manifest.join(docs, "doc_id")
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(tmp)
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    n_docs = spark.read.parquet(out_dir).count()
    return {"n_shards": n, "n_docs": n_docs, "out_dir": out_dir}
