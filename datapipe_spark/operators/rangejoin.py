"""Bucketed point-in-interval (range) join — the temporal-join
companion to the as-of join (``plans/events_queries.purchase_
attribution``): "which interval(s) does each event fall in".

Why a dedicated form: Spark plans a bare inequality join
(``p.ts BETWEEN i.start AND i.end`` with no equi-key) as
``BroadcastNestedLoopJoin`` — O(points × intervals) compares and a
broadcast of one whole side, which is exactly the plan that falls over
at scale. The standard fix (the same technique behind Databricks'
range-join hints) is to quantize the time axis: every point maps to
one bucket, every interval is exploded to the buckets it overlaps, the
join becomes an EQUI-join on (bucket [, keys]) that hash-partitions
like any other, and the original predicate re-checks exactness inside
the matched bucket.

Cost model: interval replication is ceil(len/bucket)+1 rows — pick
``bucket_seconds`` near the typical interval length so replication is
O(1) per interval while each bucket stays small. Correct for ANY
bucket size (equivalence property-tested); the knob only moves the
replication-vs-bucket-width trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipe_spark.functions import epoch_us

_B = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    extra_keys: tuple[str, ...] = (),
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (and equal ``extra_keys`` when
    given) without a nested-loop plan.

    ``how``: ``inner`` or ``left`` (points with no containing interval
    kept with nulls — implemented as inner + anti-join-back union so
    the bucketed equi-join stays the only join shape).

    ``max_buckets_per_interval`` fails FAST on pathological intervals
    (r12 review): a sentinel far-future end (9999-12-31 "open"
    windows) or an inverted ``end < start`` row would otherwise
    explode one interval into millions of bucket rows — an executor
    OOM with no pointer at the bad row. The per-row assert names the
    width instead; widen ``bucket_seconds`` or fix the interval.
    Domain bound: bucketing divides epoch-µs through doubles, exact
    below 2^53 µs (~year 2255) — beyond that the cap trips long
    before rounding can mis-bucket anything.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}: use 'inner' or 'left'")
    # scale BEFORE int(): fractional bucket_seconds (0.5 for sub-second
    # data) used to truncate to bucket_us = 0 and divide by zero (r12
    # review); sub-µs buckets are rejected post-scaling instead
    bucket_us = int(bucket_seconds * 1_000_000)
    if bucket_us <= 0:
        raise ValueError(
            f"bucket_seconds must be at least 1 microsecond, got {bucket_seconds}"
        )

    def _bucket(c: str) -> Column:
        return F.floor(epoch_us(F.col(c)) / F.lit(bucket_us)).cast("long")

    if how == "inner":
        p = points.withColumn(_B, _bucket(point_ts))
        n_b = _bucket(end_ts) - _bucket(start_ts) + F.lit(1)
        width_ok = (n_b >= 1) & (n_b <= F.lit(max_buckets_per_interval))
        err = F.concat(
            F.lit("point_in_interval_join: interval spans "),
            n_b.cast("string"),
            F.lit(
                f" buckets (cap {max_buckets_per_interval}, "
                f"bucket_seconds={bucket_seconds}; negative width means "
                f"end < start) — widen bucket_seconds or fix the interval"
            ),
        )
        i = intervals.withColumn(
            _B,
            F.explode(
                F.when(
                    F.assert_true(width_ok, err).isNull(),
                    F.sequence(_bucket(start_ts), _bucket(end_ts)),
                )
            ),
        )
        keys = [*extra_keys, _B]
        exact = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        return p.join(i, keys).filter(exact).drop(_B)
    # left: points that matched nothing come back with null interval
    # cols. The matched set is subtracted by a synthetic unique row id,
    # not by value equality over the point columns — value equality is
    # null-unsafe (a point row holding a NULL payload column would never
    # match itself in the anti-join and be emitted twice) and collapses
    # genuine duplicate point rows into one match status.
    _ID = "__range_point_id"
    # The id expression is nondeterministic and `tagged` feeds TWO plan
    # branches (the inner join and the anti-join). Without pinning, a
    # recomputation between branches (possible whenever `points` derives
    # from a shuffle, where intra-partition order is not stable) could
    # assign different ids per branch — duplicating matched rows or
    # dropping unmatched ones. localCheckpoint materializes one id
    # assignment that both branches reuse (r6 advisory).
    tagged = points.withColumn(_ID, F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    # inner feeds BOTH union branches (the matched rows and the
    # anti-join's id set); Spark does not CSE join subtrees, so
    # without pinning, the bucketed join ran twice per action (r12
    # review). The checkpoint is output-sized (matched pairs).
    inner = point_in_interval_join(
        tagged, intervals, point_ts, start_ts, end_ts, bucket_seconds,
        extra_keys=extra_keys, how="inner",
        max_buckets_per_interval=max_buckets_per_interval,
    ).localCheckpoint(eager=True)
    matched = inner.select(_ID).distinct()
    unmatched = tagged.join(matched, _ID, "left_anti")
    null_cols = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in intervals.schema.fields
        if f.name not in extra_keys
    ]
    return inner.unionByName(unmatched.select("*", *null_cols)).drop(_ID)


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Feature-store point-in-time join: each fact row picks the
    dimension VERSION whose effectivity window contains its timestamp
    (``valid_from ≤ fact_ts < valid_to``, open-ended ``valid_to`` =
    still current) — the join that keeps training features leak-free
    by never reading a version newer than the fact. With ``how='left'``
    facts outside every window (e.g. after a delete-tombstone closed
    history) keep null dimension columns.

    Unlike ``point_in_interval_join`` this needs NO bucketing: SCD2
    windows are non-overlapping per key and keys are selective, so the
    natural plan is already a KEYED equi-join on ``key`` with the
    range as a join filter — one hash shuffle, versions-per-key
    bounded by update frequency, no interval explosion and no BNLJ
    (plan-gated in tests via the registry form,
    ``plans/cdc_queries.lineitem_pit_status_rollup``). Version columns
    keep their names; the caller resolves any collisions beforehand.
    """
    if how not in ("inner", "left"):
        # right/full would emit version rows whose key column the final
        # projection drops — unattributable output (r12 review)
        raise ValueError(f"unsupported how={how!r}: use 'inner' or 'left'")
    f = facts.alias("f")
    v = versions.alias("v")
    # NULL window bounds are OPEN on both ends (r12 review: valid_to
    # was open-ended but a NULL valid_from silently matched nothing —
    # the mirror case of an "existed before history" seed row). The
    # SCD2 store never writes null valid_from, so oracle parity for
    # the registry forms is unaffected.
    cond = (
        (F.col(f"f.{key}") == F.col(f"v.{key}"))
        & (
            F.col(f"v.{valid_from}").isNull()
            | (F.col(f"f.{fact_ts}") >= F.col(f"v.{valid_from}"))
        )
        & (
            F.col(f"v.{valid_to}").isNull()
            | (F.col(f"f.{fact_ts}") < F.col(f"v.{valid_to}"))
        )
    )
    return f.join(v, cond, how).select(
        "f.*", *[F.col(f"v.{c}") for c in versions.columns if c != key]
    )
