"""Streaming layer tests (SURVEY §2.8, §5 batch-replay equivalence).

The strongest available oracle for streaming semantics: run the real
Structured Streaming job over micro-batch drops, then assert the result
equals (a) the batch DataFrame form and (b) the DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipe_spark.plans import events_queries as ev
from datapipe_spark.streaming import jobs
from datapipe_spark.streaming import source as src
from tests.oracle import compare_to_oracle


def _rows(df):
    return sorted(map(repr, df.collect()))


def test_streaming_funnel_equals_batch_and_oracle(spark, sf_dir):
    got = jobs.streaming_funnel_daily(spark, sf_dir)
    assert _rows(got) == _rows(ev.funnel_daily(spark, sf_dir))
    compare_to_oracle(spark, jobs.streaming_funnel_daily, ev.FUNNEL_DAILY_SQL, sf_dir)


def test_streaming_session_window_equals_batch(spark, sf_dir):
    got = jobs.streaming_sessionize(spark, sf_dir)
    assert _rows(got) == _rows(ev.sessionize(spark, sf_dir))


def test_streaming_stateful_sessionize_equals_batch(spark, sf_dir):
    got = jobs.streaming_sessionize_stateful(spark, sf_dir)
    assert _rows(got) == _rows(ev.sessionize(spark, sf_dir))


def test_streaming_dedup_restores_exactly_once(spark, sf_dir):
    from datapipe_spark.sources.tables import load_table

    got = jobs.streaming_dedup_events(spark, sf_dir)
    base = load_table(spark, sf_dir, "events")
    assert got.count() == base.count()
    assert got.select(F.countDistinct("event_id")).first()[0] == base.count()


def test_streaming_dlq_split_routes_corrupt_records(spark, sf_dir):
    compare_to_oracle(spark, jobs.streaming_dlq_split, jobs.STREAMING_DLQ_SQL, sf_dir)


def test_validation_split_batch_semantics(spark):
    """S4/T9 unit: malformed JSON and key-less records route to DLQ."""
    raw = spark.createDataFrame(
        [
            ('{"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, '
             '"event_type": "view", "value": 1.5, "props": null}',),
            ('{"event_id": 2, "ts": "2024-01-01T00:00:01"',),  # truncated
            ('{"user_id": 9, "event_type": "click"}',),  # no key/ts
            ("not json at all",),
        ],
        "value string",
    )
    valid, invalid = src.split_valid(src.parse_events(raw))
    assert valid.count() == 1
    assert valid.first().event_id == 1
    assert invalid.count() == 3
    assert set(r.error_reason for r in invalid.collect()) == {"parse_or_key_failure"}
