"""Registry ordering + driver-contract invariants.

The external driver records the first 50 registry entries in its
correctness sweep (observed truncation in CORRECTNESS_r01-r06). Policy
(COVERAGE.md), SELF-MAINTAINING from round 7 on: the never-attested
set is computed from the committed CORRECTNESS_r*.json artifacts, and
every member must occupy a head slot — so a new registry entry parked
in the tail, or a window rotation that forgets someone, fails here
instead of silently losing a round of driver attestation (the r5/r6
failure mode: 34 entries unverified for two rounds, then
rule_violations dropped by an off-by-one at position 51).
"""

from __future__ import annotations

import glob
import json
import os
import re

from datapipe_spark.plans import registry

DRIVER_WINDOW = 50

_REPO = os.path.join(os.path.dirname(__file__), "..")

# Rows-only-by-design ops (justified non-SQL: approximate ANN with
# recall floors, an HLL estimate, a data-derived float model, and
# nondeterministic-by-contract lineage metadata).
ROWS_ONLY_BY_DESIGN = {
    "similarity_topk_ivf",
    "similarity_topk_pq",
    "lang_id_ngram",
    "funnel_daily_approx",
    "knn_join_ivf",
    "knn_join_ivfpq",
    "dedup_semantic_ann",
    "lineage_orders_raw",
    "bpe_train_merges",  # iterative merge fixpoint; reference-equality tested
    "bpe_tokenize",  # applies the data-derived merge model; reference-tested
}


def _attested() -> set[str]:
    """Entries with at least one successful driver record: a full
    hash-verified pass, or (rows-only entries) a clean rows-only
    record (err == 'no_oracle'). A traceback does NOT count."""
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(path)).items():
            if not isinstance(rec, dict):
                continue
            err = rec.get("err")
            if err is None and rec.get("hash_match"):
                done.add(name)
            elif err == "no_oracle" and rec.get("spark_rows", -1) >= 0:
                done.add(name)
            elif err is None and rec.get("rows_match") and rec.get("hash_match") is None:
                done.add(name)  # driver's rows-only record shape, if it changes
    return done


def test_never_attested_entries_occupy_head_slots():
    """THE rotation policy: any entry absent from every committed
    CORRECTNESS artifact must sit inside the driver's window so its
    first attestation lands next round. Self-maintaining — adding a
    new registry entry in the tail fails here immediately."""
    head = set(list(registry.queries())[:DRIVER_WINDOW])
    stranded = [n for n in registry.queries() if n not in _attested() and n not in head]
    assert not stranded, (
        f"never-driver-attested entries parked past the {DRIVER_WINDOW}-entry "
        f"window — rotate them into the head: {stranded}"
    )


def test_head_rows_only_entries_are_awaiting_first_attestation():
    """Head slots are full rows+schema+hash checks; a rows-only entry
    may hold one ONLY while awaiting its first driver record. Once the
    next artifact lands and attests it, this test forces it back out
    (and `test_never_attested_entries_occupy_head_slots` allows that)."""
    names = list(registry.queries())
    oracled = set(registry.oracle_sql())
    attested = _attested()
    squatters = [
        n for n in names[:DRIVER_WINDOW] if n not in oracled and n in attested
    ]
    assert not squatters, (
        f"rows-only entries already driver-attested must rotate out of the "
        f"head so the slots return to hash-oracled entries: {squatters}"
    )


def test_tail_banner_sits_exactly_at_window_boundary():
    """The r6 advisory found the TAIL banner one position late, which
    silently dropped `rule_violations` out of the recorded window. Pin
    the banner to the boundary by parsing the registry source."""
    src_path = os.path.join(
        os.path.dirname(registry.__file__), "registry.py"
    )
    body = open(src_path).read().split("_REGISTRY: dict")[1]
    pos = 0
    banner_at = None
    for line in body.split("\n"):
        if re.match(r'\s{4}"([a-z0-9_]+)":', line):
            pos += 1
        if "TAIL (past the driver window)" in line:
            banner_at = pos
            break
    assert banner_at == DRIVER_WINDOW, (
        f"TAIL banner sits after entry {banner_at}, expected {DRIVER_WINDOW}"
    )


def test_registry_has_no_orphan_oracles():
    names = set(registry.queries())
    assert set(registry.oracle_sql()) <= names


def test_driver_artifact_oracle_parity():
    """Replica↔driver drift gate (r5 verdict ask #4): for every entry
    the driver recorded in CORRECTNESS_r06.json, (a) it passed, (b) the
    name is still registered, and (c) its oracle SQL still returns
    exactly the driver-recorded row count in DuckDB at sf0.01. A
    change to an oracle (or to DuckDB canonicalization) that would
    surprise the driver at the round boundary fails here first."""
    art = json.load(open(os.path.join(_REPO, "CORRECTNESS_r06.json")))
    from tests.oracle import duckdb_con

    oracles = registry.oracle_sql()
    con = duckdb_con("/root/testdata/sf0.01")
    try:
        for name, rec in art.items():
            assert rec["err"] is None and rec["hash_match"], (name, rec)
            assert name in oracles, f"driver-recorded entry vanished: {name}"
            got = con.sql(f"SELECT COUNT(*) FROM ({oracles[name]})").fetchone()[0]
            assert got == rec["oracle_rows"], (name, got, rec["oracle_rows"])
    finally:
        con.close()


def test_rows_only_entries_are_the_documented_ones():
    """Every rows-only entry (head or tail) must be one of the
    justified non-SQL-expressible ops."""
    names = list(registry.queries())
    oracled = set(registry.oracle_sql())
    rows_only = {n for n in names if n not in oracled}
    assert rows_only == ROWS_ONLY_BY_DESIGN
