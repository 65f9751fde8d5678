"""Skew mitigation: salted joins (build-brief scale requirement).

AQE's skew-join handling (enabled in the session factory, reference
batch design.md:99) splits oversized shuffle partitions at runtime and
is the first line of defense. Salting is the *planned* alternative for
known-hot keys — e.g. a "guest" user id owning 10 % of events — where
even a split partition re-skews downstream aggregations.

Mechanics: the large (skewed) side gets a per-row salt in
``[0, n_salt)``; the small side is replicated once per salt value via
``explode``; the join key becomes ``(key, salt)``, spreading each hot
key over ``n_salt`` reducers. The join *result* is identical for any
salt assignment, so a nondeterministic per-row salt is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated ``n_salt``×. Use when a known-hot key would overwhelm a
    single reducer; for dimension-sized ``small``, prefer a plain
    broadcast join (no shuffle at all)."""
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn(
        SALT_COL, (F.monotonically_increasing_id() % n_salt).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_large.join(replicated_small, keys + [SALT_COL], how).drop(SALT_COL)
