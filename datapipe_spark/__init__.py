"""datapipe_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing semantics of
the reference system ``mohidmakhdoomi/DataPipe`` (a Lambda-architecture
CDC → Kafka → S3/Iceberg → warehouse pipeline): CDC changelog handling,
time-partitioned archival, batch marts, streaming aggregations and
sessionization, data-quality checks — plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
strategies; Pandas UDFs are used only where built-ins cannot express the
semantics (MinHash, embedding top-k, stateful sessionization).
"""

__version__ = "0.1.0"

from datapipe_spark.session import get_spark  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
